"""Streaming deduplication — the reference's stateful kept-set, watermark-
and state-table-scoped.

The reference dedups keep a grow-forever ``seen_hashes`` set in process
memory (hash_deduplicator.py:75-86). Streaming re-expressions:

* ``dedup_exact_stream``        — built-in keyed state:
  ``dropDuplicatesWithinWatermark`` (state TTL'd by the watermark; the
  10^12-turn-safe path for "same text within the lateness horizon").
* ``StreamingFirstWinsDedup``   — EXACT incremental first-wins across the
  whole stream history via ``foreachBatch``: per micro-batch, candidate
  edges are computed batch-internally AND against a persistent kept-band
  state table; batch-internal resolution reuses the batch first-wins
  machinery; surviving rows append their bands to the state table. Since
  micro-batches commit in order, the result equals the reference's
  sequential scan in arrival order. State is a parquet table — unbounded
  like the reference's set, but disk-backed, partitioned, and prunable by
  a retention predicate.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflow_spark.operators.dedup import apply_first_wins, minhash_band_edges


def dedup_exact_stream(
    stream: DataFrame,
    cols: list[str],
    watermark_col: str = "ts",
    delay: str = "2 minutes",
) -> DataFrame:
    """Exact streaming dedup with watermark-scoped state."""
    h = F.md5(F.concat_ws("\n", *[F.coalesce(F.col(c), F.lit("")) for c in cols]))
    tagged = stream.withColumn("__h", h).withWatermark(watermark_col, delay)
    return tagged.dropDuplicatesWithinWatermark(["__h"]).drop("__h")


class StreamingFirstWinsDedup:
    """foreachBatch incremental MinHash first-wins dedup.

    Usage::

        d = StreamingFirstWinsDedup(state_dir, order_col="__ord")
        stream.writeStream.foreachBatch(d.process_batch)...

    ``process_batch`` filters the batch to first-wins survivors (vs all
    previously-kept rows AND batch-internal collisions) and hands the
    survivors to ``downstream`` (a callable, e.g. a KeyedMergeSink)."""

    def __init__(
        self,
        state_dir: str,
        order_col: str,
        text_col: str = "text",
        downstream=None,
        num_perm: int = 128,
        bands: int = 16,
        seed: int = 1,
    ):
        self.state_dir = state_dir
        self.order_col = order_col
        self.text_col = text_col
        self.downstream = downstream
        self.num_perm = num_perm
        self.bands = bands
        self.seed = seed
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _commits(self) -> str:
        return os.path.join(self.state_dir, "_batches.jsonl")

    def _committed(self) -> set[int]:
        if not os.path.exists(self._commits):
            return set()
        with open(self._commits) as f:
            return {json.loads(x)["batch_id"] for x in f if x.strip()}

    def _band_table(self, df: DataFrame) -> DataFrame:
        sig_edges_src = minhash_band_edges  # noqa: F841 (shared params live there)
        from dataflow_spark.operators.dedup import minhash_signature_udf

        rows_per_band = self.num_perm // self.bands
        sig = df.select(
            F.col(self.order_col).alias("id"),
            minhash_signature_udf(num_perm=self.num_perm, seed=self.seed)(
                F.col(self.text_col)
            ).alias("sig"),
        )
        return sig.select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(self.bands - 1)),
                    lambda i: F.concat_ws(
                        ":",
                        i.cast("string"),
                        F.xxhash64(
                            F.slice("sig", i * rows_per_band + 1, rows_per_band)
                        ).cast("string"),
                    ),
                )
            ).alias("band"),
        )

    def _state_bands(self, spark: SparkSession) -> DataFrame | None:
        data = os.path.join(self.state_dir, "bands")
        if not os.path.exists(data):
            return None
        try:
            return spark.read.parquet(data)
        except Exception:  # noqa: BLE001 — empty dir on first batch
            return None

    def process_batch(self, df: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed():
            return  # replay — state and downstream already reflect it
        spark = df.sparkSession
        df = df.localCheckpoint()
        bands = self._band_table(df).localCheckpoint()

        # rows colliding with ANY previously-kept row are dropped outright
        # (the kept side always wins — it is strictly earlier)
        state = self._state_bands(spark)
        if state is not None:
            hit_ids = (
                bands.join(state.select(F.col("band").alias("sband")),
                           bands.band == F.col("sband"))
                .select("id")
                .distinct()
            )
            df_alive = df.join(
                hit_ids.withColumnRenamed("id", "__hit"),
                df[self.order_col] == F.col("__hit"),
                "left_anti",
            )
        else:
            df_alive = df

        # batch-internal first-wins among the remaining rows
        alive_bands = self._band_table(df_alive)
        l, r = alive_bands.alias("l"), alive_bands.alias("r")
        edges = (
            l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("src"), F.col("r.id").alias("dst"))
            .distinct()
        )
        survivors = apply_first_wins(df_alive, self.order_col, edges).localCheckpoint()

        # persist survivors' bands into state, then hand off downstream
        self._band_table(survivors).write.mode("append").parquet(
            os.path.join(self.state_dir, "bands")
        )
        if self.downstream is not None:
            self.downstream(survivors, batch_id)
        with open(self._commits, "a") as f:
            f.write(json.dumps({"batch_id": batch_id, "rows": survivors.count()}) + "\n")
