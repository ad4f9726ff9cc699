"""Streaming deduplication — the reference's stateful kept-set, watermark-
and state-table-scoped.

The reference dedups keep a grow-forever ``seen_hashes`` set in process
memory (hash_deduplicator.py:75-86). Streaming re-expressions:

* ``dedup_exact_stream``        — built-in keyed state:
  ``dropDuplicatesWithinWatermark`` (state TTL'd by the watermark; the
  10^12-turn-safe path for "same text within the lateness horizon").
* ``StreamingFirstWinsDedup``   — EXACT incremental first-wins across the
  whole stream history via ``foreachBatch``: per micro-batch, rows whose
  MinHash-LSH bands collide with a previously-KEPT row's band are dropped
  (datasketch insertion-session semantics, minhash_deduplicator.py:74-89),
  then batch-internal first-wins resolves via the shared bucket-claim
  machinery. Since micro-batches commit in order, the result equals the
  reference's sequential scan in arrival order.

Exactly-once discipline: the claimed-band state is written to a PER-BATCH
directory (``bands/batch=<id>``, overwrite mode) and the read path only
unions directories whose batch id appears in the commit log. A crash
between the state write and the commit append therefore leaves an
invisible (uncommitted) state dir that replay simply overwrites with the
identical deterministic result — survivors can never be lost to their own
batch's bands (foreachBatch is at-least-once; this is the crash window the
commit log exists for, mirroring KeyedMergeSink).

State scale: band dirs are merged by ``compact()`` (bounded file listing)
with an optional event-time retention horizon so 10^12-turn streams don't
accrete unbounded state; retention is the operator's explicit
semantics-relaxing knob (a duplicate older than the horizon can resurface).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflow_spark.operators.dedup import (
    first_wins_bucket_claim,
    minhash_bucket_table,
)


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
    survivors to ``downstream`` (a callable, e.g. a KeyedMergeSink).

    ``ts_col`` (optional) stamps each claimed band with the keeper's event
    time so ``compact(retain_after_us=...)`` can expire ancient state."""

    def __init__(
        self,
        state_dir: str,
        order_col: str,
        text_col: str = "text",
        downstream=None,
        num_perm: int = 128,
        threshold: float = 0.9,
        seed: int = 1,
        ts_col: str | None = None,
        compact_every: int | None = 32,
    ):
        self.state_dir = state_dir
        self.order_col = order_col
        self.text_col = text_col
        self.downstream = downstream
        self.num_perm = num_perm
        self.threshold = threshold
        self.seed = seed
        self.ts_col = ts_col
        self.compact_every = compact_every
        os.makedirs(os.path.join(state_dir, "bands"), exist_ok=True)

    # ------------------------------------------------------------- commit log

    @property
    def _commits(self) -> str:
        return os.path.join(self.state_dir, "_batches.jsonl")

    @property
    def _manifest(self) -> str:
        return os.path.join(self.state_dir, "_compaction.json")

    def _committed(self) -> set[int]:
        if not os.path.exists(self._commits):
            return set()
        with open(self._commits) as f:
            return {json.loads(x)["batch_id"] for x in f if x.strip()}

    def _compaction(self) -> dict:
        if not os.path.exists(self._manifest):
            return {"upto": -1, "dir": None, "seq": 0}
        with open(self._manifest) as f:
            return json.load(f)

    def _batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.state_dir, "bands", f"batch={batch_id}")

    # ------------------------------------------------------------ band state

    def _band_table(self, df: DataFrame) -> DataFrame:
        bands = minhash_bucket_table(
            df,
            self.order_col,
            self.text_col,
            num_perm=self.num_perm,
            threshold=self.threshold,
            seed=self.seed,
        )
        if self.ts_col is not None:
            ts = df.select(
                F.col(self.order_col).alias("id"),
                F.unix_micros(F.col(self.ts_col).cast("timestamp")).alias("ts_us"),
            )
            return bands.join(ts, "id")
        return bands.withColumn("ts_us", F.lit(None).cast("long"))

    def _state_dirs(self) -> list[str]:
        committed = self._committed()
        comp = self._compaction()
        dirs = []
        if comp["dir"] is not None:
            dirs.append(os.path.join(self.state_dir, "bands", comp["dir"]))
        dirs.extend(self._batch_dir(b) for b in sorted(committed) if b > comp["upto"])
        return [d for d in dirs if os.path.exists(d)]

    def _state_bands(self, spark: SparkSession) -> DataFrame | None:
        dirs = self._state_dirs()
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    # --------------------------------------------------------------- process

    def process_batch(self, df: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed():
            return  # replay of a committed batch — state+downstream done
        spark = df.sparkSession
        df = df.localCheckpoint()
        bands = self._band_table(df).localCheckpoint()

        # rows colliding with ANY previously-kept row are dropped outright
        # (the kept side always wins — it is strictly earlier). anti-join on
        # the band value: one shuffle, no self-join, no pair explosion.
        state = self._state_bands(spark)
        if state is not None:
            hit_ids = (
                bands.join(
                    state.select("band").distinct().hint("shuffle_hash"), "band"
                )
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

        # batch-internal first-wins among the remaining rows (bucket-claim —
        # the same machinery as the batch operator)
        alive_bands = bands.join(
            df_alive.select(F.col(self.order_col).alias("id")), "id"
        ).select("id", "band")
        survivors = first_wins_bucket_claim(
            df_alive, self.order_col, alive_bands
        ).localCheckpoint()

        # stage this batch's state under its OWN dir (overwrite => replay
        # converges to the same content), visible only after the commit
        surv_bands = bands.join(
            survivors.select(F.col(self.order_col).alias("id")), "id"
        )
        surv_bands.write.mode("overwrite").parquet(self._batch_dir(batch_id))
        if self.downstream is not None:
            self.downstream(survivors, batch_id)
        with open(self._commits, "a") as f:
            f.write(json.dumps({"batch_id": batch_id, "rows": survivors.count()}) + "\n")

        if self.compact_every and (batch_id + 1) % self.compact_every == 0:
            self.compact(spark)

    # -------------------------------------------------------------- compact

    def compact(self, spark: SparkSession, retain_after_us: int | None = None) -> None:
        """Merge all committed per-batch band dirs (plus any previous
        compaction) into one directory; optionally drop bands whose keeper
        event time is older than ``retain_after_us``.

        Keep-set is unchanged when no retention horizon is given; with one,
        duplicates of keepers older than the horizon may resurface — the
        documented trade for bounded state at 10^12 turns."""
        committed = self._committed()
        if not committed:
            return
        dirs = self._state_dirs()
        if not dirs:
            return
        upto = max(committed)
        prev = self._compaction()
        state = spark.read.parquet(*dirs)
        if retain_after_us is not None:
            state = state.filter(
                F.col("ts_us").isNull() | (F.col("ts_us") >= retain_after_us)
            )
        # write the merged state under a FRESH name, then flip the manifest —
        # a crash before the flip leaves the old state fully reachable
        new_name = f"compact-{upto}-{prev['seq'] + 1}"
        state.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "bands", new_name)
        )
        with open(self._manifest, "w") as f:
            json.dump({"upto": upto, "dir": new_name, "seq": prev["seq"] + 1}, f)
        # old dirs are now unreachable via the manifest — reclaim them
        for b in committed:
            if b <= upto:
                shutil.rmtree(self._batch_dir(b), ignore_errors=True)
        if prev["dir"] is not None:
            shutil.rmtree(
                os.path.join(self.state_dir, "bands", prev["dir"]), ignore_errors=True
            )
