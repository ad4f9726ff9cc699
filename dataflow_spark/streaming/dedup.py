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

Bounded per-batch state READ (not just bounded file count): compaction
lays the keep-set's bands out in ``n_buckets`` band-hash buckets
(``__bkt=N/`` partition dirs) and every state unit — bucket dir or
uncompacted per-batch dir — carries a Bloom-filter sidecar of its band
values (``streaming.bloom``). A micro-batch first prefilters its own
bands through the union of unit Blooms (one broadcast, one codegen'd
hash + vectorized probe), then probes each unit's Bloom with the
surviving candidate hashes and reads ONLY units with a possible hit.
Mostly-new data ⇒ candidates ≈ real duplicates + ~0.07% false positives
⇒ per-batch state bytes read stay ~flat while the keep-set grows without
bound. Blooms have no false negatives, and an exact anti-join over the
units actually read makes the final call — pruning can never change the
keep-set. ``last_state_read`` records units/bytes read per batch (the
quantity the scale test asserts flat).

Honest envelope: the Bloom sidecars cost ~2 bytes per committed band
(16 bits/key), so the broadcast prefilter carries ~2 GB per 10^9 bands —
fine to ~10^10, beyond which the levers are (a) the event-time retention
horizon (already the state-bounding knob), (b) fewer bits/key for the
batch-side prefilter only (per-unit probes stay at 16), or (c) sharding
the dedup by band-hash prefix into independent pipelines, each carrying
only its shard's filters. Bytes READ per batch stay flat in all cases;
it is the filter METADATA that eventually needs sharding.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflow_spark.operators.dedup import (
    first_wins_bucket_claim,
    minhash_bucket_table,
)
from dataflow_spark.streaming.bloom import (
    any_bloom_filter_udf,
    band_hash_cols,
    build_bloom,
    dir_parquet_bytes,
    load_bloom,
    might_contain_vec,
    save_bloom,
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
        n_buckets: int = 16,
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
        self.n_buckets = n_buckets
        # per-batch read telemetry: {"units_total", "units_read",
        # "bytes_read", "candidates"} — the scale test asserts bytes_read
        # stays ~flat as committed state grows
        self.last_state_read: dict | None = None
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

    def _state_units(self) -> list[str]:
        """Prunable read units: each ``__bkt=N`` bucket dir of the current
        compaction (or the compaction root itself for legacy unbucketed
        state) plus every committed uncompacted per-batch dir."""
        committed = self._committed()
        comp = self._compaction()
        units: list[str] = []
        if comp["dir"] is not None:
            root = os.path.join(self.state_dir, "bands", comp["dir"])
            if os.path.exists(root):
                subs = sorted(_glob.glob(os.path.join(root, "__bkt=*")))
                if subs:
                    units.extend(subs)
                elif _glob.glob(os.path.join(root, "*.parquet")):
                    units.append(root)  # legacy unbucketed compaction
                # else: retention drained the state to empty — no unit
        units.extend(self._batch_dir(b) for b in sorted(committed) if b > comp["upto"])
        return [u for u in units if os.path.exists(u)]

    @staticmethod
    def _read_units(spark: SparkSession, units: list[str]) -> DataFrame:
        # bucket subdirs are read directly (no partition-column inference),
        # so every unit yields the same (id, band, ts_us) schema
        return spark.read.parquet(*units).select("id", "band", "ts_us")

    # --------------------------------------------------------------- process

    def _collisions_with_state(self, spark: SparkSession, bands: DataFrame):
        """ids of batch rows whose bands collide with committed state,
        reading as few state units as the Bloom sidecars allow. Returns a
        DataFrame[id] or None (no state / no possible collision); always
        sets ``last_state_read``."""
        units = self._state_units()
        if not units:
            self.last_state_read = {
                "units_total": 0, "units_read": 0, "bytes_read": 0, "candidates": 0,
            }
            return None
        blooms = {u: load_bloom(u) for u in units}
        if any(v is None for v in blooms.values()):
            # legacy/sidecar-less state: no pruning possible — exact full read
            state = self._read_units(spark, units)
            self.last_state_read = {
                "units_total": len(units),
                "units_read": len(units),
                "bytes_read": sum(dir_parquet_bytes(u) for u in units),
                "candidates": -1,
            }
            return (
                bands.join(state.select("band").distinct().hint("shuffle_hash"), "band")
                .select("id")
                .distinct()
            )

        # 1. prefilter the BATCH side through the union of unit Blooms —
        #    mostly-new data shrinks to real dups + ~0.07% false positives
        bands_h = bands.select("id", "band", *band_hash_cols("band"))
        might = any_bloom_filter_udf(spark, list(blooms.values()))
        cand = bands_h.filter(might(F.col("__h1"), F.col("__h2"))).localCheckpoint()

        # 2. probe each unit's Bloom with the candidate hashes (driver-side
        #    numpy over the now-small distinct candidate set) → units to read
        pairs = cand.select("__h1", "__h2").distinct().collect()
        hit_units: list[str] = []
        if pairs:
            u1 = np.array([p["__h1"] for p in pairs], dtype=np.int64).view(np.uint64)
            u2 = np.array([p["__h2"] for p in pairs], dtype=np.int64).view(np.uint64)
            hit_units = [
                u for u in units
                if might_contain_vec(blooms[u][0], blooms[u][1], u1, u2).any()
            ]
        self.last_state_read = {
            "units_total": len(units),
            "units_read": len(hit_units),
            "bytes_read": sum(dir_parquet_bytes(u) for u in hit_units),
            "candidates": len(pairs),
        }
        if not hit_units:
            return None

        # 3. exact anti-join of the candidates against ONLY the hit units —
        #    Blooms never have false negatives, so skipped units provably
        #    contain none of this batch's bands and the result is identical
        #    to the full-state join.
        state = self._read_units(spark, hit_units)
        return (
            cand.join(state.select("band").distinct().hint("shuffle_hash"), "band")
            .select("id")
            .distinct()
        )

    def process_batch(self, df: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed():
            return  # replay of a committed batch — state+downstream done
        spark = df.sparkSession
        df = df.localCheckpoint()
        bands = self._band_table(df).localCheckpoint()

        # rows colliding with ANY previously-kept row are dropped outright
        # (the kept side always wins — it is strictly earlier). anti-join on
        # the band value: one shuffle, no self-join, no pair explosion —
        # and the state side is Bloom-pruned to the units that can collide.
        hit_ids = self._collisions_with_state(spark, bands)
        if hit_ids is not None:
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
        ).localCheckpoint()
        surv_bands.write.mode("overwrite").parquet(self._batch_dir(batch_id))
        # Bloom sidecar before the commit append: a committed dir always
        # carries its filter (a crash mid-sidecar leaves the dir uncommitted
        # and replay overwrites both). Sized without an extra count job:
        # every survivor emits exactly `bands` band rows, so n_keys =
        # survivors × bands; built from the checkpointed band table (same
        # deterministic content as the parquet just written).
        n_surv = survivors.count()
        from dataflow_spark.operators.dedup import optimal_band_param

        n_bands, _ = optimal_band_param(self.threshold, self.num_perm)
        bits, m = build_bloom(surv_bands, max(n_surv * n_bands, 1))
        save_bloom(self._batch_dir(batch_id), bits, m)
        if self.downstream is not None:
            self.downstream(survivors, batch_id)
        with open(self._commits, "a") as f:
            f.write(json.dumps({"batch_id": batch_id, "rows": n_surv}) + "\n")

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
        units = self._state_units()
        if not units:
            return
        upto = max(committed)
        prev = self._compaction()
        state = self._read_units(spark, units)
        if retain_after_us is not None:
            state = state.filter(
                F.col("ts_us").isNull() | (F.col("ts_us") >= retain_after_us)
            )
        # write the merged state under a FRESH name, then flip the manifest —
        # a crash before the flip leaves the old state fully reachable.
        # Layout: n_buckets band-hash partition dirs, each with a Bloom
        # sidecar, so the per-batch read path can prune at bucket grain.
        new_name = f"compact-{upto}-{prev['seq'] + 1}"
        new_dir = os.path.join(self.state_dir, "bands", new_name)
        (
            state.withColumn(
                "__bkt", F.pmod(F.xxhash64("band", F.lit("dfs-bkt")), F.lit(self.n_buckets))
            )
            .repartition(self.n_buckets, "__bkt")
            .write.partitionBy("__bkt")
            .mode("overwrite")
            .parquet(new_dir)
        )
        # per-bucket Blooms: one distributed build per bucket dir —
        # compaction-time cost, amortized over compact_every batches
        for sub in sorted(_glob.glob(os.path.join(new_dir, "__bkt=*"))):
            sdf = spark.read.parquet(sub)
            bits, m = build_bloom(sdf, max(sdf.count(), 1))
            save_bloom(sub, bits, m)
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
