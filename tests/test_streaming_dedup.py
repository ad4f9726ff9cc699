"""Streaming dedup: incremental first-wins must equal the global
sequential scan; exact dedup state is watermark-scoped."""

import numpy as np
import os
import pandas as pd

from dataflow_spark.datagen import make_transcripts
from dataflow_spark.streaming.dedup import StreamingFirstWinsDedup, dedup_exact_stream
from dataflow_spark.streaming.source import file_stream
from tests import reference_kernels as RK


def test_streaming_minhash_equals_sequential_scan(spark, tmp_path):
    pdf = make_transcripts(3000, seed=21).sort_values(["conv_id", "turn_idx"]).reset_index(
        drop=True
    )
    pdf["rid"] = np.arange(len(pdf), dtype="int64")
    pdf = pdf.assign(ts=pdf.ts.astype("datetime64[us]"))
    src = tmp_path / "src"
    src.mkdir()
    # file order must follow rid order (arrival order == reference order):
    # zero-padded names so the source lists them in order
    for i in range(3):
        pdf.iloc[i * 1000 : (i + 1) * 1000].to_parquet(
            str(src / f"part{i:02d}.parquet"), index=False
        )

    kept_ids: list[int] = []

    def downstream(df, batch_id):
        kept_ids.extend(r.rid for r in df.select("rid").collect())

    dedup = StreamingFirstWinsDedup(
        str(tmp_path / "state"), order_col="rid", downstream=downstream
    )
    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, tool string, "
            "ts timestamp, rid long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(dedup.process_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    expected_mask = RK.minhash_dedup_keep(pdf["text"].tolist())
    expected = pdf[pd.Series(expected_mask).values]["rid"].tolist()
    assert sorted(kept_ids) == sorted(expected)


def test_streaming_minhash_replay_is_noop(spark, tmp_path):
    pdf = make_transcripts(500, seed=22)
    pdf["rid"] = np.arange(len(pdf), dtype="int64")
    df = spark.createDataFrame(pdf)
    out: list[int] = []
    dedup = StreamingFirstWinsDedup(
        str(tmp_path / "state2"), order_col="rid",
        downstream=lambda d, b: out.extend(r.rid for r in d.select("rid").collect()),
    )
    dedup.process_batch(df, 0)
    n1 = len(out)
    dedup.process_batch(df, 0)  # replay same batch id
    assert len(out) == n1


def test_dedup_exact_stream(spark, tmp_path):
    pdf = make_transcripts(2000, seed=23)
    pdf = pdf.assign(ts=pdf.ts.astype("datetime64[us]"))
    src = tmp_path / "src3"
    src.mkdir()
    pdf.to_parquet(str(src / "p.parquet"), index=False)
    stream = file_stream(spark, str(src))
    out = dedup_exact_stream(stream, ["text"], delay="365 days")
    q = (
        out.writeStream.format("memory")
        .queryName("t_dexact")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("t_dexact").toPandas()
    # one row per distinct text survives
    assert got["text"].fillna("").nunique() == len(got)
    assert len(got) == pdf["text"].fillna("").nunique()


def test_crash_between_state_write_and_commit_loses_nothing(spark, tmp_path):
    """Regression (round-1 advice, high): a crash AFTER the batch's bands
    are staged but BEFORE the commit append must not drop the batch's
    survivors on replay — per-batch state dirs are invisible until the
    commit log references them."""
    pdf = make_transcripts(400, seed=31)
    pdf["rid"] = np.arange(len(pdf), dtype="int64")
    df = spark.createDataFrame(pdf)
    out: list[int] = []
    d = StreamingFirstWinsDedup(
        str(tmp_path / "state_crash"), order_col="rid",
        downstream=lambda s, b: out.extend(r.rid for r in s.select("rid").collect()),
    )

    # simulate the crash: run the batch, then delete its commit record
    d.process_batch(df, 0)
    survivors_first = sorted(out)
    assert survivors_first, "first delivery must be non-empty"
    os.remove(d._commits)  # commit lost; staged bands/batch=0 remains

    out.clear()
    d.process_batch(df, 0)  # at-least-once replay
    assert sorted(out) == survivors_first  # zero loss, identical keep-set


def test_compaction_keepset_unchanged(spark, tmp_path):
    pdf = make_transcripts(900, seed=32).reset_index(drop=True)
    pdf["rid"] = np.arange(len(pdf), dtype="int64")
    out: list[int] = []
    d = StreamingFirstWinsDedup(
        str(tmp_path / "state_c"), order_col="rid", ts_col="ts",
        downstream=lambda s, b: out.extend(r.rid for r in s.select("rid").collect()),
        compact_every=None,
    )
    for i in range(3):
        d.process_batch(spark.createDataFrame(pdf.iloc[i * 300 : (i + 1) * 300]), i)
    d.compact(spark)
    assert d._compaction()["upto"] == 2
    # per-batch dirs reclaimed, state served from the compacted dir only
    assert len(d._state_dirs()) == 1
    # new batch of pure duplicates must still be fully dropped
    dup = pdf.iloc[:300].copy()
    dup["rid"] = dup["rid"] + 10_000
    n_before = len(out)
    d.process_batch(spark.createDataFrame(dup), 3)
    assert len(out) == n_before  # all duplicates of compacted keepers


def _unique_batch(b: int, n: int = 400) -> pd.DataFrame:
    """n wholly-dissimilar texts (md5-hex tokens, so byte-5-gram shingle
    sets share no structure across rows — structured tokens like 'tok123'
    produce genuine no-verify LSH band collisions) — the mostly-new-data
    regime the Bloom pruning is designed for."""
    import hashlib

    rows = []
    for i in range(n):
        g = b * 10_000 + i
        toks = [hashlib.md5(f"{g}:{j}".encode()).hexdigest() for j in range(12)]
        rows.append((g, " ".join(toks)))
    return pd.DataFrame(rows, columns=["rid", "text"])


def test_state_read_stays_flat_as_keepset_grows(spark, tmp_path):
    """The 10^12-turn scale property: per-batch state BYTES READ must not
    grow with the committed keep-set. With bucketed compaction + Bloom
    sidecars, a batch of new texts prefilters to ~zero candidates and
    reads ~no state units, while total state keeps growing; a batch of
    actual duplicates still reads (only) the colliding units and drops
    every duplicate — pruning never changes the keep-set."""
    from dataflow_spark.streaming.bloom import dir_parquet_bytes

    out: list[int] = []
    d = StreamingFirstWinsDedup(
        str(tmp_path / "state_flat"), order_col="rid",
        downstream=lambda s, b: out.extend(r.rid for r in s.select("rid").collect()),
        compact_every=4, n_buckets=8,
    )
    reads, totals = [], []
    for b in range(12):
        d.process_batch(spark.createDataFrame(_unique_batch(b)), b)
        reads.append(dict(d.last_state_read))
        totals.append(sum(dir_parquet_bytes(u) for u in d._state_units()))

    # semantics: everything unique — nothing may be dropped
    assert len(out) == 12 * 400
    # state grows without bound...
    assert totals[-1] > 4 * totals[1]
    # ...but late batches read almost none of it: across the last 4
    # batches at most a couple of Bloom-false-positive unit reads, never
    # a scan proportional to the keep-set
    late_bytes = [r["bytes_read"] for r in reads[8:]]
    assert max(late_bytes) < 0.3 * totals[-1]
    assert sum(r["units_read"] for r in reads[8:]) <= 4
    # candidate sets are tiny (false positives only)
    assert all(0 <= r["candidates"] <= 40 for r in reads[8:])

    # a true-duplicate batch must still be caught — and by reading only
    # the unit(s) its bands collide with, not the whole state
    dup = _unique_batch(0)
    dup["rid"] = dup["rid"] + 1_000_000
    n_before = len(out)
    d.process_batch(spark.createDataFrame(dup), 12)
    assert len(out) == n_before  # all dropped: pruning kept exactness
    # a full-duplicate batch legitimately touches every colliding bucket
    # (here: all of them — its 2000 bands hash across all 8), but never
    # more than the committed state
    assert d.last_state_read["units_read"] >= 1
    assert d.last_state_read["bytes_read"] <= totals[-1]


def test_compaction_retention_expires_old_state(spark, tmp_path):
    pdf = make_transcripts(300, seed=33).reset_index(drop=True)
    pdf["rid"] = np.arange(len(pdf), dtype="int64")
    out: list[int] = []
    d = StreamingFirstWinsDedup(
        str(tmp_path / "state_r"), order_col="rid", ts_col="ts",
        downstream=lambda s, b: out.extend(r.rid for r in s.select("rid").collect()),
        compact_every=None,
    )
    d.process_batch(spark.createDataFrame(pdf), 0)
    n_kept = len(out)
    # retention horizon beyond every keeper's event time → state drains
    horizon = int(pdf["ts"].astype("datetime64[us]").astype("int64").max()) + 1
    d.compact(spark, retain_after_us=horizon)
    dup = pdf.copy()
    dup["rid"] = dup["rid"] + 10_000
    d.process_batch(spark.createDataFrame(dup), 1)
    # old keepers expired — the duplicates resurface as new keepers
    assert len(out) == n_kept * 2


def test_sharded_prefilter_bounds_broadcast_bytes(spark, tmp_path):
    """Past ``prefilter_broadcast_max_bytes`` the prefilter switches to the
    sharded driver probe: per-batch broadcast filter bytes are ZERO no
    matter how large the committed band state grows, compaction buckets
    none of the batch's bands hash into are never loaded from disk, and
    the keep-set is identical to the broadcast-mode instance's."""
    kept = {"bc": [], "drv": []}
    insts = {}
    for mode, cap in (("bc", 1 << 30), ("drv", 0)):
        d = StreamingFirstWinsDedup(
            str(tmp_path / f"state_{mode}"), order_col="rid",
            downstream=(lambda m: lambda s, b: kept[m].extend(
                r.rid for r in s.select("rid").collect()))(mode),
            compact_every=4, n_buckets=8, prefilter_broadcast_max_bytes=cap,
        )
        insts[mode] = d
        for b in range(8):
            batch = _unique_batch(b)
            if b == 6:  # one true-duplicate batch: dedup must still fire
                batch = _unique_batch(0)
                batch["rid"] = batch["rid"] + 500_000
            d.process_batch(spark.createDataFrame(batch), b)
            if mode == "drv":
                r = d.last_state_read
                if b > 0:
                    assert r["prefilter_mode"] == "driver"
                assert r["prefilter_broadcast_bytes"] == 0
        assert d._gen_bytes == 0 or mode == "bc"
    assert sorted(kept["bc"]) == sorted(kept["drv"])
    # duplicates actually dropped (batch 6 contributed nothing)
    assert len(kept["drv"]) == 7 * 400

    # bucket sharding: a single-row batch hashes into few of the 8
    # compaction buckets — most bucket sidecars must not even be loaded
    d = insts["drv"]
    d._bloom_cache._entries.clear()
    d._bloom_cache._bytes = 0
    one = pd.DataFrame({"rid": [999_999], "text": [_unique_batch(0)["text"].iloc[0]]})
    d.process_batch(spark.createDataFrame(one), 8)
    import glob as _g
    total_sidecar = sum(
        os.path.getsize(p)
        for u in d._state_units()
        for p in _g.glob(os.path.join(u, "_bloom.npz"))
    )
    assert d.last_state_read["sidecar_bytes_loaded"] < total_sidecar
    assert len(kept["drv"]) == 7 * 400  # the duplicate row was dropped


def test_overcap_probe_never_collects_band_hashes(spark, tmp_path):
    """r5 VERDICT ask #2: past ``prefilter_broadcast_max_bytes`` the
    driver's role is UNIT SELECTION — it must never collect the batch's
    band hashes (the old over-cap path collected the full distinct band
    set: ~5M Rows at a 1M-row trigger). With the distributed bitmask
    probe, every collect during an over-cap batch is driver-sized: bucket
    ids (≤ n_buckets rows), one 2-long row per probe chunk, Bloom-build
    partials (≤ #partitions rows of filter words, sized by the filter,
    not the batch). Semantics: the known-duplicate half of the big batch
    still drops exactly."""
    out: list[int] = []
    d = StreamingFirstWinsDedup(
        str(tmp_path / "state_oc"), order_col="rid",
        downstream=lambda s, b: out.extend(r.rid for r in s.select("rid").collect()),
        compact_every=4, n_buckets=8, prefilter_broadcast_max_bytes=0,
    )
    for b in range(6):
        d.process_batch(spark.createDataFrame(_unique_batch(b)), b)
    n_before = len(out)

    # large mixed batch: 800 duplicates of committed keepers + 800 new
    big = pd.concat(
        [_unique_batch(0), _unique_batch(1), _unique_batch(98), _unique_batch(99)],
        ignore_index=True,
    )
    big["rid"] = np.arange(len(big), dtype="int64") + 5_000_000

    # patch the CLASSIC implementation class — in Spark 4 the public
    # pyspark.sql.DataFrame is an abstract base whose collect() the
    # classic subclass overrides
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # pre-connect-refactor pyspark
        from pyspark.sql import DataFrame as _DF

    sizes: list[int] = []
    orig = _DF.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    _DF.collect = spy
    try:
        d.process_batch(spark.createDataFrame(big), 6)
    finally:
        _DF.collect = orig

    assert d.last_state_read["prefilter_mode"] == "driver"
    assert d.last_state_read["prefilter_broadcast_bytes"] == 0
    # 6400 distinct band rows in the batch — a band-hash collect would be
    # thousands of rows; unit selection needs only driver-sized results
    # (the one large-ish collect is the test's own downstream sink)
    internal = sorted(sizes)[:-1]  # drop the downstream survivors collect
    assert internal and max(internal) <= 64, sizes
    # semantics: duplicate half dropped, new half kept, first-wins intact
    assert len(out) == n_before + 800


def test_restart_with_different_n_buckets_keeps_exactness(spark, tmp_path):
    """The compaction's ``__bkt=`` dirs are only meaningful under the
    bucket count they were WRITTEN with. A restart with a different
    ``n_buckets`` must shard-skip against the count recorded in
    ``_compaction.json`` — computing batch bucket ids with the new
    instance's count would silently skip units that do contain colliding
    bands and leak duplicates into the keep-set (r5 ADVICE, medium)."""
    state = str(tmp_path / "state_nb")
    out: list[int] = []
    sink = lambda s, b: out.extend(r.rid for r in s.select("rid").collect())  # noqa: E731
    d16 = StreamingFirstWinsDedup(
        state, order_col="rid", downstream=sink, compact_every=None, n_buckets=16,
    )
    for b in range(4):
        d16.process_batch(spark.createDataFrame(_unique_batch(b)), b)
    d16.compact(spark)
    assert d16._compaction()["n_buckets"] == 16  # manifest pins the count
    n_committed = len(out)
    assert n_committed == 4 * 400

    # restart with n_buckets=5: under mod-5 batch bucket ids, compaction
    # dirs __bkt=5..15 would be skipped by the buggy skip test — the
    # duplicate batch's keepers live all across the 16 buckets
    d5 = StreamingFirstWinsDedup(
        state, order_col="rid", downstream=sink, compact_every=None, n_buckets=5,
    )
    dup = _unique_batch(0)
    dup["rid"] = dup["rid"] + 2_000_000
    d5.process_batch(spark.createDataFrame(dup), 4)
    assert len(out) == n_committed  # every duplicate dropped

    # legacy manifest without a recorded count → skip disabled, still exact
    import json as _json

    man = d5._compaction()
    man.pop("n_buckets")
    with open(d5._manifest, "w") as f:
        _json.dump(man, f)
    dup2 = _unique_batch(1)
    dup2["rid"] = dup2["rid"] + 3_000_000
    d5.process_batch(spark.createDataFrame(dup2), 5)
    assert len(out) == n_committed


def test_probe_job_count_independent_of_unit_count(spark, tmp_path):
    """r6 VERDICT ask #5: the over-cap probe decides ALL candidate units
    in ONE aggregation (one scan of the batch) via the array<long>
    multimask — the old int64 mask re-scanned the persisted batch once
    per 63-unit chunk. 70 sidecar'd units → exactly one probe collect,
    and the hit set is exactly the planted units (Blooms at 16 bits/key
    have ~7e-4 FP — none among 70 probes of disjoint single-key filters)."""
    import numpy as np

    from dataflow_spark.streaming import bloom as B
    from dataflow_spark.streaming.dedup import StreamingFirstWinsDedup

    n_units = 70
    bands = [f"probe-band-{i:03d}" for i in range(n_units)]
    hpdf = (
        spark.createDataFrame([(b,) for b in bands], "band string")
        .select("band", *B.band_hash_cols("band"))
        .toPandas()
        .set_index("band")
        .loc[bands]
    )
    u1 = hpdf["__h1"].to_numpy(dtype="int64").view(np.uint64)
    u2 = hpdf["__h2"].to_numpy(dtype="int64").view(np.uint64)

    units = []
    for i in range(n_units):
        udir = str(tmp_path / f"unit_{i:03d}")
        os.makedirs(udir)
        m = B.bloom_m_for(1)
        bits = np.zeros(m // 64, dtype=np.uint64)
        B.set_bits(bits, m, u1[i : i + 1], u2[i : i + 1])
        B.save_bloom(udir, bits, m)
        units.append(udir)

    # the byte cap bounds the chunk's TRANSIENT broadcast, not its unit
    # count — at the default cap these 70 tiny sidecars are one chunk
    # (the pre-r7 code still split them 63+7 → two scans)
    d = StreamingFirstWinsDedup(str(tmp_path / "state"), order_col="rid")
    # the batch's bands hit only units 5..9
    probe_src = (
        spark.createDataFrame([(b,) for b in bands[5:10]], "band string")
        .select(*B.band_hash_cols("band"))
        .persist()
    )
    probe_src.count()

    try:
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:
        from pyspark.sql import DataFrame as _DF

    calls: list[int] = []
    orig = _DF.collect

    def spy(self):
        rows = orig(self)
        calls.append(len(rows))
        return rows

    read = {"sidecar_bytes_loaded": 0, "probe_broadcast_peak_bytes": 0}
    _DF.collect = spy
    try:
        hits, cand = d._probe_units(spark, probe_src, units, read, False)
    finally:
        _DF.collect = orig
        probe_src.unpersist()

    assert len(calls) == 1, f"expected ONE probe aggregation, saw {len(calls)}"
    assert calls[0] == 1  # a single Row of mask words + count
    assert sorted(hits) == sorted(units[5:10])
    assert cand == 5
