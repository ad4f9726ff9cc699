"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "turns_per_sec": ...}

The transcripts pipeline (the engine's raison d'être) is benchmarked on a
deterministically generated transcripts table (seed 42, cached under
.bench_cache/) and reported both as seconds and as sustained turns/sec.
Run scale evidence (local[8] vs local[32]) lives in tools/bench_scaling.py
→ BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_TURNS = int(os.environ.get("DFS_BENCH_TURNS", "300000"))


def _force(df) -> int:
    """Materialize fully (noop sink — nothing is pruned by count())."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def transcripts_path() -> str:
    from dataflow_spark.datagen import write_transcripts_parquet

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache", f"transcripts_{N_TURNS}_x16")
    return write_transcripts_parquet(cache, n_turns=N_TURNS, seed=42, n_files=16)


def pt_pipeline_transcripts(spark, path: str):
    """Flagship: full PT chain over the transcripts table."""
    from pyspark.sql import functions as F

    from dataflow_spark.functions.filters import apply_filters
    from dataflow_spark.functions.refiners import apply_refiners
    from dataflow_spark.functions.scorers import quality_score_native
    from dataflow_spark.operators.dedup import dedup_exact

    tr = spark.read.parquet(path)
    refined = apply_refiners(tr, ["remove_extra_spaces", "remove_emoji", "remove_html_url"])
    # structs are orderable — (conv_id, turn_idx) is the canonical order key
    deduped = dedup_exact(
        refined.withColumn("__ord", F.struct("conv_id", "turn_idx")),
        ["text"],
        "__ord",
    ).drop("__ord")
    filtered = apply_filters(
        deduped,
        ["content_null", "word_number", "mean_word_length", "alpha_words",
         "unique_words", "lorem_ipsum", "curly_bracket", "watermark"],
    )
    return filtered.withColumn("quality", quality_score_native(F.col("text")))


def _warm_stateful(spark) -> None:
    """Warmup class 5: run a 200-row conversation assembly through
    applyInPandasWithState (availableNow) so the state-store commit path,
    per-group Arrow serializer, and the stateful Python worker imports are
    all paid before any timed query. Checkpoint + output are discarded."""
    import shutil
    import tempfile

    from dataflow_spark.datagen import make_transcripts
    from dataflow_spark.streaming.assembly import assemble_conversations
    from dataflow_spark.streaming.source import file_stream

    tmp = tempfile.mkdtemp(prefix="dfs_bench_warm_")
    try:
        pdf = make_transcripts(200, seed=1).sort_values("ts")
        pdf = pdf.assign(ts=pdf.ts.astype("datetime64[us]"))
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        pdf.to_parquet(os.path.join(src, "p0.parquet"), index=False)
        (
            assemble_conversations(file_stream(spark, src), gap_seconds=600)
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(tmp, "ck"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _md5_loop(_=None) -> int:
    import hashlib

    x = b"x" * 1000
    for _ in range(200_000):
        x = hashlib.md5(x).digest() + b"y" * 984
    return 0


def _steal_jiffies() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:  # noqa: BLE001
        return -1


def _host_calibration() -> dict:
    """Pure-Python md5 throughput at 1 core AND 16-way parallel, plus CPU
    steal ticks — fixed workloads whose time depends only on host health,
    NOT on this repo's code. This shared VM shows large day-scale drift and
    CPU-steal spikes (observed >2x swings within hours), and the 1-core
    probe alone misses multi-core contention (a co-tenant can halve 16-way
    throughput while 1-core looks healthy), so both are recorded;
    per-round absolute timings are only comparable after normalizing by
    these numbers. ``steal_jiffies_after`` (stamped at the end of the run)
    minus ``_before``, over the run's wall time, gives the fraction of CPU
    the hypervisor took DURING the measurements."""
    s0 = _steal_jiffies()
    t0 = time.time()
    _md5_loop()
    one = round(time.time() - t0, 3)
    import multiprocessing as mp

    with mp.get_context("spawn").Pool(16) as pool:
        t0 = time.time()
        pool.map(_md5_loop, range(16))
        par = round(time.time() - t0, 3)
    return {
        "host_1core_md5_s": one,
        "host_16way_md5_wall_s": par,
        "host_16way_efficiency": round(one / par, 3) if par else None,
        "steal_jiffies_before": s0,
    }


def _gated_calibration() -> dict:
    """Host gate for the headline bench (r6 VERDICT ask #1, ported from
    tools/bench_dedup_amortization.gated_ceiling): probe the host FIRST
    and DEFER the timed run until the 16-way md5 efficiency lands in a
    sane window — ≥ DFS_BENCH_GATE_MIN_EFF (the host can express
    parallelism at all) and ≤ 1.02 (a reading >1 means the 1-core probe
    itself was stolen from — noise). Bounded retries so a driver-invoked
    bench can't stall: after DFS_BENCH_GATE_TRIES deferrals the run
    proceeds and the artifact records the contended window honestly.
    Defer messages go to stderr — stdout stays the one JSON line."""
    min_eff = float(os.environ.get("DFS_BENCH_GATE_MIN_EFF", "0.78"))
    tries = int(os.environ.get("DFS_BENCH_GATE_TRIES", "10"))
    sleep_s = float(os.environ.get("DFS_BENCH_GATE_SLEEP", "45"))
    deferrals = 0
    cal = _host_calibration()
    while deferrals < tries and not (min_eff <= (cal["host_16way_efficiency"] or 0) <= 1.02):
        deferrals += 1
        print(
            json.dumps(
                {"host_gate": "defer", "try": deferrals,
                 "efficiency": cal["host_16way_efficiency"]}
            ),
            file=sys.stderr,
            flush=True,
        )
        time.sleep(sleep_s)
        cal = _host_calibration()
    cal["gate_min_eff"] = min_eff
    cal["gate_deferrals"] = deferrals
    return cal


def main() -> None:
    from dataflow_spark.entry_queries import build_queries
    from dataflow_spark.session import get_spark

    cal = _gated_calibration()
    run_t0 = time.time()  # steal-fraction window: everything after the gate

    spark = get_spark("dataflow-bench")
    spark.sparkContext.setLogLevel("ERROR")
    tpath = transcripts_path()

    q = build_queries()
    headline = [
        "dedup_minhash_lsh",
        "dedup_exact_md5",
        "window_tumbling",
        "window_session",
        "assembly_conversations",
        "join_user_assistant",
        "ann_topk_bruteforce",
        "ann_topk_ivf",
        "pricing_summary",
        "score_ngram",
        "score_bigram_perplexity",
        "score_trigram_kn",
        "score_token_count_bpe",
        "classify_source_nb",
        # r7 second wave — curation-pipeline operators (not in the frozen
        # comparable subset; timed as suite extras)
        "line_dedup_global",
        "pack_token_shards",
        "dsir_logweights",
        "dedup_semdedup_kmeans",
        "ccnet_pipeline",
        "gopher_pipeline",
        "quality_signals",
    ]
    timings: dict[str, float] = {}

    # ---- PINNED WARMUP PROTOCOL (v3 — do not change without bumping) ----
    # Every per-query timing below measures steady-state throughput, the
    # quantity that matters on a long-lived cluster. One-time process costs
    # are paid here, once, by warming each execution-machinery class with a
    # NEUTRAL micro-task (no headline query's actual kernel is pre-run):
    #   1. JVM + parquet footer cache        — trivial count()
    #   2. whole-stage codegen + AQE         — flagship chain on a 2k slice
    #   3. stateless Arrow Python workers    — identity pandas_udf, all slots
    #   4. grouped-Arrow (applyInPandas)     — identity 8-group pass
    #   5. stateful streaming Arrow machinery (applyInPandasWithState +
    #      HDFS state store commit path)     — 200-row session assembly over
    #      a temp dir, checkpoint discarded
    # r01 warmed the minhash kernel itself (flattering dedup_minhash_lsh);
    # r02 dropped that but left classes 4-5 cold (first stateful/grouped
    # query absorbed ~0.3-0.5s of worker setup). v3 warms every class.
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    _force(pt_pipeline_transcripts(spark, tpath).limit(2000))
    from pyspark.sql import functions as _F
    from pyspark.sql.functions import PandasUDFType

    _warm = _F.pandas_udf(lambda x: x, "long", PandasUDFType.SCALAR)

    _force(
        spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism).select(
            _warm("id")
        )
    )
    _force(
        spark.range(0, 64, 1, 8)
        .withColumn("g", _F.col("id") % 8)
        .groupBy("g")
        .applyInPandas(lambda pdf: pdf, schema="id long, g long")
    )
    _warm_stateful(spark)

    t0 = time.time()
    df = pt_pipeline_transcripts(spark, tpath)
    _force(df)
    dt = time.time() - t0
    timings["pt_pipeline_transcripts"] = round(dt, 3)
    turns_per_sec = round(N_TURNS / dt, 1)

    # streaming leg: same refine+filter chain through the exactly-once sink
    import shutil
    import tempfile

    from dataflow_spark.functions.filters import apply_filters
    from dataflow_spark.functions.refiners import apply_refiners
    from dataflow_spark.streaming.sink import KeyedMergeSink
    from dataflow_spark.streaming.source import file_stream

    sink_dir = tempfile.mkdtemp(prefix="dfs_bench_sink_")
    ck = tempfile.mkdtemp(prefix="dfs_bench_ck_")
    sink = KeyedMergeSink(os.path.join(sink_dir, "table"))
    t0 = time.time()
    sq = (
        apply_filters(
            apply_refiners(
                file_stream(spark, tpath),
                ["remove_extra_spaces", "remove_emoji", "remove_html_url"],
            ),
            ["content_null", "word_number", "alpha_words", "unique_words"],
        )
        .writeStream.foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    sdt = time.time() - t0
    timings["stream_pipeline_transcripts"] = round(sdt, 3)
    stream_turns_per_sec = round(N_TURNS / sdt, 1)
    shutil.rmtree(sink_dir, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)

    # scored streaming leg (r6 ask #6): train-once BPE+LM models, then a
    # per-batch perplexity/token-count band filter through the sink.
    # r7: training (model fit + artifact save under out_dir/models) is
    # timed SEPARATELY from the score-only stream — on a long-lived
    # cluster training happens once per corpus while scoring runs
    # forever, so the steady-state number is the score-only one.
    from dataflow_spark.streaming.app import TranscriptsApp

    app_dir = tempfile.mkdtemp(prefix="dfs_bench_scored_")
    ck2 = tempfile.mkdtemp(prefix="dfs_bench_ck2_")
    app = TranscriptsApp(src_dir=tpath, out_dir=app_dir)
    t0 = time.time()
    app.train_models(spark)
    timings["scored_train_models"] = round(time.time() - t0, 3)
    t0 = time.time()
    sq2 = (
        apply_refiners(file_stream(spark, tpath), app.refiners)
        .writeStream.foreachBatch(
            lambda bdf, bid: app.scored_sink.foreach_batch(app.score_df(bdf), bid)
        )
        .option("checkpointLocation", ck2)
        .trigger(availableNow=True)
        .start()
    )
    sq2.awaitTermination()
    timings["stream_scored_transcripts"] = round(time.time() - t0, 3)
    app.release_models()
    shutil.rmtree(app_dir, ignore_errors=True)
    shutil.rmtree(ck2, ignore_errors=True)

    for name in headline:
        t0 = time.time()
        _force(q[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    # FROZEN r2-era comparable subset — the suite grows every round, so
    # `value` alone reads as a regression when queries are added;
    # `value_comparable` sums only these 11 (the exact BENCH_r02 set) for
    # apples-to-apples cross-round reads. Do not add to this list.
    comparable = [
        "pt_pipeline_transcripts", "stream_pipeline_transcripts",
        "dedup_minhash_lsh", "dedup_exact_md5", "window_tumbling",
        "window_session", "assembly_conversations", "join_user_assistant",
        "ann_topk_bruteforce", "pricing_summary", "score_ngram",
    ]
    value_comparable = round(sum(timings[k] for k in comparable if k in timings), 3)
    cal["steal_jiffies_after"] = _steal_jiffies()
    # same-window confirmation: a sane 16-way reading AFTER the timed
    # queries means the window held for the whole measurement
    post = _host_calibration()
    cal["host_16way_efficiency_after"] = post["host_16way_efficiency"]
    # The pre/post efficiency probes are POINT measurements — a steal
    # burst that lands mid-run and ends before the post probe sails
    # straight through them (observed: a run with ~70 cpu-s of steal and
    # 6x-inflated short queries read post-eff 0.783 = "sane"). The
    # run-spanning steal-jiffies delta is the instrument that cannot be
    # evaded: require total steal < 0.1% of machine capacity over the
    # measured window as well.
    import multiprocessing as _mp

    wall_s = max(time.time() - run_t0, 1e-3)
    steal_d = cal["steal_jiffies_after"] - cal["steal_jiffies_before"]
    cal["steal_frac_of_capacity"] = round(
        steal_d / (100.0 * _mp.cpu_count() * wall_s), 6
    ) if steal_d >= 0 else None
    cal["window_sane"] = bool(
        cal["gate_min_eff"] <= (cal["host_16way_efficiency"] or 0) <= 1.02
        and cal["gate_min_eff"] <= (post["host_16way_efficiency"] or 0) <= 1.02
        and (cal["steal_frac_of_capacity"] is None
             or cal["steal_frac_of_capacity"] < 0.001)
    )
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)
    print(
        json.dumps(
            {
                "metric": "headline query wall-clock (PT transcripts pipeline + operator suite)",
                "value": total,
                "value_comparable": value_comparable,
                "comparable_queries": comparable,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "turns_per_sec": turns_per_sec,
                "stream_turns_per_sec": stream_turns_per_sec,
                "n_turns": N_TURNS,
                "cores": spark.sparkContext.defaultParallelism,
                "host_calibration": cal,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
