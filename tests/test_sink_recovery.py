"""Exactly-once sink: kill mid-stream, restart from checkpoint, verify the
merged table equals batch truth with unique keys, replays are no-ops, and
per-partition lineage is recorded."""

import os
import time

import pytest

import pandas as pd

from dataflow_spark.datagen import make_transcripts
from dataflow_spark.functions.refiners import apply_refiners
from dataflow_spark.streaming.sink import KeyedMergeSink
from dataflow_spark.streaming.source import file_stream


def _write_chunks(tmp_path, n=4000, chunks=4, seed=9):
    src = tmp_path / "src"
    src.mkdir()
    pdf = make_transcripts(n, seed=seed)
    pdf = pdf.assign(ts=pdf.ts.astype("datetime64[us]"))
    step = n // chunks
    for i in range(chunks):
        pdf.iloc[i * step : (i + 1) * step].to_parquet(
            str(src / f"part{i}.parquet"), index=False
        )
    return str(src), pdf


def test_exactly_once_with_kill_restart(spark, tmp_path):
    srcdir, _ = _write_chunks(tmp_path)
    sink = KeyedMergeSink(str(tmp_path / "table"))
    ck = str(tmp_path / "ck")

    def run(stop_after=None):
        stream = file_stream(spark, srcdir, max_files_per_trigger=1)
        refined = apply_refiners(stream, ["remove_extra_spaces"])
        q = (
            refined.writeStream.foreachBatch(sink.foreach_batch)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if stop_after is not None:
            while len(sink.committed_batches()) < stop_after and q.isActive:
                time.sleep(0.2)
            q.stop()
            try:
                q.awaitTermination(60)
            except Exception:
                pass
        else:
            # generous cap: availableNow terminates on its own when caught
            # up; under heavy host load 300 s has been observed to expire
            # BEFORE the final micro-batch commits, failing the batch-count
            # assertion below with a half-finished (not wrong) table
            q.awaitTermination(900)

    run(stop_after=2)  # simulated failure — under host load the query may
    # die earlier or finish more batches; ANY crash point is a valid test
    # of recovery, the exactly-once assertions below carry the weight
    run()  # recovery from checkpoint
    assert sorted(sink.committed_batches()) == [0, 1, 2, 3]

    final = sink.read_table(spark).orderBy("conv_id", "turn_idx").toPandas()
    truth = (
        apply_refiners(spark.read.parquet(srcdir), ["remove_extra_spaces"])
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert final.duplicated(["conv_id", "turn_idx"]).sum() == 0
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    assert final[cols].reset_index(drop=True).equals(truth[cols].reset_index(drop=True))

    lin = sink.lineage()
    assert len(lin) == 4
    assert all("partition_rows" in r and r["rows"] > 0 for r in lin)


def test_replayed_batch_is_noop(spark, tmp_path):
    srcdir, _ = _write_chunks(tmp_path, n=1000, chunks=1)
    sink = KeyedMergeSink(str(tmp_path / "table2"))
    df = apply_refiners(spark.read.parquet(srcdir), ["remove_extra_spaces"])
    sink.foreach_batch(df, 0)
    rows_before = sink.read_table(spark).count()
    commits_before = os.path.getsize(sink._commits_path)
    sink.foreach_batch(df, 0)  # replay
    assert sink.read_table(spark).count() == rows_before
    assert os.path.getsize(sink._commits_path) == commits_before


def test_merge_upserts_by_key(spark, tmp_path):
    sink = KeyedMergeSink(str(tmp_path / "table3"))
    df1 = spark.createDataFrame(
        [("c1", 0, "user", "v1", "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    df2 = spark.createDataFrame(
        [("c1", 0, "user", "v2", "", None), ("c1", 1, "assistant", "w", "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    sink.foreach_batch(df1, 0)
    sink.foreach_batch(df2, 1)
    out = {(r.conv_id, r.turn_idx): r.text for r in sink.read_table(spark).collect()}
    assert out == {("c1", 0): "v2", ("c1", 1): "w"}  # last writer wins


def test_merge_sink_factory_falls_back_without_iceberg(spark, tmp_path):
    """r5 VERDICT ask #8: the sink factory probes the session JVM for the
    Iceberg runtime and falls back to the parquet KeyedMergeSink when
    absent (this container). The probe must be a clean False here, and
    the returned foreach_batch must be the real parquet merge."""
    import pandas as pd

    from dataflow_spark.session import iceberg_available
    from dataflow_spark.streaming.sink import KeyedMergeSink, merge_sink_for

    assert iceberg_available(spark) is False
    fn, sink = merge_sink_for(spark, str(tmp_path / "tbl"), keys=("k",))
    assert isinstance(sink, KeyedMergeSink)
    fn(spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})), 0)
    fn(spark.createDataFrame(pd.DataFrame({"k": [2, 3], "v": ["B", "c"]})), 1)
    got = {r["k"]: r["v"] for r in sink.read_table(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


@pytest.mark.skipif(
    not (
        os.environ.get("DFS_ICEBERG_JAR")
        and os.path.exists(os.environ.get("DFS_ICEBERG_JAR", ""))
    ),
    reason="Iceberg runtime jar not provided (set DFS_ICEBERG_JAR)",
)
def test_iceberg_merge_sink_active_with_jar(spark, tmp_path):
    """Activates the moment the environment provides an Iceberg runtime
    jar: the factory must pick the real MERGE INTO path and the table
    must be key-unique after overlapping batches. NOTE: the jar must be
    on the session at build time — run this test in its own process with
    DFS_ICEBERG_JAR exported before any other test builds the session."""
    import pandas as pd

    from dataflow_spark.session import iceberg_available
    from dataflow_spark.streaming.sink import merge_sink_for

    if not iceberg_available(spark):
        pytest.skip("session was built before DFS_ICEBERG_JAR was set")
    table = "local.db.sink_probe"
    fn, sink = merge_sink_for(spark, str(tmp_path / "x"), keys=("k",), iceberg_table=table)
    assert sink is None
    fn(spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})), 0)
    fn(spark.createDataFrame(pd.DataFrame({"k": [2, 3], "v": ["B", "c"]})), 1)
    got = {r["k"]: r["v"] for r in spark.table(table).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    spark.sql(f"DROP TABLE IF EXISTS {table}")
