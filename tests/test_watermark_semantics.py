"""Event-time semantics under watermarks: data later than the watermark
horizon is DROPPED from closed windows; sink snapshots time-travel."""

import pandas as pd
from pyspark.sql import functions as F

from dataflow_spark.streaming.sink import KeyedMergeSink
from dataflow_spark.streaming.windows import tumbling_turn_counts


def _write(pdf: pd.DataFrame, path: str):
    pdf = pdf.copy()
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(path, index=False)


def test_too_late_rows_are_dropped(spark, tmp_path):
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    src = tmp_path / "src"
    src.mkdir()
    # Watermark mechanics (micro-batch): wm computed from batch N's max
    # event time takes effect in batch N+1; a window is evicted+emitted in
    # the first batch whose wm passes its end; rows arriving AFTER that
    # eviction are dropped. Three batches stage exactly that:
    # batch 0 — c1's window opens; max ts 10:00 ⇒ wm 09:58 from batch 1 on
    _write(
        pd.DataFrame(
            [
                ("c1", 0, "user", "a", "", "2024-01-01 00:00:10"),
                ("c9", 0, "user", "z", "", "2024-01-01 10:00:00"),
            ],
            columns=cols,
        ),
        str(src / "part00.parquet"),
    )
    # batch 1 — wm 09:58 evicts+emits c1's [00:00,00:01) window with n=1
    _write(
        pd.DataFrame(
            [("c9", 1, "assistant", "y", "", "2024-01-01 11:00:00")], columns=cols
        ),
        str(src / "part01.parquet"),
    )
    # batch 2 — a row for the ALREADY-EMITTED window: must be dropped
    _write(
        pd.DataFrame(
            [("c1", 1, "assistant", "b", "", "2024-01-01 00:00:20")], columns=cols
        ),
        str(src / "part02.parquet"),
    )
    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        tumbling_turn_counts(stream, "1 minute", "2 minutes")
        .writeStream.format("memory")
        .queryName("t_toolate")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("t_toolate").toPandas()
    c1 = got[got.conv_id == "c1"]
    # c1's 00:00 window closed after batch 1 with ONLY the on-time row;
    # the hours-late batch-2 row must not reopen or recount it
    assert len(c1) == 1 and int(c1.n_turns.iloc[0]) == 1


def test_sink_time_travel(spark, tmp_path):
    sink = KeyedMergeSink(str(tmp_path / "tt"), keys=("conv_id", "turn_idx"))
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    sink.foreach_batch(mk([("c1", 0, "user", "v1", "", None)]), 0)
    sink.foreach_batch(mk([("c1", 0, "user", "v2", "", None), ("c2", 0, "user", "w", "", None)]), 1)
    now = {(r.conv_id, r.turn_idx): r.text for r in sink.read_table(spark).collect()}
    past = {
        (r.conv_id, r.turn_idx): r.text
        for r in sink.read_table(spark, as_of_batch=0).collect()
    }
    assert now == {("c1", 0): "v2", ("c2", 0): "w"}
    assert past == {("c1", 0): "v1"}
