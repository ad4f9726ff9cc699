"""Streaming dedup: incremental first-wins must equal the global
sequential scan; exact dedup state is watermark-scoped."""

import numpy as np
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
