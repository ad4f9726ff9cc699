"""Shard packing + domain-mixture sampling (operators/packing.py)."""

from pyspark.sql import functions as F

from dataflow_spark.operators.packing import mixture_sample, pack_token_shards


def test_pack_token_shards_exact_prefix_sum(spark):
    rows = [(i, (i % 7) + 1) for i in range(1, 201)]  # ids 1..200
    df = spark.createDataFrame(rows, "doc_id long, n_tok int")
    out = pack_token_shards(df, "doc_id", "n_tok", shard_budget=25,
                            n_partitions=8).toPandas().sort_values("doc_id")
    # exact sequential replay
    cum, want_cum, want_shard = 0, [], []
    for _i, n in rows:
        want_shard.append(cum // 25)
        cum += n
        want_cum.append(cum)
    assert out.cum_tokens.tolist() == want_cum
    assert out.shard_id.tolist() == want_shard
    # partitioning-invariance: a different partition count, same answer
    out2 = pack_token_shards(df, "doc_id", "n_tok", shard_budget=25,
                             n_partitions=3).toPandas().sort_values("doc_id")
    assert out2.cum_tokens.tolist() == want_cum


def test_mixture_sample_rates_and_determinism(spark):
    rows = [(i, f"s{i % 4}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    shares = {"s0": 0.25, "s1": 0.25, "s2": 0.5}  # s3 absent -> dropped
    out = mixture_sample(df, "source", ["doc_id"], shares, seed=1).toPandas()
    assert set(out.source) <= {"s0", "s1", "s2"}
    # n_s = 500 each; T = min(500/.25, 500/.25, 500/.5) = 1000
    # -> rate s0/s1 = 0.5, s2 = 1.0 (kept whole)
    assert (out.source == "s2").sum() == 500
    got_s0 = (out.source == "s0").sum()
    assert 200 < got_s0 < 300  # Bernoulli(0.5) over 500
    out2 = mixture_sample(df, "source", ["doc_id"], shares, seed=1).toPandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)  # retry-stable


def test_curriculum_struct_order_key(spark):
    """pack_token_shards with a struct order key (the curriculum
    composition): cumsum follows (quality DESC, id) exactly, early
    shards see the higher-quality rows, and the assignment is
    partition-layout invariant."""
    from pyspark.sql import functions as F

    from dataflow_spark.operators.packing import pack_token_shards

    rows = [(i, float((i * 37) % 100) / 100.0, 10 + (i % 5)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, quality double, n_tok int")
    d = df.withColumn(
        "__ck", F.struct((-F.col("quality")).alias("nq"), F.col("doc_id"))
    )
    out = pack_token_shards(d, "__ck", "n_tok", shard_budget=500).collect()

    seq = sorted(out, key=lambda r: (-r["quality"], r["doc_id"]))
    run = 0
    for r in seq:
        run += r["n_tok"]
        assert r["cum_tokens"] == run
        assert r["shard_id"] == (r["cum_tokens"] - r["n_tok"]) // 500
    assert seq[0]["shard_id"] == 0

    re_out = pack_token_shards(
        d.repartition(11), "__ck", "n_tok", shard_budget=500
    ).collect()
    assert sorted((r["doc_id"], r["cum_tokens"], r["shard_id"]) for r in re_out) \
        == sorted((r["doc_id"], r["cum_tokens"], r["shard_id"]) for r in out)
