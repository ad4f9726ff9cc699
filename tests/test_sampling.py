"""Deterministic sampling/quota operators: reproducibility, statistics,
composability, and exact quota semantics."""

import pandas as pd
from pyspark.sql import functions as F

from dataflow_spark.operators.sampling import (
    cap_per_key,
    sample_hash_fraction,
    stratified_sample_n,
)


def _docs(spark, n=2000):
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "source": [f"src{i % 7}" for i in range(n)],
            "text": [f"document number {i}" for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf)


def test_hash_fraction_is_deterministic_and_unbiased(spark):
    df = _docs(spark)
    s1 = {r.doc_id for r in sample_hash_fraction(df, ["doc_id"], 0.3, seed=1).collect()}
    s2 = {r.doc_id for r in sample_hash_fraction(df, ["doc_id"], 0.3, seed=1).collect()}
    assert s1 == s2  # pure function of the data
    assert 0.25 < len(s1) / 2000 < 0.35  # md5-uniform hits the rate
    # different seed ⇒ essentially independent draw
    s3 = {r.doc_id for r in sample_hash_fraction(df, ["doc_id"], 0.3, seed=2).collect()}
    overlap = len(s1 & s3) / len(s1)
    assert 0.15 < overlap < 0.45  # ~30% expected under independence
    # composability: 0.3-sample then 0.5-sample (new seed) ≈ 0.15-sample
    nested = sample_hash_fraction(
        sample_hash_fraction(df, ["doc_id"], 0.3, seed=1), ["doc_id"], 0.5, seed=9
    ).count()
    assert 0.10 < nested / 2000 < 0.20


def test_stratified_sample_exact_quota(spark):
    df = _docs(spark)
    out = stratified_sample_n(df, ["source"], ["doc_id"], n=25, seed=3).toPandas()
    counts = out.groupby("source").size()
    assert (counts == 25).all()  # every stratum is large enough here
    # small stratum yields all its rows, never more
    small = df.filter((F.col("source") == "src0") & (F.col("doc_id") < 70))
    out2 = stratified_sample_n(small, ["source"], ["doc_id"], n=25, seed=3)
    assert out2.count() == 10  # src0 has doc_id % 7 == 0 below 70 → 10 rows
    # deterministic pick
    a = sorted(r.doc_id for r in stratified_sample_n(df, ["source"], ["doc_id"], 25, 3).collect())
    b = sorted(r.doc_id for r in stratified_sample_n(df, ["source"], ["doc_id"], 25, 3).collect())
    assert a == b


def test_cap_per_key_keeps_earliest(spark):
    df = _docs(spark)
    out = cap_per_key(df, ["source"], quota=12, order_col="doc_id").toPandas()
    assert (out.groupby("source").size() == 12).all()
    # the kept rows are exactly the lowest doc_ids of each source
    for src, grp in out.groupby("source"):
        i = int(src.replace("src", ""))
        expected = [i + 7 * j for j in range(12)]
        assert sorted(grp.doc_id) == expected


def test_assign_hash_splits_properties(spark):
    """Split shares land near targets, assignment is a pure function of
    the key (repartition- and subset-invariant), and bands are exhaustive."""
    from collections import Counter

    from dataflow_spark.operators.sampling import assign_hash_splits

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    out = assign_hash_splits(
        df, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}, seed=9
    ).collect()
    shares = Counter(r["split"] for r in out)
    assert abs(shares["train"] / 5000 - 0.8) < 0.03
    assert abs(shares["val"] / 5000 - 0.1) < 0.02
    assert abs(shares["test"] / 5000 - 0.1) < 0.02

    base = {r["doc_id"]: r["split"] for r in out}
    re_out = assign_hash_splits(
        df.repartition(13), ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=9,
    ).collect()
    assert {r["doc_id"]: r["split"] for r in re_out} == base
    # a grown corpus leaves old rows' splits untouched
    sub = assign_hash_splits(
        df.filter("doc_id < 1000"), ["doc_id"],
        {"train": 0.8, "val": 0.1, "test": 0.1}, seed=9,
    ).collect()
    assert all(base[r["doc_id"]] == r["split"] for r in sub)
