"""Dedup semantics: distributed first-wins must equal the reference's
sequential first-occurrence-wins scans exactly."""

from pyspark.sql import functions as F

from dataflow_spark.operators import dedup as D
from tests import reference_kernels as RK


def _kept_rids(df):
    return sorted(r.rid for r in df.select("rid").collect())


def _expected(pdf, keep_mask):
    import pandas as pd

    return sorted(pdf[pd.Series(keep_mask).values]["rid"].tolist())


def test_exact_md5(corpus_df, corpus_pdf):
    got = _kept_rids(D.dedup_exact(corpus_df, ["text"], "rid", algo="md5"))
    assert got == _expected(corpus_pdf, RK.hash_dedup_keep(corpus_pdf["text"].tolist()))


def test_exact_ccnet_sha1(corpus_df, corpus_pdf):
    got = _kept_rids(D.dedup_exact(corpus_df, ["text"], "rid", algo="ccnet"))
    assert got == _expected(corpus_pdf, RK.ccnet_dedup_keep(corpus_pdf["text"].tolist()))


def test_minhash_first_wins(corpus_df, corpus_pdf):
    got = _kept_rids(D.dedup_minhash(corpus_df, "rid"))
    expected = _expected(corpus_pdf, RK.minhash_dedup_keep(corpus_pdf["text"].tolist()))
    assert got == expected


def test_minhash_drops_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    rows = [
        (0, base),
        (1, base + "extra tail"),  # near-dup of 0
        (2, "completely different content about spark streaming engines " * 4),
    ]
    df = spark.createDataFrame(rows, "rid long, text string")
    kept = _kept_rids(D.dedup_minhash(df, "rid"))
    assert 0 in kept and 2 in kept and 1 not in kept


def test_simhash_transitive_chain(spark):
    # A~B, B~C but A!~C must keep A and C (greedy first-wins re-keeps C)
    a = "alpha beta gamma delta epsilon zeta eta theta " * 6
    b = a.replace("zeta", "zetaX")
    rows = [(0, a), (1, b), (2, a.upper() + " tail tail tail")]
    df = spark.createDataFrame(rows, "rid long, text string")
    kept = _kept_rids(D.dedup_simhash(df, "rid", max_hamming=6))
    assert 0 in kept


def test_ngram_chunks(spark):
    t1 = "0123456789" * 10
    t2 = t1[:80] + "XXXXXXXXXXXXXXXXXXXX"  # shares 4/5 chunks
    rows = [(0, t1), (1, t2), (2, "zzz " * 30)]
    df = spark.createDataFrame(rows, "rid long, text string")
    kept = _kept_rids(D.dedup_ngram_chunks(df, "rid", n_chunks=5, diff_size=2))
    assert kept == [0, 2]


def test_ngram_jaccard_verifies(spark):
    base = "the quick brown fox jumps over the lazy dog again " * 6
    rows = [
        (0, base),
        (1, base + "tail"),  # true near-dup (high Jaccard)
        # shares vocabulary (band collisions possible) but low exact Jaccard
        (2, "the quick dog over fox lazy brown jumps " + "zig zag " * 40),
        (3, "completely different text about streaming state stores " * 4),
    ]
    df = spark.createDataFrame(rows, "rid long, text string")
    kept = _kept_rids(D.dedup_ngram_jaccard(df, "rid", threshold=0.8))
    assert 0 in kept and 1 not in kept and 2 in kept and 3 in kept


def test_embedding_cosine(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    base = rng.normal(size=16)
    rows = [
        (0, base.tolist()),
        (1, (base + rng.normal(scale=0.01, size=16)).tolist()),  # dup of 0
        (2, rng.normal(size=16).tolist()),
    ]
    df = spark.createDataFrame(rows, "rid long, embedding array<double>")
    kept = sorted(
        r.rid
        for r in D.dedup_embedding_cosine(df, "rid", vec_col="embedding", threshold=0.95)
        .select("rid")
        .collect()
    )
    assert kept == [0, 2]


def test_first_wins_respects_order_not_partitioning(spark, corpus_pdf):
    """Same result regardless of input partitioning — order key decides."""
    df1 = spark.createDataFrame(corpus_pdf).repartition(1)
    df16 = spark.createDataFrame(corpus_pdf).repartition(16, "role")
    assert _kept_rids(D.dedup_minhash(df1, "rid")) == _kept_rids(
        D.dedup_minhash(df16, "rid")
    )
