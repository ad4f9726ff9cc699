"""Scorer parity and properties."""

import math

import numpy as np
from pyspark.sql import functions as F

from dataflow_spark.functions import scorers as S
from tests import reference_kernels as RK


def test_ngram_score_matches_reference(corpus_df, corpus_pdf):
    got = (
        corpus_df.select("rid", S.ngram_score_native(F.col("text")).alias("s"))
        .toPandas()
        .sort_values("rid")["s"]
        .tolist()
    )
    expected = RK.ngram_score(corpus_pdf["text"].tolist())
    assert np.allclose(got, expected, atol=1e-12)


def test_ngram_native_equals_kernel(corpus_df, corpus_pdf):
    native = (
        corpus_df.select("rid", S.ngram_score_native(F.col("text")).alias("s"))
        .toPandas()
        .sort_values("rid")["s"]
        .tolist()
    )
    kernel = S.ngram_score_kernel(corpus_pdf["text"]).tolist()
    assert np.allclose(native, kernel, atol=1e-12)


def test_mtld_known_values():
    # all-unique tokens → MTLD == token count (no factor completes)
    toks = [f"w{i}" for i in range(30)]
    assert RK is not None
    assert S.mtld(toks) == 30.0
    # heavy repetition → low MTLD
    rep = ["a", "b"] * 50
    assert S.mtld(rep) < 15


def test_hdd_bounds():
    toks = [f"w{i}" for i in range(100)]
    v = S.hdd(toks)
    assert 0.99 <= v <= 1.0 + 1e-9  # all-distinct sample → ~1 (FP sum)
    assert S.hdd(["a"] * 100) < 0.05


def test_lang_id(spark):
    rows = [
        (0, "the cat is on the mat and it is happy"),
        (1, "der hund ist nicht ein katze und das ist gut"),
        (2, "le chat est dans la maison et les oiseaux"),
        (3, "el perro es un animal y la casa es grande"),
        (4, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "rid long, text string")
    got = {r.rid: r.lang for r in df.select("rid", S.lang_id_native(F.col("text")).alias("lang")).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "unknown"}
    kern = S.lang_id_kernel(
        __import__("pandas").Series([r[1] for r in rows])
    ).tolist()
    assert kern == ["en", "de", "fr", "es", "unknown"]


def test_quality_score_range(corpus_df):
    stats = (
        corpus_df.select(S.quality_score_native(F.col("text")).alias("q"))
        .agg(F.min("q"), F.max("q"))
        .first()
    )
    assert 0.0 <= stats[0] and stats[1] <= 1.0


def test_fingerprint_md5_normalization(spark):
    rows = [(0, "Hello   World"), (1, "hello world"), (2, "different")]
    df = spark.createDataFrame(rows, "rid long, text string")
    fps = {r.rid: r.fp for r in df.select("rid", S.fingerprint_md5_native(F.col("text")).alias("fp")).collect()}
    assert fps[0] == fps[1] != fps[2]


def test_winnowing_properties(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "totally unrelated content z z z"),
    ]
    df = spark.createDataFrame(rows, "rid long, text string")
    out = {
        r.rid: r.f
        for r in df.select(
            "rid", S.winnowing_fingerprints_native(F.col("text")).alias("f")
        ).collect()
    }
    assert out[0] == out[1]  # deterministic
    assert out[0] != out[2]
    assert all(isinstance(x, int) for x in out[0]) and len(out[0]) > 0


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "a bb  ccc\tdddd")], "rid long, text string")
    e = S.token_count_exprs(F.col("text"))
    row = df.select(
        e["n_tokens_ws"].alias("w"), e["n_chars"].alias("c"), e["n_tokens_bpe_est"].alias("b")
    ).first()
    assert row.w == 4 and row.c == 14 and row.b == math.ceil(14 / 4)
