"""Corpus-trained BPE tokenizer: the Catalyst string-replace formulation
must learn the SAME merge table and produce the SAME token counts as the
sequential dict-loop trainer/encoder (reference_kernels.bpe_*) —
including multibyte text and tie-break order."""

import pandas as pd
import pyspark.sql.functions as F

from dataflow_spark.operators import bpe as B
from tests import reference_kernels as RK

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the the the lowest lower low",
    "internationalization and internationalism",
    "tokenizer tokenizes tokens into token pieces",
    "  leading and trailing   whitespace  ",
    "",
    None,
    "punct, punct! punct? (punct)",
    "日本語テキストの分かち書きテスト 日本語の形態素",
    "mixed 日本語 and english words",
    "aaaa aaab aaba abaa baaa",
]


def _df(spark):
    pdf = pd.DataFrame({"text": CORPUS})
    return spark.createDataFrame(pdf)


def test_bpe_training_matches_sequential(spark):
    merges = B.train_bpe(_df(spark), "text", n_merges=10)
    expected = RK.bpe_train([t for t in CORPUS], n_merges=10)
    assert merges == expected
    assert len(merges) == 10


def test_bpe_counts_match_sequential(spark):
    merges = B.train_bpe(_df(spark), "text", n_merges=10)
    got = (
        _df(spark)
        .select(B.bpe_token_count("text", merges).alias("n"))
        .toPandas()["n"]
        .tolist()
    )
    expected = [RK.bpe_count(t, merges) for t in CORPUS]
    assert got == expected
    # the trained tokenizer actually compresses: counts are below the
    # char count and above the word count for real sentences
    n_words = len(CORPUS[0].split())
    assert n_words <= got[0] < len(CORPUS[0].replace(" ", ""))


def test_bpe_tokens_roundtrip(spark):
    merges = B.train_bpe(_df(spark), "text", n_merges=8)
    rows = (
        _df(spark)
        .select(
            "text", B.bpe_tokens("text", merges).alias("toks"),
            B.bpe_token_count("text", merges).alias("n"),
        )
        .collect()
    )
    for r in rows:
        assert len(r["toks"]) == r["n"]
        # concatenating tokens reproduces the whitespace-normalized text
        joined = "".join(r["toks"])
        norm = "".join((r["text"] or "").split())
        assert joined == norm


def test_bpe_merge_zero_and_empty(spark):
    # no merges -> every char is a token (word-split only)
    got = (
        _df(spark).select(B.bpe_token_count("text", []).alias("n")).toPandas()["n"]
    ).tolist()
    expected = [RK.bpe_count(t, []) for t in CORPUS]
    assert got == expected
    assert got[5] == 0 and got[6] == 0  # empty and NULL


def test_bpe_sample_fraction_trains_on_subset(spark):
    full = B.train_bpe(_df(spark), "text", n_merges=5)
    sampled = B.train_bpe(_df(spark), "text", n_merges=5, sample_fraction=0.5)
    assert len(sampled) <= 5
    assert sampled != [] and full != []


def test_estimated_token_count_fallback(spark):
    got = (
        _df(spark)
        .select(B.estimated_token_count("text").alias("n"))
        .toPandas()["n"]
        .tolist()
    )
    for t, n in zip(CORPUS, got):
        if t is None:
            assert pd.isna(n)
        else:
            assert n == -(-len(t) // 4)
