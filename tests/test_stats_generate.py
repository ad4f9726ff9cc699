"""Text-stats bundle, generator stand-ins, Vendi diversity."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataflow_spark.functions.stats import text_stats_struct
from dataflow_spark.operators.generate import (
    pretrain_format_converter,
    prompted_template,
    vendi_score,
)


def test_text_stats_known_values(spark):
    df = spark.createDataFrame(
        [(0, "The cat sat. The dog ran!")], "doc_id long, text string"
    )
    row = df.select(text_stats_struct(F.col("text")).alias("s")).first()["s"]
    assert row["n_words"] == 6
    assert row["n_sentences"] == 2
    assert row["avg_sentence_len"] == pytest.approx(3.0)
    assert row["n_chars"] == 25
    assert -100 <= row["flesch_reading_ease"] <= 206.835


def test_text_stats_empty(spark):
    df = spark.createDataFrame([(0, "")], "doc_id long, text string")
    row = df.select(text_stats_struct(F.col("text")).alias("s")).first()["s"]
    assert row["n_words"] == 0 and row["avg_word_len"] == 0.0


def test_prompted_template(spark):
    df = spark.createDataFrame([(0, "hello", "en")], "doc_id long, text string, lang string")
    out = prompted_template(df, "Summarize [{lang}]: {text}").first()["generated"]
    assert out == "Summarize [en]: hello"


def test_pretrain_format(spark):
    df = spark.createDataFrame([(7, "abc")], "doc_id long, text string")
    r = pretrain_format_converter(df).first()
    assert (r.id, r.content, r.content_len, r.format) == (7, "abc", 3, "pretrain")


def test_vendi_score_bounds(spark):
    # identical vectors → diversity ~1; orthogonal basis → ~dim
    n, d = 64, 8
    same = spark.createDataFrame(
        pd.DataFrame({"embedding": [list(np.ones(d))] * n})
    )
    assert vendi_score(same) == pytest.approx(1.0, abs=1e-6)
    eye = spark.createDataFrame(
        pd.DataFrame({"embedding": [list(np.eye(d)[i % d]) for i in range(n)]})
    )
    assert vendi_score(eye) == pytest.approx(d, abs=1e-6)


def test_bertscore_and_task2vec(spark):
    import numpy as np

    from dataflow_spark.functions.eval_scorers import (
        _token_embedding_matrix,
        bertscore,
        bertscore_udf,
        task2vec_diversity,
    )
    from pyspark.sql import functions as F

    # identical strings score 1.0 on all three components
    p, r, f = bertscore("the quick fox", "the quick fox")
    assert abs(p - 1) < 1e-9 and abs(r - 1) < 1e-9 and abs(f - 1) < 1e-9
    # disjoint vocab scores low
    _, _, f2 = bertscore("alpha beta gamma", "delta epsilon zeta")
    assert f2 < 0.5
    # Spark UDF == plain python
    df = spark.createDataFrame(
        [(0, "the quick fox", "the quick brown fox")], "i long, c string, r string"
    )
    got = df.select(bertscore_udf()(F.col("c"), F.col("r")).alias("s")).first().s
    exp = bertscore("the quick fox", "the quick brown fox")
    assert abs(got.f1 - exp[2]) < 1e-9

    # diversity: closed form equals explicit pairwise mean on a small set
    texts = ["aa bb cc", "aa bb cc", "xx yy zz", "mm nn oo pp", "aa xx mm"]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    got_div = task2vec_diversity(sdf).first()
    vecs = []
    for t in texts:
        m = _token_embedding_matrix(t.split())
        u = m.mean(axis=0)
        vecs.append(u / np.linalg.norm(u))
    n = len(vecs)
    pair = np.mean([1 - vecs[i] @ vecs[j] for i in range(n) for j in range(n) if i != j])
    assert got_div.n_docs == n
    assert abs(got_div.diversity - round(pair, 6)) < 1e-5


def test_quality_signals_fused_single_pass(spark):
    """The eleven-signal bundle must stay ONE parquet/relation scan with
    ZERO shuffles and no Python — the whole point of fusing — and each
    member signal must equal its standalone operator's value."""
    from dataflow_spark.functions.scorers import (
        lang_id_native,
        ngram_score_native,
        quality_score_native,
    )
    from dataflow_spark.functions.stats import quality_signals_exprs

    rows = [
        (0, "The quick brown fox jumps over the lazy dog near the old barn."),
        (1, "aa aa aa aa aa aa"),
        (2, ""),
        (3, "# # # ... some symbols … here and the rest of the words"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = quality_signals_exprs(F.col("text"))
    out = df.select("doc_id", *[c.alias(k) for k, c in sig.items()])

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan

    got = {r["doc_id"]: r for r in out.collect()}
    ref = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            lang_id_native(F.col("text")).alias("lang_pred"),
            F.round(ngram_score_native(F.col("text")), 9).alias("ngram_score"),
            F.round(quality_score_native(F.col("text")), 9).alias("quality"),
        ).collect()
    }
    for i in got:
        for k in ("lang_pred", "ngram_score", "quality"):
            assert got[i][k] == ref[i][k], (i, k)
    assert got[2]["n_words"] == 0 and got[2]["mean_word_len"] is None
    assert got[4]["n_chars"] == 0
