"""Splitter, BM25, F1/BLEU, pipeline API."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataflow_spark.functions.eval_scorers import (
    bleu_udf,
    f1_native,
    f1_udf,
    sentence_bleu,
    token_f1,
)
from dataflow_spark.operators.retrieval import bm25_topk
from dataflow_spark.operators.splitter import split_chars, split_sentences, split_words
from dataflow_spark.pipeline import Pipeline


def test_split_chars_roundtrip(spark):
    text = "abcdefghij" * 30  # 300 chars
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = split_chars(df, chunk_size=100, overlap=10).orderBy("chunk_idx").collect()
    # step 90: chunks at 0, 90, 180, 270
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    assert out[0].chunk == text[:100]
    assert out[1].chunk == text[90:190]
    assert out[3].chunk == text[270:300]
    # overlap property: consecutive chunks share 10 chars
    assert out[0].chunk[-10:] == out[1].chunk[:10]


def test_split_words(spark):
    text = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = split_words(df, chunk_size=8, overlap=2).orderBy("chunk_idx").collect()
    assert out[0].chunk.split() == [f"w{i}" for i in range(8)]
    assert out[1].chunk.split() == [f"w{i}" for i in range(6, 14)]


def test_split_sentences_packs_whole_sentences(spark):
    text = "One two three. Four five six! Seven eight? " * 4
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = split_sentences(df, chunk_size=60).orderBy("chunk_idx").collect()
    assert len(out) > 1
    joined = "".join(r.chunk for r in out)
    # no sentence is split across chunks: rejoining loses only whitespace
    assert joined.replace(" ", "") == text.replace(" ", "")


def test_bm25_self_retrieval(spark):
    rows = [
        (0, "spark streaming engine with watermarks and state"),
        (1, "pandas dataframe batch processing in python"),
        (2, "iceberg table format with merge into support"),
        (3, "watermarks and state in streaming systems"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    queries = corpus.filter(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    out = bm25_topk(corpus, queries, k=2, query_id="query_id").orderBy("rank").collect()
    assert out[0].doc_id == 0  # exact self match first
    assert out[1].doc_id == 3  # shared 'watermarks and state'


def test_token_f1_known_values():
    assert token_f1("the cat sat", "the cat sat") == 1.0
    assert token_f1("cat", "dog") == 0.0
    assert token_f1("", "") == 1.0
    assert token_f1("a b", "") == 0.0
    # multiset: repeated token counted with multiplicity
    assert abs(token_f1("x x y", "x y y") - 2 * (2 / 3) * (2 / 3) / (4 / 3)) < 1e-12


def test_f1_native_matches_python(spark, corpus_pdf):
    pdf = corpus_pdf.head(200)
    pred = pdf["text"].fillna("").tolist()
    gold = pdf["text"].fillna("").iloc[::-1].tolist()
    df = spark.createDataFrame(
        list(zip(range(len(pred)), pred, gold)), "rid long, pred string, gold string"
    )
    got = (
        df.select("rid", f1_native(F.col("pred"), F.col("gold")).alias("f1"))
        .toPandas()
        .sort_values("rid")["f1"]
        .tolist()
    )
    expected = [token_f1(p, g) for p, g in zip(pred, gold)]
    assert np.allclose(got, expected, atol=1e-12)
    udf_got = (
        df.select("rid", f1_udf()(F.col("pred"), F.col("gold")).alias("f1"))
        .toPandas()
        .sort_values("rid")["f1"]
        .tolist()
    )
    assert np.allclose(udf_got, expected, atol=1e-12)


def test_bleu_properties(spark):
    assert sentence_bleu("the cat sat on the mat", "the cat sat on the mat") == pytest.approx(1.0)
    assert sentence_bleu("x y z", "a b c") == 0.0
    partial = sentence_bleu("the cat sat on a rug", "the cat sat on the mat")
    assert 0.0 < partial < 1.0
    df = spark.createDataFrame([(0, "a b c", "a b c")], "rid long, c string, r string")
    assert df.select(bleu_udf()(F.col("c"), F.col("r"))).first()[0] == pytest.approx(1.0)


def test_cider_ordering(spark):
    from dataflow_spark.functions.eval_scorers import cider_scores

    rows = [
        (0, "the cat sat on the mat", "the cat sat on the mat"),
        (1, "a dog ran in the park", "the cat sat on the mat quietly"),
        (2, "spark streams process data", "spark streams process data fast"),
        (3, "unrelated words here", "totally different reference text"),
    ]
    df = spark.createDataFrame(rows, "id long, cand string, ref string")
    out = {r.id: r.cider for r in cider_scores(df).collect()}
    assert out[0] > out[2] > out[3]
    assert out[1] < out[0]
    # exact values from an independent sequential replica of the CIDEr
    # formula (Counter-based tf-idf cosine, sigma=6 length gaussian) —
    # ordinal-only checks missed a slice-length bug that zeroed most dots
    assert out[0] == 10.0
    assert out[1] == pytest.approx(1.423467, abs=1e-6)
    assert out[2] == pytest.approx(8.096898, abs=1e-6)
    assert out[3] == 0.0


def test_pipeline_compile_catches_missing_key():
    pipe = Pipeline(initial_keys=["doc_id"]).refine("lowercase")  # needs 'text'
    with pytest.raises(KeyError, match="refine:lowercase.*text"):
        pipe.compile()


def test_pipeline_runs_chain(spark):
    df = spark.createDataFrame(
        [(0, "  Hello   WORLD  " + "w " * 30), (1, "dup " * 25), (2, "dup " * 25)],
        "doc_id long, text string",
    )
    pipe = (
        Pipeline(initial_keys=["doc_id", "text"])
        .refine("remove_extra_spaces")
        .refine("lowercase")
        .dedup_exact(["text"], "doc_id")
        .filter("word_number")
        .compile()
    )
    out = pipe.run(df).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [0, 1]  # 2 deduped away
    assert out[0].text.startswith("hello world")
    assert "step 2: dedup:exact:md5" in pipe.explain()


def test_hist_quantiles_close_to_exact(spark):
    """Binned histogram quantiles land within one bin width (1/B) of the
    exact order statistic, and the quantile vector is monotone."""
    import numpy as np
    from pyspark.sql import functions as F

    from dataflow_spark.entry_queries import _HIST_B

    rng = np.random.RandomState(11)
    vals = np.clip(rng.beta(2.0, 5.0, size=4000), 0, 1).round(9)
    df = spark.createDataFrame(
        [(float(v), "g") for v in vals], "qs double, lang string"
    )
    bins = df.select(
        "lang",
        F.least(F.lit(_HIST_B - 1), F.floor(F.col("qs") * _HIST_B))
        .cast("long").alias("bin"),
    )
    from pyspark.sql.window import Window

    hist = bins.groupBy("lang", "bin").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "total", F.sum("c").over(Window.partitionBy("lang"))
    )
    edge = (F.col("bin") + 1).cast("double") / _HIST_B
    row = cum.groupBy("lang").agg(
        *[
            F.min(
                F.when(F.col("cum") >= F.ceil(F.lit(p) * F.col("total")), edge)
            ).alias(f"p{int(p*100)}")
            for p in (0.25, 0.5, 0.75, 0.9)
        ]
    ).first()
    got = [row[f"p{int(p*100)}"] for p in (0.25, 0.5, 0.75, 0.9)]
    exact = [float(np.quantile(vals, p, method="inverted_cdf")) for p in (0.25, 0.5, 0.75, 0.9)]
    for g, e in zip(got, exact):
        assert abs(g - e) <= 1.0 / _HIST_B + 1e-12, (g, e)
    assert got == sorted(got)


def test_bm25_hard_negatives_excludes_gold(spark):
    """The mined negatives never contain the query's positive doc, ranks
    are dense from 1, and the negatives are exactly the best-scoring
    non-gold documents (cross-checked vs unrestricted top-k)."""
    from pyspark.sql import functions as F

    from dataflow_spark.operators.retrieval import bm25_topk

    rows = [(i, f"shared tokens alpha beta w{i % 4} w{(i * 3) % 7}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = docs.filter(F.col("doc_id") < 4).select(
        F.col("doc_id").alias("query_id"), "text", F.col("doc_id").alias("gold_id")
    )
    negs = bm25_topk(docs, queries, k=3, query_id="query_id", gold_col="gold_id").collect()
    full = bm25_topk(docs, queries, k=4, query_id="query_id").collect()

    by_q = {}
    for r in negs:
        assert r["doc_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    for q, lst in by_q.items():
        assert sorted(x[0] for x in lst) == [1, 2, 3]
        expect = [
            r["doc_id"] for r in sorted(
                (x for x in full if x["query_id"] == q),
                key=lambda x: x["rank"],
            ) if r["doc_id"] != q
        ][:3]
        assert [d for _, d in sorted(lst)] == expect
