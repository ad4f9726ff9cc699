"""BM25 retrieval — inverted-index join, no per-row Python.

Reference: BM25HardNeg (rare/generate/bm25_hard_negative.py:85) retrieves
hard negatives with BM25. Engine re-expression: tokenize → explode to an
inverted index → idf from document frequencies → join query terms →
per-(query, doc) score aggregation → top-k window. Every step is a
DataFrame op; the index build is one shuffle keyed by term, the scoring
join broadcasts the (small) query-term side.

BM25 (Robertson/Okapi, k1=1.2, b=0.75):
  idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))
  score(q,d) = Σ_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*len_d/avg_len))
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _terms(df: DataFrame, id_col: str, text_col: str, out_id: str) -> DataFrame:
    toks = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda x: x != "",
    )
    return df.select(F.col(id_col).alias(out_id), F.explode(toks).alias("term"))


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "doc_id",
    query_id: str = "query_id",
    text_col: str = "text",
    query_text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = 6,
    gold_col: str | None = None,
) -> DataFrame:
    """BM25 top-k retrieval; with ``gold_col`` set (a column of
    ``queries`` naming each query's positive document id) the positive
    is excluded before ranking — the BM25HardNeg mining mode."""
    doc_terms = _terms(corpus, corpus_id, text_col, "doc_id")
    tf = doc_terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    doc_len = doc_terms.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n_docs = corpus.count()
    avg_len_row = doc_len.agg(F.avg("dl").alias("avg")).first()
    avg_len = float(avg_len_row["avg"] or 1.0)
    df_t = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_t.select(
        "term",
        F.log(1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias(
            "idf"
        ),
    )
    q_terms = (
        _terms(queries, query_id, query_text_col, "query_id")
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("qtf"))
    )
    scored = (
        tf.join(doc_len, "doc_id")
        .join(F.broadcast(idf), "term")
        .join(F.broadcast(q_terms), "term")
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avg_len))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("bm25"))
    )
    if gold_col is not None:
        # BM25HardNeg semantics (rare/generate/bm25_hard_negative.py:63-80):
        # the query's own positive document must never appear among its
        # mined negatives — drop it BEFORE ranking so top-k stays full
        golds = queries.select(
            F.col(query_id).alias("query_id"), F.col(gold_col).alias("__gold")
        )
        scored = (
            scored.join(F.broadcast(golds), "query_id")
            .filter(F.col("doc_id") != F.col("__gold"))
            .drop("__gold")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    out = (
        scored.withColumn("bm25", F.round("bm25", round_to) if round_to else F.col("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "bm25", "rank")
    )
    return out


def tfidf_top_terms(
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 9,
) -> DataFrame:
    """Per-document top-k salient terms by TF-IDF (idf = ln(N/df)) — the
    classic keyword-extraction / document-tagging primitive next to the
    BM25 machinery above. One token explode, two combinable count
    aggregates (term df is vocabulary-sized, never corpus-sized), a
    broadcast idf join back, and a per-doc top-k window (bounded by each
    document's distinct-term count, not the corpus). Ranking compares
    round-``round_to`` products of an exact integer tf and an
    IEEE-identical ln, term-ascending ties — deterministic across
    engines and layouts."""
    terms = _terms(corpus, id_col, text_col, "doc_id")
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = corpus.count()
    df_t = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_t.select(
        "term", F.log(F.lit(float(n_docs)) / F.col("df")).alias("idf")
    )
    scored = tf.join(F.broadcast(idf), "term").withColumn(
        "tfidf", F.round(F.col("tf") * F.col("idf"), round_to)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("doc_id").alias(id_col), "term", "tfidf", "rank")
    )
