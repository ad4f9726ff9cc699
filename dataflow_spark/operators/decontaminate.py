"""Benchmark decontamination: drop training documents that share any
word n-gram with an evaluation/benchmark corpus.

Beyond the reference's operator inventory — the standard guard against
train/test contamination in large-scale pretraining pipelines (GPT-3
appendix C / PaLM-style 13-gram overlap; n is a lever because synthetic
test docs are short).

Scale design (100 TB corpus, benchmark side is eval sets — MBs, not TBs):

* the corpus side explodes to one row per n-gram position — map-side
  only, no shuffle until the aggregation;
* the benchmark n-gram set is DISTINCT'd and **broadcast**, so the
  overlap test is a broadcast semi/inner join against every corpus
  partition — the 100-TB side never shuffles on the join key;
* per-doc dedup of matched grams + the contaminated-doc aggregation
  shuffle only the MATCHED rows (tiny for a clean corpus);
* n-grams are joined as strings here (exactness + DuckDB-oracle parity
  at test scale); at petabyte scale hash both sides to xxhash64 first —
  semantics identical modulo an astronomically unlikely collision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngrams(df: DataFrame, text_col: str, n: int, out: str) -> DataFrame:
    """One row per word n-gram (lowercased, whitespace-tokenized)."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    df = df.withColumn("__toks", toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("__toks") - n),
        lambda i: F.concat_ws(" ", F.slice("__toks", i + 1, n)),
    )
    return (
        df.filter(F.size("__toks") >= n)
        .select("*", F.explode(grams).alias(out))
        .drop("__toks")
    )


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """(id_col, n_shared_ngrams) for every corpus doc sharing >= 1 word
    n-gram with the benchmark; n_shared counts DISTINCT shared grams."""
    bench_grams = F.broadcast(
        _ngrams(benchmark.select(text_col), text_col, n, "__ng")
        .select("__ng")
        .distinct()
    )
    corpus_grams = _ngrams(corpus.select(id_col, text_col), text_col, n, "__ng")
    return (
        corpus_grams.join(bench_grams, "__ng")
        .groupBy(id_col)
        .agg(F.count_distinct("__ng").alias("n_shared_ngrams"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Corpus minus contaminated docs (left-anti on the broadcast-joined
    contamination set)."""
    hits = contaminated_docs(corpus, benchmark, text_col, id_col, n)
    return corpus.join(hits.select(id_col), id_col, "left_anti")


def crossdoc_ngram_overlap(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    round_to: int = 9,
) -> DataFrame:
    """Per-document cross-document n-gram duplication rate — the corpus
    audit statistic of the dedup literature (Lee et al. 2021 §5 reports
    corpora by the fraction of n-grams that recur): for each doc, the
    fraction of its n-gram POSITIONS whose gram also occurs in at least
    one OTHER document. Distinct from ``contaminated_docs`` (external
    benchmark) and from the dedup operators (which mutate the corpus) —
    this one measures, so you can quantify duplication before deciding
    how hard to dedup.

    Scale shape: explode positions map-side → one combinable
    count-distinct aggregate per gram (state is the gram vocabulary,
    not the corpus) → co-partitioned join of positions to gram
    doc-counts → per-doc ratio. Docs shorter than n have no n-grams and
    report NULL."""
    grams = _ngrams(corpus.select(id_col, text_col), text_col, n, "__ng")
    gdocs = grams.groupBy("__ng").agg(
        F.count_distinct(id_col).alias("__nd")
    )
    return (
        grams.join(gdocs, "__ng")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                round_to,
            ).alias("dup_gram_frac"),
        )
    )
