"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship PT-filter chain (the reference's
text_pt_filter.py:65-161 pipeline shape re-expressed as one Catalyst plan:
refine×3 → exact dedup → MinHash-LSH near-dedup → heuristic filters →
quality score) on /root/testdata/sf0.001.

``queries()`` / ``oracle_sql()`` cover every implemented operator from
SURVEY.md §2 plus the training-data ops (dedup families, ANN, text
analysis, windows/assembly/join). See dataflow_spark/entry_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from dataflow_spark.functions.filters import apply_filters
    from dataflow_spark.functions.refiners import apply_refiners
    from dataflow_spark.functions.scorers import ngram_score_native, quality_score_native
    from dataflow_spark.operators.dedup import dedup_exact, dedup_minhash

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    refined = apply_refiners(
        docs, ["remove_extra_spaces", "remove_emoji", "remove_html_url"]
    )
    deduped = dedup_minhash(dedup_exact(refined, ["text"], "doc_id"), "doc_id")
    filtered = apply_filters(
        deduped,
        [
            "content_null", "word_number", "mean_word_length", "alpha_words",
            "unique_words", "lorem_ipsum", "curly_bracket", "watermark",
        ],
    )
    return filtered.select(
        "doc_id", "lang", "source", "text",
        F.round(ngram_score_native(F.col("text")), 6).alias("ngram_score"),
        F.round(quality_score_native(F.col("text")), 6).alias("quality"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dataflow_spark.entry_queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from dataflow_spark.entry_queries import build_oracles

    return build_oracles()
