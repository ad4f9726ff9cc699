"""Per-row text-statistics bundle — LangkitScorer's deterministic core.

Reference: LangkitScorer (eval/statistics/langkit_scorer.py:41-61) returns
a dict of readability/sentence statistics per row. The model-backed pieces
(sentiment, toxicity) are out of deterministic scope; the statistics are
re-expressed as one native struct column:

* n_chars, n_words, n_sentences
* avg_word_len      = letters / words
* avg_sentence_len  = words / sentences
* flesch_reading_ease (syllable count approximated as vowel groups —
  the classic heuristic; pinned engine semantics)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dataflow_spark.functions.text import SENTENCE_REGEX


def text_stats_struct(c: Column) -> Column:
    cc = F.coalesce(c, F.lit(""))
    toks = F.filter(F.split(F.trim(cc), r"\s+"), lambda x: x != "")
    n_words = F.size(toks)
    n_chars = F.length(cc)
    n_sent = F.greatest(F.regexp_count(cc, F.lit(SENTENCE_REGEX)), F.lit(1))
    letters = F.length(F.regexp_replace(cc, r"[^A-Za-z]", ""))
    # syllables ≈ vowel groups per word (min 1 per word with letters)
    vowel_groups = F.regexp_count(F.lower(cc), F.lit("[aeiouy]+"))
    syllables = F.greatest(vowel_groups, n_words)
    wz = F.when(n_words > 0, n_words.cast("double"))
    flesch = (
        F.lit(206.835)
        - 1.015 * (n_words.cast("double") / n_sent)
        - 84.6 * (syllables.cast("double") / wz)
    )
    return F.struct(
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        F.round(F.when(n_words > 0, letters.cast("double") / wz).otherwise(0.0), 9).alias(
            "avg_word_len"
        ),
        F.round(n_words.cast("double") / n_sent, 9).alias("avg_sentence_len"),
        F.round(F.when(n_words > 0, flesch).otherwise(F.lit(206.835)), 9).alias(
            "flesch_reading_ease"
        ),
    )


def quality_signals_exprs(c: Column) -> dict[str, Column]:
    """Dolma/RedPajama-style per-document quality-signal bundle, fused
    into ONE projection over ONE scan.

    Each signal reuses the already-oracled native expression of its
    standalone operator (filters.FILTERS metrics, scorers natives), so
    the bundle inherits their pinned semantics. The point is the scan
    count: a curation pass that computes these eleven signals as eleven
    queries reads the corpus eleven times; this bundle reads it once —
    Catalyst's subexpression elimination and whole-stage codegen share
    the repeated tokenizations inside a single Project over a single
    parquet scan (no shuffle, no Python). At 100 TB that is the
    difference between one pass over the data and eleven."""
    from dataflow_spark.functions.filters import FILTERS
    from dataflow_spark.functions.scorers import (
        fingerprint_md5_native,
        lang_id_native,
        ngram_score_native,
        quality_score_native,
    )

    fm = lambda name: FILTERS[name].native(c)[0]  # noqa: E731
    r9 = lambda col: F.round(col, 9)  # noqa: E731
    return {
        "n_words": fm("word_number").cast("long"),
        "n_chars": F.length(F.coalesce(c, F.lit(""))).cast("long"),
        "mean_word_len": r9(fm("mean_word_length")),
        "unique_word_ratio": r9(fm("unique_words")),
        "alpha_word_ratio": r9(fm("alpha_words")),
        "symbol_word_ratio": r9(fm("symbol_word_ratio")),
        "stopword_ratio": r9(fm("stop_word")),
        "lang_pred": lang_id_native(c),
        "ngram_score": r9(ngram_score_native(c)),
        "quality": r9(quality_score_native(c)),
        "fp": fingerprint_md5_native(c),
    }
