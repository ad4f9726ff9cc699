"""Corpus-trained byte-pair-encoding token counter — the real statistic
behind the reference's tokenizer-based counters (ToKenInfo,
``eval/statistics/token_info.py``, and the reasoning
AnswerTokenLengthFilter, ``reasoning/filter/answer_token_length_filter.py``
— both call a HuggingFace ``AutoTokenizer``; no model weights exist in
this environment, so per the engine doctrine the tokenizer itself is
TRAINED on the corpus with exact-integer determinism instead of stubbed
with ``ceil(chars/4)``; the estimator survives as the documented
fallback).

The whole algorithm — training and encoding — runs as Catalyst string
expressions (whole-stage codegen, no Python anywhere):

* a word's symbol sequence is one STRING with U+001F (unit separator)
  between adjacent symbols: ``"hello"`` ⇒ ``"h␟e␟l␟l␟o"``;
* applying merge ``(a, b)`` is ``replace(w, 'a␟b', 'ab')`` — SQL
  ``replace`` substitutes leftmost-first non-overlapping occurrences,
  which is exactly the BPE greedy left-to-right merge scan (``"a␟a␟a"``
  + merge ``(a,a)`` ⇒ ``"aa␟a"``, never ``"a␟aa"``);
* encoding a document with k learned merges is k nested ``replace``
  calls over the document interspersed once, with U+001E (record
  separator) standing between words so no merge rule (learned from
  single words — rules can never contain RS/US) ever crosses a word
  boundary;
* ``token_count = #US + #RS + 1`` on the merged string (0 for empty).

Training is one word-frequency shuffle, then per merge step one
pair-count aggregation (map-side combinable) + a 1-row driver collect +
one codegen'd ``replace`` — k driver-coordinated jobs over the DISTINCT
word table (vocabulary-sized, not corpus-sized). At 100 TB the documented
lever is ``sample_fraction``: deterministic md5-arithmetic Bernoulli
sampling of documents (operators/sampling.py semantics) BEFORE word
counting, so training cost is bounded while counting stays exact over
the full corpus. Ties in pair counts break on the lexicographically
smallest separated pair string — byte-order comparison, identical in
Spark and DuckDB.

The DuckDB oracle (entry_queries._bpe_*) replays the ENTIRE training
loop — k unrolled pair-count CTEs with the same tie-break — plus the
nested-replace encoding, so the merge table is re-derived, not shared.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

US = "\x1f"  # symbol separator (unit separator)
RS = "\x1e"  # word-boundary marker (record separator)


def _strip_sentinels(c: Column) -> Column:
    # input text may contain the control chars we use as markers; they are
    # non-printing chars the reference pipeline strips anyway — delete
    # them up front so the representation is unambiguous
    return F.replace(F.replace(c, F.lit(US), F.lit("")), F.lit(RS), F.lit(""))


def _interspersed_words(df: DataFrame, text_col: str) -> DataFrame:
    """(w, cnt): distinct whitespace words of the corpus as ␟-interspersed
    symbol strings with their total occurrence counts."""
    words = (
        df.select(
            F.explode(
                F.split(F.trim(_strip_sentinels(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    return words.select(
        F.array_join(F.filter(F.split("word", ""), lambda ch: ch != ""), US).alias("w"),
        "cnt",
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 12,
    sample_fraction: float | None = None,
    sample_seed: str = "bpe",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` ordered BPE merges from the corpus.

    Deterministic: pair counts are exact integers; the argmax breaks ties
    on the smallest separated pair string. ``sample_fraction`` applies
    the deterministic md5-hash Bernoulli document sample before counting
    (the 100-TB training lever; counting with the learned table remains
    exact over everything)."""
    if sample_fraction is not None:
        from dataflow_spark.operators.sampling import sample_hash_fraction

        df = sample_hash_fraction(df, [text_col], sample_fraction, seed=sample_seed)
    state = _interspersed_words(df, text_col).persist()
    prev = None  # the previous generation, released one step late: the
    # top-pair collect below is what materializes the CURRENT generation's
    # cache, and until it runs the current plan still reads the previous
    # one — no extra count() jobs, no recompute chains
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            syms = F.split("w", US)
            # guard single-symbol words BEFORE sequence(): Spark's
            # sequence(1, 0) counts DOWN ([1, 0]) instead of returning
            # empty, and element_at(·, 0) throws under ANSI
            pairs = (
                state.filter(F.size(syms) >= 2)
                .select(
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(1), F.size(syms) - 1),
                            lambda i: F.concat_ws(
                                US, F.element_at(syms, i), F.element_at(syms, i + 1)
                            ),
                        )
                    ).alias("pair"),
                    "cnt",
                )
            )
            top = (
                pairs.groupBy("pair")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.col("n").desc(), F.col("pair").asc())
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break  # every word is a single token already
            a, b = top[0]["pair"].split(US)
            merges.append((a, b))
            nxt = state.select(
                F.replace(
                    F.col("w"), F.lit(a + US + b), F.lit(a + b)
                ).alias("w"),
                "cnt",
            ).persist()
            prev, state = state, nxt
    finally:
        state.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def bpe_segmented(text_col: str | Column, merges: list[tuple[str, str]]) -> Column:
    """The fully-merged separated string for a document: ␟ between tokens,
    ␞ between words — one nested-replace codegen expression."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.trim(_strip_sentinels(F.coalesce(c, F.lit(""))))
    # per-word interspersing, words joined by a BARE ␞ (no ␟ around it):
    # each ␟ or ␞ in the final string is exactly one inter-token gap
    c = F.array_join(
        F.transform(
            F.filter(F.split(c, r"\s+"), lambda w: w != ""),
            lambda w: F.array_join(
                F.filter(F.split(w, ""), lambda ch: ch != ""), US
            ),
        ),
        RS,
    )
    for a, b in merges:
        c = F.replace(c, F.lit(a + US + b), F.lit(a + b))
    return c


def bpe_token_count(text_col: str | Column, merges: list[tuple[str, str]]) -> Column:
    """int token count of a document under the learned merge table:
    ``#US + #RS + 1`` on the merged string (empty/whitespace-only ⇒ 0).

    The ␞ word boundary itself sits between two ␟-free contexts, so every
    boundary contributes exactly one inter-token gap — no merge rule can
    contain ␞ (rules come from single words)."""
    seg = bpe_segmented(text_col, merges)
    n_seps = F.length(seg) - F.length(
        F.replace(F.replace(seg, F.lit(US), F.lit("")), F.lit(RS), F.lit(""))
    )
    return F.when(F.length(seg) == 0, F.lit(0)).otherwise(n_seps + 1).cast("int")


def bpe_tokens(text_col: str | Column, merges: list[tuple[str, str]]) -> Column:
    """array<string> of the document's BPE tokens in order."""
    seg = bpe_segmented(text_col, merges)
    return F.filter(
        F.split(F.replace(seg, F.lit(RS), F.lit(US)), US), lambda t: t != ""
    )


def estimated_token_count(text_col: str | Column) -> Column:
    """The pre-r5 fallback estimator (``ceil(chars/4)``) — kept for
    pipelines that run before a tokenizer has been trained."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.ceil(F.length(c) / F.lit(4.0)).cast("int")
