"""Deterministic reasoning-pipeline filters and judgers.

* ``answer_token_length_filter`` — AnswerTokenLengthFilter
  (reasoning/filter/answer_token_length_filter.py:11-46): the reference
  counts tokens with a pretrained Qwen tokenizer; the deterministic
  stand-in uses the engine's BPE estimate ``ceil(chars/4)`` — the same
  estimator ToKenInfo's twin uses — so the filter shape (keep iff
  token count <= max) is preserved with a pinned, oracle-able counter.
* ``answer_judger_math`` — AnswerJudger_MathVerify
  (reasoning/filter/answer_judger_mathverify.py:9-82): the reference
  calls math_verify's symbolic parse/verify; here a pinned deterministic
  SUBSET of that grammar is parsed natively — ``\\boxed{...}`` unwrap,
  ``$``/thousands-comma stripping, integers/decimals, ``a/b`` and
  ``\\frac{a}{b}`` rationals, ``x%`` percentages — and two answers match
  if both parse numerically and agree within a relative tolerance, else
  by case-insensitive string equality. Everything is regexp_extract +
  CASE, so the judger has an exact DuckDB oracle; the full symbolic
  grammar (sympy-class rewriting) is the documented seam.

All Catalyst-native — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def bpe_token_estimate(c: Column) -> Column:
    return F.ceil(F.length(F.coalesce(c, F.lit(""))).cast("double") / 4.0).cast("int")


def answer_token_length_filter(
    df: DataFrame, col: str, max_answer_token_length: int = 8192
) -> DataFrame:
    """Keep rows whose answer's estimated token count is within the cap
    (reference returns 1/0 per row then keeps the 1s)."""
    return df.filter(bpe_token_estimate(F.col(col)) <= max_answer_token_length)


_FRAC_TEX = r"^\\frac\{(-?\d+)\}\{(-?\d+)\}$"
_FRAC_SLASH = r"^(-?\d+)\s*/\s*(-?\d+)$"
_PERCENT = r"^(-?\d+(?:\.\d+)?)%$"
_NUMBER = r"^-?\d+(?:\.\d+)?$"


def math_answer_norm(c: Column) -> Column:
    """Normalized answer string: \\boxed{...} unwrapped, '$'/commas
    stripped, trailing period removed, trimmed."""
    s = F.coalesce(c, F.lit(""))
    boxed = F.regexp_extract(s, r"\\boxed\{([^}]*)\}", 1)
    s = F.when(boxed != "", boxed).otherwise(s)
    s = F.trim(F.regexp_replace(F.trim(s), r"[$,]", ""))
    return F.regexp_replace(s, r"\.$", "")


def math_answer_value(c: Column) -> Column:
    """Parsed numeric value (double) of a normalized answer, or NULL when
    the pinned grammar doesn't match (including zero-denominator
    fractions, which fall back to string comparison)."""
    s = math_answer_norm(c)
    tex_a = F.regexp_extract(s, _FRAC_TEX, 1)
    tex_b = F.regexp_extract(s, _FRAC_TEX, 2)
    sl_a = F.regexp_extract(s, _FRAC_SLASH, 1)
    sl_b = F.regexp_extract(s, _FRAC_SLASH, 2)
    pct = F.regexp_extract(s, _PERCENT, 1)
    # try_divide: ANSI mode makes plain '/' THROW on a zero denominator
    # (even for doubles); a/0 therefore parses to NULL and the judger
    # falls back to string comparison — deterministic in both engines
    return (
        F.when(tex_a != "", F.try_divide(tex_a.cast("double"), tex_b.cast("double")))
        .when(sl_a != "", F.try_divide(sl_a.cast("double"), sl_b.cast("double")))
        .when(pct != "", pct.cast("double") / F.lit(100.0))
        .when(s.rlike(_NUMBER), s.cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )


def math_answers_match(answer: Column, gt: Column, rel_tol: float = 1e-9) -> Column:
    """True iff both parse numerically and agree within ``rel_tol``
    (relative to max(1, |gt|)), else case-insensitive normalized-string
    equality — the verify(parse(a), parse(gt)) shape."""
    va, vg = math_answer_value(answer), math_answer_value(gt)
    num_ok = F.abs(va - vg) <= F.lit(rel_tol) * F.greatest(F.lit(1.0), F.abs(vg))
    str_ok = F.lower(math_answer_norm(answer)) == F.lower(math_answer_norm(gt))
    return F.when(va.isNotNull() & vg.isNotNull(), num_ok).otherwise(str_ok)


def answer_judger_math(
    df: DataFrame,
    answer_col: str,
    gt_col: str,
    result_col: str = "answer_match",
) -> DataFrame:
    """Adds the boolean verification column (the reference writes
    ``result_key`` rather than filtering)."""
    return df.withColumn(
        result_col, math_answers_match(F.col(answer_col), F.col(gt_col))
    )
