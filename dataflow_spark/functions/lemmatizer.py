"""Noun lemmatization — deterministic WordNet-morphy-style stand-in.

Reference: StemmingLemmatizationRefiner with method="lemmatization"
(general_text/refine/stemming_lemmatization_refiner.py:64-67) calls
NLTK ``WordNetLemmatizer().lemmatize(word)`` per whitespace token —
WordNet morphy noun rules + exception list + lexicon membership. The
lexicon is unavailable here, so the engine pins: the morphy noun suffix
substitutions applied in a fixed priority order, a pinned irregular-plural
exception table, and a guard that only all-lowercase ASCII-alphabetic
tokens are touched. Deltas vs NLTK (no lexicon check — e.g. 'gives' is
left to the final -s rule) are documented in COVERAGE.md.

All three implementations (pandas kernel, Catalyst expression, DuckDB
oracle SQL) are generated from the SAME tables below.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# irregular plurals (WordNet noun.exc subset, pinned)
LEMMA_EXCEPTIONS: dict[str, str] = {
    "children": "child", "feet": "foot", "geese": "goose", "mice": "mouse",
    "teeth": "tooth", "women": "woman", "men": "man", "oxen": "ox",
    "wives": "wife", "knives": "knife", "lives": "life", "leaves": "leaf",
    "wolves": "wolf", "halves": "half", "selves": "self", "elves": "elf",
    "loaves": "loaf", "thieves": "thief", "shelves": "shelf",
    "criteria": "criterion", "phenomena": "phenomenon", "indices": "index",
    "matrices": "matrix", "vertices": "vertex", "analyses": "analysis",
    "crises": "crisis", "theses": "thesis", "hypotheses": "hypothesis",
    "data": "datum",
}

_ALPHA = re.compile(r"^[a-z]+$", re.ASCII)


def lemmatize_word(w: str) -> str:
    """morphy noun substitutions in pinned priority order."""
    if not _ALPHA.match(w):
        return w
    if w in LEMMA_EXCEPTIONS:
        return LEMMA_EXCEPTIONS[w]
    if len(w) >= 5 and w.endswith("ies"):
        return w[:-3] + "y"
    if w.endswith(("ches", "shes", "ses", "xes", "zes")):
        return w[:-2]
    if w.endswith("men"):
        return w[:-3] + "man"
    if (
        len(w) >= 4
        and w.endswith("s")
        and not w.endswith(("ss", "us", "is"))
    ):
        return w[:-1]
    return w


def lemmatize_text(t: str) -> str:
    """Reference shape: per-token lemmatize, single-space rejoin."""
    return " ".join(lemmatize_word(w) for w in t.split())


def kernel(s: pd.Series) -> pd.Series:
    return s.map(lemmatize_text, na_action="ignore")


def _lemma_word_col(w: Column) -> Column:
    ln = F.length(w)
    exc = F.create_map(
        *[F.lit(x) for kv in LEMMA_EXCEPTIONS.items() for x in kv]
    )
    return (
        F.when(~w.rlike("^[a-z]+$"), w)
        .when(F.element_at(exc, w).isNotNull(), F.element_at(exc, w))
        .when(w.rlike(".{2}ies$"), F.concat(F.substring(w, 1, ln - 3), F.lit("y")))
        .when(w.rlike("(ches|shes|ses|xes|zes)$"), F.substring(w, 1, ln - 2))
        .when(w.rlike("men$"), F.concat(F.substring(w, 1, ln - 3), F.lit("man")))
        .when(
            w.rlike(".{3}s$") & ~w.rlike("(ss|us|is)$"),
            F.substring(w, 1, ln - 1),
        )
        .otherwise(w)
    )


def native(c: Column) -> Column:
    toks = F.filter(F.split(c, r"\s+"), lambda x: x != "")
    return F.array_join(F.transform(toks, _lemma_word_col), " ")


def oracle_sql_expr(col: str = "text") -> str:
    """DuckDB expression mirroring ``native`` exactly (same rule order)."""
    exc_cases = " ".join(
        f"WHEN w = '{k}' THEN '{v}'" for k, v in LEMMA_EXCEPTIONS.items()
    )
    word_case = f"""CASE
        WHEN NOT regexp_matches(w, '^[a-z]+$') THEN w
        {exc_cases}
        WHEN regexp_matches(w, '.{{2}}ies$') THEN substr(w, 1, len(w) - 3) || 'y'
        WHEN regexp_matches(w, '(ches|shes|ses|xes|zes)$') THEN substr(w, 1, len(w) - 2)
        WHEN regexp_matches(w, 'men$') THEN substr(w, 1, len(w) - 3) || 'man'
        WHEN regexp_matches(w, '.{{3}}s$') AND NOT regexp_matches(w, '(ss|us|is)$')
             THEN substr(w, 1, len(w) - 1)
        ELSE w END"""
    return (
        f"array_to_string(list_transform(list_filter("
        f"regexp_split_to_array({col}, '\\s+'), x -> x <> ''), "
        f"w -> {word_case}), ' ')"
    )
