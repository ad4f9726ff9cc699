"""Shared Catalyst expression helpers."""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def member_map(words: Iterable[str]) -> Column:
    """Literal map for O(1) set-membership tests inside lambdas.

    ``array_contains`` over a literal array is an O(n) scan per probe —
    for a 142-word stopword list probed once per token that dominates the
    tokenizer itself. A map literal probes in O(1) via hash lookup."""
    pairs: list[Column] = []
    for w in sorted(set(words)):
        pairs.append(F.lit(w))
        pairs.append(F.lit(True))
    return F.create_map(*pairs)


def is_member(m: Column, key: Column) -> Column:
    return F.map_contains_key(m, key)
