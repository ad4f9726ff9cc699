"""Neutral serialized rule tables (r5 VERDICT ask #5).

Shared regex rule tables live here as JSON — a form with no
Python-specific escaping — and every consumer PARSES the file itself:
the engine builds its compiled-Python / Catalyst expressions from one
parse, the DuckDB oracle builds its chained ``regexp_replace`` SQL from
another, and neither imports the other's constructed object. A
transcription or escaping slip on either side therefore surfaces as an
oracle value mismatch instead of propagating silently through a shared
constant.

Conventions inside the JSON (documented, engine-neutral):

* patterns are RE2-compatible and Java-regex-compatible as written
  (ASCII classes, no backreferences, inline ``(?is)`` flags allowed);
* replacements use backslash group syntax (``\\1``) — Python ``re.sub``
  and DuckDB ``regexp_replace`` take it as-is; the Catalyst builder
  rewrites to ``$1``.
"""

from __future__ import annotations

import json
import os

_DIR = os.path.dirname(__file__)


def load_rule_table(name: str) -> list[tuple[str, str]]:
    """Parse a ``[[pattern, replacement], ...]`` JSON rule table."""
    with open(os.path.join(_DIR, name), encoding="utf-8") as f:
        rules = json.load(f)
    return [(p, r) for p, r in rules]


def rule_table_path(name: str) -> str:
    return os.path.join(_DIR, name)
