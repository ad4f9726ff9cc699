"""Shared text vocabulary and vectorized helpers.

The reference pulls stopwords/tokenizers from NLTK and emoji tables from a
third-party dict; those libraries are not available here, so the engine
pins its own lists. Parity is defined against THESE pinned lists (the
pytest oracle kernels in tests/reference_kernels.py use the same ones).
"""

from __future__ import annotations

import re
import string

import pandas as pd

# Pinned English stopword list (classic 127-word snowball-style list).
STOPWORDS: frozenset[str] = frozenset(
    """a about above after again against all am an and any are aren't as at
    be because been before being below between both but by can't cannot
    could couldn't did didn't do does doesn't doing don't down during each
    few for from further had hadn't has hasn't have haven't having he her
    here hers herself him himself his how i if in into is isn't it its
    itself let's me more most mustn't my myself no nor not of off on once
    only or other ought our ours ourselves out over own same shan't she
    should shouldn't so some such than that the their theirs them themselves
    then there these they this those through to too under until up very was
    wasn't we were weren't what when where which while who whom why with
    won't would wouldn't you your yours yourself yourselves""".split()
)

# Small per-language stopword cores for the n-gram/stopword language-ID
# heuristic (scorers.lang_id). Deliberately tiny and pinned.
LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for on with as are was".split()),
    "de": frozenset("der die das und ist nicht ein eine zu den von mit für".split()),
    "fr": frozenset("le la les et de des un une est pas que pour dans sur".split()),
    "es": frozenset("el la los las y de que en un una es no por con para".split()),
}

# Emoji codepoint ranges (public Unicode blocks).
EMOJI_RANGES = [
    (0x1F300, 0x1F5FF),  # symbols & pictographs
    (0x1F600, 0x1F64F),  # emoticons
    (0x1F680, 0x1F6FF),  # transport & map
    (0x1F900, 0x1F9FF),  # supplemental symbols
    (0x1FA70, 0x1FAFF),  # symbols & pictographs extended-A
    (0x2600, 0x27BF),  # misc symbols + dingbats
    (0x1F1E6, 0x1F1FF),  # regional indicators
    (0xFE0E, 0xFE0F),  # variation selectors
]

EMOJI_PATTERN = re.compile(
    "[" + "".join(f"{chr(lo)}-{chr(hi)}" for lo, hi in EMOJI_RANGES) + "]+"
)
# Same character class in \x{...} syntax (Java regex / RE2 compatible).
EMOJI_CLASS_X = "[" + "".join(f"\\x{{{lo:X}}}-\\x{{{hi:X}}}" for lo, hi in EMOJI_RANGES) + "]+"

PUNCTUATION = string.punctuation  # !"#$%&'()*+,-./:;<=>?@[\]^_`{|}~

HTML_ENTITIES = [
    "nbsp", "lt", "gt", "amp", "quot", "apos", "hellip", "ndash", "mdash",
    "lsquo", "rsquo", "ldquo", "rdquo",
]
# &nbsp; | &nbsp | nbsp; styles, numeric &#160; — one alternation regex.
HTML_ENTITY_REGEX = (
    "(&(" + "|".join(HTML_ENTITIES) + ");?)|(&#[0-9]{1,5};?)|(&#x[0-9a-fA-F]{1,4};?)"
)

URL_REGEX = r"https?://\S+"
TAG_REGEX = r"<[^>]*>"

WATERMARK_WORDS = ["confidential", "watermark", "copyright", "all rights reserved", "draft"]

BLOCKLIST_WORDS = ["casino", "viagra", "jackpot", "xxx", "porn", "betting"]

ID_CARD_REGEX = r"(身份证|id\s*number|identity\s*card|passport\s*no|ssn)"

SPECIAL_CHAR_REGEXES = [
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]",  # control chars
    "[\\ufff9-\\ufffc\\ufffe\\uffff]",  # interlinear annotation / specials
    "\\\\x[0-9a-fA-F]{2}",  # literal escape sequences left in text
    "[\\ue000-\\uf8ff]",  # private use area
]

SENTENCE_REGEX = r"\b[^.!?\n]+[.!?]*"

BULLET_PREFIXES = ("-", "*", "•", "●", "▪", "·", "+")


def tokens(s: pd.Series) -> pd.Series:
    """Whitespace tokenization with Python str.split() semantics
    (splits on all Unicode whitespace, drops empties). Vectorized."""
    return s.fillna("").str.split()


def token_count(s: pd.Series) -> pd.Series:
    return tokens(s).str.len().fillna(0).astype("int64")


# --------------------------------------------------- ccnet normalization

# CCNet's unicode-punctuation mapping, transcribed from the reference's
# KenlmModel.unicode_punct (general_text/eval/models/Kenlm/model.py:25-59
# — the table is itself CCNet's public normalization map; quirks like
# '１' → '"' kept faithfully). Every key is a single non-ASCII char and
# every value is ASCII, so sequential replaces equal the reference's
# per-character map. Applied by the ccnet_normalize refiner in the
# reference's default order: strip → digits→0 → this table →
# non-printing-char removal (model.py:120-143, from_pretrained defaults
# case=False accent=False numbers=True punct=1).
CCNET_UNICODE_PUNCT: list[tuple[str, str]] = [
    ("，", ","), ("。", "."), ("、", ","), ("„", '"'),
    ("”", '"'), ("“", '"'), ("«", '"'), ("»", '"'),
    ("１", '"'), ("」", '"'), ("「", '"'), ("《", '"'),
    ("》", '"'), ("´", "'"), ("∶", ":"), ("：", ":"),
    ("？", "?"), ("！", "!"), ("（", "("), ("）", ")"),
    ("；", ";"), ("–", "-"), ("—", " - "), ("．", ". "),
    ("～", "~"), ("’", "'"), ("…", "..."), ("━", "-"),
    ("〈", "<"), ("〉", ">"), ("【", "["), ("】", "]"),
    ("％", "%"), ("►", "-"),
]

# C0/C1 controls plus the common Unicode format (Cf) code points the
# reference's cc_net remove_non_printing_char strips (it drops ALL
# category-C chars): soft hyphen, zero-width space/joiners + bidi marks
# U+200B-200F, line/para separators + bidi embedding controls
# U+2028-202E, word joiner U+2060, BOM/ZWNBSP U+FEFF. The Cf members use
# PYTHON \uXXXX string-literal escapes (resolved at parse time, so the
# runtime pattern holds the literal characters and compiles identically
# under Python re, Java regex, and DuckDB RE2 — regex-level \x{...}
# escapes would NOT work in Python re) rather than raw invisible chars,
# which trip trojan-source/bidi linters and can be mangled by diff
# tools. Residual delta: rarer Cf points (U+061C, U+180E, interlinear
# annotation anchors, TAG characters) still survive — outside the
# reference's observed web-text domain.
NON_PRINTING_CLASS = (
    "[\\x00-\\x1f\\x7f-\\x9f"
    "\u00ad\u200b-\u200f\u2028-\u202e\u2060\ufeff]"
)


# ------------------------------------------------------- html -> markdown

# One ordered rule table drives all three implementations of the
# html_to_markdown refiner (pandas kernel via re.sub, Catalyst native via
# regexp_replace with $-group syntax, DuckDB oracle via regexp_replace
# with \-group syntax). Replacements below use PYTHON group syntax (\1);
# the Catalyst builder rewrites to $1. Deterministic subset of the
# reference FileOrURLToMarkdownConverter's text/HTML path
# (knowledge_cleaning/generate/file_or_url_to_markdown_converter.py:150 —
# its PDF/OCR branches call external engines (MinerU/trafilatura) and stay
# a documented seam).
# The rule table itself is NEUTRAL serialized data
# (resources/html_md_rules.json) parsed independently here and by the
# DuckDB oracle — see resources/__init__.py (r5 VERDICT ask #5). Rule
# ordering in the file is semantic: non-content blocks drop first,
# inline markup converts BEFORE the generic tag strip, entities decode
# AFTER tag handling (so &lt; can't fabricate tags) with &amp; LAST
# (double-escaped '&amp;lt;' yields literal '&lt;' exactly as
# html.unescape / browsers do), whitespace normalization closes.
from dataflow_spark.resources import load_rule_table as _load_rule_table

HTML_MD_RULES: list[tuple[str, str]] = _load_rule_table("html_md_rules.json")
