"""Chemistry domain operators — deterministic SMILES handling.

Reference parity: DataFlow's chemistry pipeline extracts SMILES strings
from free text (chemistry/generate/extract_smiles_from_text.py:15) and
judges molecule equivalence (chemistry/eval/eval_smiles_equivalence.py:11)
with RDKit canonicalization. RDKit is not in this container, so the
operators implement a DOCUMENTED DETERMINISTIC SUBSET with the full
Spark-side shape, and the RDKit canonicalization step stays an
import-gated seam (``_rdkit_canonical``) that activates the moment the
environment provides the package — same pattern as the Iceberg sink and
the multimodal decoders.

The subset is pure Catalyst (zero Python on the hot path) and every rule
is replayed exactly by the DuckDB oracle:

* **candidate tokenization** — whitespace tokens of length ≥ 5 drawn
  entirely from the SMILES character set, containing at least one
  branch/bond/ring character (filters plain words like "Hello") and at
  least one organic-subset atom letter;
* **structural validation** — an ordered FOLD over the token's
  characters (Spark ``aggregate``, DuckDB ``list_reduce``): round-paren
  depth must never go negative and must end at zero; square brackets
  must not nest and must close; plus ring-closure digit pairing — each
  digit 1-9 OUTSIDE brackets must occur an even number of times.

Scale shape: explode + regex + fold — all codegen, shuffle-free; the
per-document candidate count is tiny, so the explode does not amplify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# SMILES character set (organic + brackets + bonds + rings + stereo).
# Kept identical, char for char, in the oracle (entry_queries).
SMILES_CHARSET = r"[A-Za-z0-9@+\-\[\]()=#$%/\\.:]"
# at least one structure character — rejects plain alphanumerics
SMILES_STRUCT = r"[()=#\[\]0-9]"
# at least one organic-subset atom letter
SMILES_ATOM = r"[BCNOPSFIbcnops]"

MIN_LEN = 5

# Fold-state encoding shared with the SQL oracle: the running value is
# (paren_depth + 50) * 10_000 + (bracket_depth + 50) * 100 + broken_flag.
# Depths in web text are far below 50, so fields never collide. On the
# FIRST violation (close before open, bracket nesting, or any depth
# excursion) the accumulator freezes at the _BROKEN sentinel — it never
# keeps folding, so the stored value can never go negative and the two
# engines' integer div/mod (Spark truncates toward zero, DuckDB's // and
# % floor) only ever see non-negative operands, where they agree
# (r6 ADVICE: a token with >50 unmatched close-parens used to drive the
# field negative and the engines could diverge on such degenerate
# tokens instead of both rejecting identically).
_INIT = 50 * 10_000 + 50 * 100
_BROKEN = _INIT + 1  # frozen violation sentinel (depths reset, flag set)


def _fold_step(acc: Column, ch: Column) -> Column:
    p = (acc / 10_000).cast("int") - 50
    b = ((acc % 10_000) / 100).cast("int") - 50
    p2 = F.when(ch == "(", p + 1).when(ch == ")", p - 1).otherwise(p)
    b2 = F.when(ch == "[", b + 1).when(ch == "]", b - 1).otherwise(b)
    step = F.when((p2 < 0) | (b2 < 0) | (b2 > 1), F.lit(_BROKEN)).otherwise(
        (p2 + 50) * 10_000 + (b2 + 50) * 100
    )
    return F.when(acc == _BROKEN, acc).otherwise(step)


def smiles_structurally_valid(c: Column | str) -> Column:
    """True iff the token passes the subset validator: charset + length,
    fold-checked parens/brackets, even ring-closure digits (1-9, counted
    outside brackets by first erasing bracket atoms)."""
    t = F.col(c) if isinstance(c, str) else c
    charset_ok = t.rlike(f"^{SMILES_CHARSET}+$")
    struct_ok = t.rlike(SMILES_STRUCT) & t.rlike(SMILES_ATOM)
    len_ok = F.length(t) >= MIN_LEN
    final = F.aggregate(
        F.split(t, ""),
        F.lit(_INIT),
        lambda acc, ch: F.when(ch == "", acc).otherwise(_fold_step(acc, ch)),
    )
    fold_ok = final == F.lit(_INIT)  # depths back to 0, broken flag unset
    nobr = F.regexp_replace(t, r"\[[^\]]*\]", "")  # ring digits live outside
    ring_ok = F.lit(True)
    for d in "123456789":
        cnt = F.length(nobr) - F.length(F.regexp_replace(nobr, d, ""))
        ring_ok = ring_ok & (cnt % 2 == 0)
    return charset_ok & struct_ok & len_ok & fold_ok & ring_ok


def extract_smiles(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """(id, smiles) — every validated SMILES candidate in each document,
    in token order (pos breaks ties deterministically)."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+")
        ).alias("pos", "tok"),
    )
    return (
        toks.filter(smiles_structurally_valid(F.col("tok")))
        .select(F.col(id_col), F.col("pos"), F.col("tok").alias("smiles"))
        .orderBy(id_col, "pos")
    )


def _strip_stereo(c: Column) -> Column:
    """Remove stereochemistry markers (@, /, \\) — the subset
    normalization's only chemical identification beyond string identity."""
    return F.regexp_replace(c, r"[@/\\]", "")


def _unbracket_plain(c: Column) -> Column:
    """[C] → C (and [CH] → C after a stereo strip turned [C@H] into
    [CH]) for bare organic-subset atoms — bracket notation of a plain
    atom, with at most one explicit hydrogen, is the same molecule under
    default-valence implicit-H rules. Part of the documented subset."""
    return F.regexp_replace(c, r"\[([BCNOPSFI])H?\]", "$1")


def smiles_normalize(c: Column | str) -> Column:
    """The documented-subset normal form: stereo markers stripped, plain
    bracket atoms unbracketed. NOT a canonicalization — two different
    atom orderings of the same molecule stay distinct (that requires
    RDKit; see ``smiles_equivalent``'s seam)."""
    t = F.col(c) if isinstance(c, str) else c
    return _unbracket_plain(_strip_stereo(t))


def _rdkit_canonical():
    """Import-gated RDKit canonicalizer (activates when the environment
    ships rdkit; None here)."""
    try:  # pragma: no cover - rdkit absent in this container
        from rdkit import Chem  # noqa: F401

        def canon(s: str) -> str | None:
            m = Chem.MolFromSmiles(s)
            return Chem.MolToSmiles(m) if m is not None else None

        return canon
    except ImportError:
        return None


def smiles_equivalent(
    df: DataFrame, a_col: str, b_col: str
) -> Column:
    """Equivalence verdict column for two SMILES columns. With RDKit
    present: canonical-form equality via a pandas UDF. Without: the
    documented subset — normalized string equality (exact on identical
    atom orderings; conservative `false` otherwise)."""
    canon = _rdkit_canonical()
    if canon is not None:  # pragma: no cover - rdkit absent here
        import pandas as pd

        @F.pandas_udf("boolean")
        def eq(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    (ca is not None and ca == cb)
                    for ca, cb in zip(a.map(canon), b.map(canon))
                ]
            )

        return eq(F.col(a_col), F.col(b_col))
    return smiles_normalize(a_col) == smiles_normalize(b_col)
