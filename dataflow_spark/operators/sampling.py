"""Deterministic sampling / quota operators for training-data pipelines.

Large-corpus curation needs downsampling and domain balancing that is
(a) reproducible run-to-run and across retries/speculation, (b) cheap —
no global sort, no RNG state, and (c) auditable. Everything here derives
its randomness from md5 arithmetic over row keys (the same device as the
LSH hyperplane family), so results are pure functions of the data:
re-running on a different cluster layout yields byte-identical samples,
and every operator has an exact DuckDB oracle.

The reference pipelines do ad-hoc pandas ``df.sample``/head slicing
inside operators (non-deterministic across runs unless seeded, and
single-node); these are the cluster-shaped equivalents.

* ``sample_hash_fraction``   — Bernoulli p-sample: keep iff
  u(key) < fraction, u = md5-uniform in [0,1). Exactly reproducible,
  composable (a 0.5-sample of a 0.5-sample with different seeds is an
  unbiased 0.25-sample), and embarrassingly parallel — one codegen'd
  filter, no shuffle at all.
* ``stratified_sample_n``    — n rows per stratum, chosen uniformly by
  md5-hash order within the stratum. One shuffle on the strata key;
  rank via window (bounded by per-stratum cardinality, the operator's
  documented skew caveat — quota selection over a hot stratum is a
  top-n, not a sort of the corpus).
* ``cap_per_key``            — domain capping: keep the FIRST ``quota``
  rows per key in ``order_col`` order (the standard "at most N docs per
  domain" pretraining mix rule — deterministic, not sampled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_U32 = 4294967296.0  # 2^32


def _md5_u01(cols: list[str], seed: int):
    """Uniform [0,1) from the first 8 md5 hex chars of the keyed row —
    the SQL-replayable substitute for a seeded RNG. '\\x1f' joins fields
    unambiguously (unit separator never appears in normal text)."""
    key = F.concat_ws(
        "\x1f", F.lit(str(seed)), *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    )
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") / F.lit(_U32)


def sample_hash_fraction(
    df: DataFrame, key_cols: list[str], fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sample: keep the row iff its md5-uniform
    draw is below ``fraction``. No shuffle, no RNG, retry-stable."""
    return df.filter(_md5_u01(key_cols, seed) < F.lit(float(fraction)))


def stratified_sample_n(
    df: DataFrame,
    strata_cols: list[str],
    key_cols: list[str],
    n: int,
    seed: int = 0,
) -> DataFrame:
    """Exactly ``n`` rows per stratum (fewer when the stratum is smaller),
    uniform within the stratum via md5-hash order; ties broken by the key
    itself so the pick is total and deterministic."""
    u = _md5_u01(key_cols, seed)
    w = Window.partitionBy(*strata_cols).orderBy(
        u.asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def cap_per_key(
    df: DataFrame, key_cols: list[str], quota: int, order_col: str
) -> DataFrame:
    """Keep the first ``quota`` rows per key in ``order_col`` order (ties
    broken by the order col being unique — callers pass a rid/doc_id)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def assign_hash_splits(
    df: DataFrame,
    key_cols: list[str],
    splits: dict[str, float],
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's md5-uniform
    draw lands in one of the cumulative ``splits`` bands (fractions must
    sum to ~1; the last band absorbs rounding). The split is a pure
    function of the row key — reproducible across runs, clusters, and
    retries, immune to repartitioning, and new rows join a split without
    reshuffling old ones (the property a growing 100-TB corpus needs —
    a random-split column materialized once cannot give it). Zero
    shuffle: one codegen'd CASE over the hash."""
    u = _md5_u01(key_cols, seed)
    names = list(splits)
    edges: list[float] = []
    acc = 0.0
    for name in names[:-1]:
        acc += float(splits[name])
        edges.append(acc)
    expr = F.lit(names[-1])
    for name, edge in zip(reversed(names[:-1]), reversed(edges)):
        expr = F.when(u < F.lit(edge), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)
