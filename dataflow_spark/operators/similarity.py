"""Similarity search over embedding columns (array<float/double>).

Two paths, per the engine's scale doctrine:

* ``ann_topk_bruteforce`` — exact top-k by cosine. The query side is small
  and gets broadcast; the corpus side streams through a single
  whole-stage-codegen stage (zip_with/aggregate dot products — no Python).
  This is the correctness baseline and is already the right plan when
  |queries| is small (broadcast join = no shuffle of the 100-TB corpus).
* ``ann_topk_lsh`` — random-hyperplane LSH bucketing: corpus and queries
  hash to sign-pattern buckets (multi-table + multi-probe by Hamming-1
  neighbors); cosine is evaluated only inside matching buckets. Same
  output schema; recall < 1.0 by construction. At scale the bucket join
  shuffles only bucket keys + vectors, and AQE handles bucket skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _dot(a: str, b: str):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(col: str):
    return F.sqrt(
        F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def ann_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    Excludes self-matches (same id). Ties broken by neighbor id asc —
    deterministic output for hash comparison.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    joined = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    sim = _dot("qv", "cv") / (_norm("qv") * _norm("cv"))
    scored = joined.withColumn("cos_sim", sim)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
    if round_to is not None:
        out = out.withColumn("cos_sim", F.round("cos_sim", round_to))
    return out


def _hyperplanes(n_tables: int, n_planes: int, dim: int, seed: int) -> np.ndarray:
    """md5-arithmetic hyperplane family (not an RNG): component j of plane
    (t, p) is ``int(md5(f"plane:{seed}:{t}:{p}:{j}")[:8], 16) / 2^31 - 1``
    — uniform in [-1, 1), deterministic, identical across executors, and
    SQL-replayable, so the bucket assignment (and hence the whole
    ann_topk_lsh output) can be verified by a DuckDB oracle."""
    import hashlib

    arr = np.empty((n_tables, n_planes, dim))
    for t in range(n_tables):
        for p in range(n_planes):
            for j in range(dim):
                h = int(
                    hashlib.md5(
                        f"plane:{seed}:{t}:{p}:{j}".encode("utf-8")
                    ).hexdigest()[:8],
                    16,
                )
                arr[t, p, j] = h / 2147483648.0 - 1.0
    return arr


def _bucket_udf(planes: np.ndarray, multiprobe: bool):
    n_tables, n_planes, _ = planes.shape

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.values).astype(np.float64)
        out = []
        signs = [mat @ planes[t].T > 0 for t in range(n_tables)]
        for i in range(mat.shape[0]):
            ks = []
            for t in range(n_tables):
                bits = signs[t][i]
                code = int("".join("1" if x else "0" for x in bits), 2)
                ks.append(f"{t}:{code}")
                if multiprobe:  # Hamming-1 probes widen recall cheaply
                    for j in range(n_planes):
                        ks.append(f"{t}:{code ^ (1 << j)}")
            out.append(ks)
        return pd.Series(out)

    return _udf


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    n_planes: int = 10,
    seed: int = 13,
    round_to: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via sign-LSH buckets (multi-probe on the
    query side only). Output schema matches ann_topk_bruteforce. Pass
    ``dim`` — the fallback probe launches an extra driver job per call.

    Cross-engine caveat: bucket bits are signs of float64 dot products;
    a projection within ~1e-15 of zero could flip between numpy and a SQL
    replay (summation order). Real vectors keep projections far from
    zero; the integer-exact formulation lives in dedup_embedding_cosine.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(n_tables, n_planes, dim, seed)
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.explode(_bucket_udf(planes, multiprobe=False)(F.col(vec_col))).alias("bk"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.explode(_bucket_udf(planes, multiprobe=True)(F.col(vec_col))).alias("bk"),
    )
    cand = (
        cb.join(qb, "bk")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .distinct()
    )
    sim = _dot("qv", "cv") / (_norm("qv") * _norm("cv"))
    scored = cand.withColumn("cos_sim", sim)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
    if round_to is not None:
        out = out.withColumn("cos_sim", F.round("cos_sim", round_to))
    return out
