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
* ``ann_topk_ivf`` — IVF (inverted-file) coarse quantizer: a deterministic
  k-means over micro-unit-QUANTIZED integer vectors partitions the corpus
  into centroid cells; each query probes its ``n_probe`` nearest cells and
  scores candidates exactly. Everything is JVM-native Catalyst (integer
  zip_with/aggregate dot products — no Python anywhere), every
  intermediate is an exact integer or an IEEE op on exact integers, so the
  whole pipeline — Lloyd iterations included — is bit-reproducible across
  engines and has an exact DuckDB oracle. At 100 TB the train loop runs on
  a sample, the cell tag is one narrow column, and the probe join shuffles
  only ``n_probe/n_centroids`` of the corpus per query batch.
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


# ------------------------------------------------------------------- IVF

def _int_dot(a, b):
    """Exact integer dot product of two array<long> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantize_vec(col, scale: int = 10_000):
    """array<float> → array<long> micro-unit quantization (half-up round,
    identical in Spark and DuckDB). With |x| ≤ ~1 and 64 dims, every dot
    product / squared norm downstream stays far below 2^53, so doubles
    derived from these integers are exact in BOTH engines — the key to a
    bit-reproducible k-means."""
    return F.transform(
        F.col(col).cast("array<double>"),
        lambda x: F.round(x * scale).cast("long"),
    )


def _cent_score(vec_col, sum_col):
    """cos(v, centroid-mean) up to the per-row constant ||v||:
    dot(v, sum_c) / ||sum_c|| — exact ints into two IEEE ops, so argmax
    ties and order are identical across engines."""
    return _int_dot(vec_col, sum_col).cast("double") / F.sqrt(
        _int_dot(sum_col, sum_col).cast("double")
    )


def _cent_literal(cents: list[list[int]]):
    # sv MUST be array<long>: int literals would make zip_with multiply in
    # 32-bit and overflow (ANSI throws) on squared centroid sums
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(int(v)) for v in c]).cast("array<long>").alias("sv"),
            )
            for i, c in enumerate(cents)
        ]
    )


def _assign_cells(df: DataFrame, id_col: str, vec_col: str, cents: list[list[int]]) -> DataFrame:
    """DataFrame[id, cid]: nearest centroid by cosine-to-mean, ties to the
    lowest cid (max_by over (score, -cid) — deterministic)."""
    e = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        F.explode(_cent_literal(cents)).alias("c"),
    )
    score = _cent_score("v", "c.sv")
    return e.groupBy("id").agg(
        F.max_by(
            F.col("c.cid"), F.struct(score.alias("s"), (-F.col("c.cid")).alias("nc"))
        ).alias("cid")
    )


def ivf_train(
    int_corpus: DataFrame,
    id_col: str = "id",
    vec_col: str = "iv",
    n_centroids: int = 8,
    iters: int = 2,
    train_fraction: float | None = None,
    sample_seed: str = "ivf",
) -> list[list[int]]:
    """Deterministic Lloyd's k-means over quantized integer vectors.

    Init = the ``n_centroids`` vectors with the smallest ids (cid in id
    order); each iteration reassigns all rows (one codegen'd explode/agg
    job) and rebuilds every centroid as the exact element-wise INTEGER SUM
    of its members (posexplode + groupBy(cid, pos) — order-independent,
    hence replay- and engine-independent; the mean's scale factor cancels
    in the cosine score so sums never need dividing). A centroid that
    loses all members keeps its previous sum. Only n_centroids × dim longs
    ever reach the driver.

    ``train_fraction`` is the 100-TB lever: a deterministic md5-hash
    Bernoulli sample (operators/sampling.py — retry/layout-stable,
    SQL-replayable) of the corpus feeds BOTH the init and every Lloyd
    iteration, so training cost scales with the sample while assignment
    semantics over the full corpus are unchanged."""
    train = int_corpus.select(id_col, vec_col)
    if train_fraction is not None:
        from dataflow_spark.operators.sampling import sample_hash_fraction

        train = sample_hash_fraction(train, [id_col], train_fraction, seed=sample_seed)
    init = train.orderBy(id_col).limit(n_centroids).collect()
    cents = [list(r[vec_col]) for r in init]
    dim = len(cents[0])
    for _ in range(iters):
        assigned = _assign_cells(train, id_col, vec_col, cents)
        sums = (
            train.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .join(assigned, "id")
            .select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"))
            .collect()
        )
        acc: dict[int, dict[int, int]] = {}
        for r in sums:
            acc.setdefault(r["cid"], {})[r["pos"]] = r["s"]
        cents = [
            [acc[c][p] for p in range(dim)] if c in acc else cents[c]
            for c in range(len(cents))
        ]
    return cents


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    iters: int = 2,
    n_probe: int = 2,
    scale: int = 10_000,
    round_to: int | None = 6,
    train_fraction: float | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k. Output schema matches
    ann_topk_bruteforce; recall < 1.0 by construction (a true neighbor in
    an unprobed cell is missed). Cosine here is over the QUANTIZED
    vectors — the operator defines its arithmetic, and that definition is
    exactly replayable in SQL (every intermediate is an exact integer or
    an IEEE op on exact integers). At scale: train on a sample, tag the
    corpus once (narrow int column), and each query batch joins only its
    n_probe cells — n_probe/n_centroids of the corpus instead of all of
    it, with AQE absorbing cell skew."""
    ci = corpus.select(
        F.col(id_col).alias("id"), quantize_vec(vec_col, scale).alias("v")
    ).localCheckpoint()
    cents = ivf_train(
        ci, "id", "v", n_centroids=n_centroids, iters=iters,
        train_fraction=train_fraction,
    )

    tagged = ci.join(_assign_cells(ci, "id", "v", cents), "id").select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), "cid"
    )
    qi = queries.select(
        F.col(id_col).alias("query_id"), quantize_vec(vec_col, scale).alias("qv")
    )
    qe = qi.select(
        "query_id", "qv", F.explode(_cent_literal(cents)).alias("c")
    ).withColumn("s", _cent_score("qv", "c.sv"))
    wq = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("c.cid"))
    qprobe = (
        qe.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", F.col("c.cid").alias("cid"))
    )
    cand = tagged.join(qprobe, "cid").filter(F.col("neighbor_id") != F.col("query_id"))
    cos = _int_dot("qv", "cv").cast("double") / (
        F.sqrt(_int_dot("qv", "qv").cast("double"))
        * F.sqrt(_int_dot("cv", "cv").cast("double"))
    )
    scored = cand.withColumn("cos_sim", cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
    if round_to is not None:
        out = out.withColumn("cos_sim", F.round("cos_sim", round_to))
    return out


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


def semdedup_kmeans(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 8,
    iters: int = 2,
    scale: int = 10_000,
    train_fraction: float | None = None,
    sample_seed: str = "semdedup",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540; the reference's
    embedding near-dedup family, sem_deduplicator.py:63-161): k-means
    cluster the embedding space, then within each cluster drop every item
    whose cosine similarity to a LOWER-ID cluster member reaches the
    threshold. Returns the kept ``(id, cid)`` rows.

    The paper's design point is exactly this cost shape: candidate pairs
    are confined to clusters, so pair volume is sum(c_i^2) over cluster
    sizes instead of n^2 — at 100 TB you raise ``n_centroids`` to keep
    clusters bounded and train on a ``train_fraction`` sample; the corpus
    then sees one assignment pass (explode over a broadcast centroid
    literal + max_by), one self-join per cluster (AQE absorbs cluster
    skew), and one broadcast anti-join. Clustering reuses ``ivf_train``'s
    deterministic integer Lloyd iterations, so every decision — centroid
    sums, assignments, and the cosine test (two IEEE ops on exact
    integers < 2^53) — is bit-reproducible across engines and replayed
    exactly by the DuckDB oracle. Differences from
    ``dedup_embedding_cosine`` (the LSH-bucketed variant): candidates
    come from trained clusters rather than sign-LSH bands, and the drop
    rule is one-shot (similar to ANY earlier member, kept or not) rather
    than the greedy kept-only scan — a single join instead of a
    sequential per-component pass, at the cost of occasionally dropping a
    chain member the greedy scan would keep. Near-dup pairs split across
    clusters are missed — the paper's documented recall trade."""
    ci = corpus.select(
        F.col(id_col).alias("id"), quantize_vec(vec_col, scale).alias("v")
    ).localCheckpoint()
    cents = ivf_train(
        ci, "id", "v", n_centroids=n_centroids, iters=iters,
        train_fraction=train_fraction, sample_seed=sample_seed,
    )
    tagged = ci.join(_assign_cells(ci, "id", "v", cents), "id")
    a = tagged.select(F.col("id").alias("a_id"), F.col("v").alias("av"), "cid")
    b = tagged.select(F.col("id").alias("b_id"), F.col("v").alias("bv"), "cid")
    cos = _int_dot("av", "bv").cast("double") / (
        F.sqrt(_int_dot("av", "av").cast("double"))
        * F.sqrt(_int_dot("bv", "bv").cast("double"))
    )
    drops = (
        a.join(b, "cid")
        .filter(F.col("b_id") < F.col("a_id"))
        .filter(cos >= F.lit(float(threshold)))
        .select(F.col("a_id").alias("id"))
        .distinct()
    )
    return tagged.join(drops, "id", "left_anti").select(
        F.col("id").alias(id_col), "cid"
    )
