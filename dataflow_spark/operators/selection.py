"""Diverse-subset selection — k-center greedy over embeddings.

Reference: ContentChooser (agentic_rag/filter/content_chooser.py:140) uses
kcenter-greedy over embeddings to pick representative/diverse documents.
Engine re-expression: the classic farthest-point traversal. Each of the k
rounds is one distributed aggregation (max of min-distance-to-selected);
only the k selected vectors live on the driver, so the corpus never
collects. k is small (a selection budget), so k scans is the right
trade at 100 TB — each scan is a broadcast of ≤k vectors plus a max-agg.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kcenter_greedy(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    start_id: int | None = None,
) -> list[int]:
    """Return the ids of k greedily-selected centers (maximal min-distance).

    Deterministic: starts from ``start_id`` (default: smallest id); ties on
    distance break toward the smallest id.

    Cross-engine caveat: the argmax compares float64 distances whose
    summation order differs between numpy (pairwise/SIMD) and a SQL
    replay (sequential) — the DuckDB oracle agrees because real embedding
    corpora keep the top-2 gap far above the ~1e-15 relative
    summation-order noise; adversarially near-tied inputs would need the
    quantized-integer-distance formulation used by dedup_embedding_cosine.
    """
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if start_id is None:
        start_id = base.agg(F.min("id")).first()[0]
    first = base.filter(F.col("id") == start_id).first()
    selected_ids = [int(first["id"])]
    selected_vecs = [np.asarray(first["v"], dtype=np.float64)]

    for _ in range(k - 1):
        sel = np.vstack(selected_vecs)

        @F.pandas_udf(T.DoubleType())
        def min_dist(vs: pd.Series) -> pd.Series:
            mat = np.vstack(vs.values).astype(np.float64)
            # squared euclidean to each selected center, min over centers
            d = ((mat[:, None, :] - sel[None, :, :]) ** 2).sum(axis=2).min(axis=1)
            return pd.Series(d)

        far = (
            base.withColumn("d", min_dist(F.col("v")))
            .orderBy(F.desc("d"), F.asc("id"))
            .select("id", "v")
            .first()
        )
        selected_ids.append(int(far["id"]))
        selected_vecs.append(np.asarray(far["v"], dtype=np.float64))
    return selected_ids


def select_diverse(df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    ids = kcenter_greedy(df, k, id_col, vec_col)
    spark = df.sparkSession
    sel = spark.createDataFrame([(i, r) for r, i in enumerate(ids)], f"{id_col} long, sel_rank int")
    return df.join(F.broadcast(sel), id_col).select(id_col, "sel_rank")
