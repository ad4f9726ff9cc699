"""k-center greedy selection vs a numpy oracle."""

import numpy as np
import pandas as pd

from dataflow_spark.operators.selection import kcenter_greedy, select_diverse


def _numpy_kcenter(mat, k, start=0):
    sel = [start]
    for _ in range(k - 1):
        d = ((mat[:, None, :] - mat[sel][None, :, :]) ** 2).sum(axis=2).min(axis=1)
        # ties toward smallest id: argmax on (-d, id) ordering
        best = min(range(len(mat)), key=lambda i: (-d[i], i))
        sel.append(best)
    return sel


def test_kcenter_matches_numpy(spark):
    rng = np.random.RandomState(3)
    mat = rng.normal(size=(80, 6))
    pdf = pd.DataFrame({"vec_id": np.arange(80, dtype="int64"), "embedding": list(map(list, mat))})
    df = spark.createDataFrame(pdf)
    got = kcenter_greedy(df, k=8)
    expected = _numpy_kcenter(mat, 8, start=0)
    assert got == expected


def test_kcenter_covers_clusters(spark):
    # three tight clusters: k=3 must pick one point from each
    rng = np.random.RandomState(4)
    centers = np.array([[0, 0], [100, 0], [0, 100]], dtype=float)
    pts = np.vstack([c + rng.normal(scale=0.1, size=(20, 2)) for c in centers])
    pdf = pd.DataFrame({"vec_id": np.arange(60, dtype="int64"), "embedding": list(map(list, pts))})
    df = spark.createDataFrame(pdf)
    sel = select_diverse(df, k=3).toPandas()
    clusters = {int(v) // 20 for v in sel.vec_id}
    assert clusters == {0, 1, 2}
