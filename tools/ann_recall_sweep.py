"""ANN quality/latency knob evidence: IVF recall@k vs n_probe against the
exact brute-force top-k, plus sign-LSH recall, on the embeddings table.

The approximate operators' contract is a TUNABLE recall; this records the
actual recall curve so the trade is documented rather than asserted.
Writes one JSON line; commit as BENCH/ann_recall_r{N}.json.

Usage: python tools/ann_recall_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from dataflow_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_ivf,
        ann_topk_lsh,
    )
    from dataflow_spark.session import get_spark

    spark = get_spark("ann-sweep", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 50)
    k = 5

    def truth_of(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    t0 = time.time()
    exact = truth_of(ann_topk_bruteforce(emb, queries, k=k))
    t_exact = round(time.time() - t0, 3)

    def recall(approx):
        hits = sum(len(approx.get(q, set()) & s) for q, s in exact.items())
        return round(hits / (len(exact) * k), 4)

    legs = []
    for n_probe in (1, 2, 4, 8):
        t0 = time.time()
        got = truth_of(
            ann_topk_ivf(
                emb, queries, k=k, n_centroids=8, iters=2,
                n_probe=n_probe, train_fraction=0.5,
            )
        )
        legs.append(
            {"variant": f"ivf_nprobe{n_probe}", "recall_at_5": recall(got),
             "wall_s": round(time.time() - t0, 3)}
        )
    t0 = time.time()
    got = truth_of(ann_topk_lsh(emb, queries, k=k, dim=64))
    legs.append(
        {"variant": "lsh_4x10_multiprobe", "recall_at_5": recall(got),
         "wall_s": round(time.time() - t0, 3)}
    )
    print(
        json.dumps(
            {
                "metric": "ANN recall@5 vs exact brute force",
                "sf_dir": sf,
                "n_queries": len(exact),
                "bruteforce_wall_s": t_exact,
                "legs": legs,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
