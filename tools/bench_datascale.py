"""Data-size weak-scaling evidence: the same PT pipeline at 1x / 4x / 8x
input on FIXED cores. The north rule's two-cluster-size criterion is
covered by tools/scaling_job.py (2 vs 8 cores, fixed input); this is the
orthogonal axis — throughput (turns/s) should stay ~flat as the input
grows, i.e. wall-clock ~linear in data, because every stage is either a
scan-proportional map or a shuffle whose partition count, not volume per
partition, is fixed. A super-linear wall-clock would mean some stage
accumulates state with input size (the 100-TB red flag this leg exists
to catch).

Usage: python tools/bench_datascale.py [--turns 300000 1200000 2400000]
                                       [--cores 32]
Writes one JSON line to stdout; commit as BENCH/datascale_r{N}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", nargs="+", type=int,
                    default=[300_000, 1_200_000, 2_400_000])
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from bench import _host_calibration, pt_pipeline_transcripts
    from dataflow_spark.datagen import write_transcripts_parquet
    from dataflow_spark.session import get_spark

    cal = _host_calibration()
    spark = get_spark("datascale", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    legs = []
    for i, n in enumerate(sorted(args.turns)):
        path = write_transcripts_parquet(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".bench_cache", f"transcripts_{n}_x16"),
            n_turns=n, seed=42, n_files=16,
        )
        df = pt_pipeline_transcripts(spark, path)
        # per-leg warm: this leg's parquet footers + (leg 0 only) codegen
        # and Arrow worker spin-up — steady-state throughput is the claim
        df.limit(2000).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        legs.append({"turns": n, "wall_s": round(dt, 3),
                     "turns_per_sec": round(n / dt, 1)})

    spark.stop()
    cal_after = _host_calibration()
    tps = [leg["turns_per_sec"] for leg in legs]
    out = {
        "metric": "data-size weak scaling (PT pipeline, fixed cores)",
        "cores": args.cores,
        "legs": legs,
        # linear-in-data wall clock == the LARGEST input's throughput is
        # not below the best leg's (fixed overhead may flatter small
        # legs; state accumulation would drag the big one)
        "largest_leg_vs_best": round(tps[-1] / max(tps), 3),
        "host_calibration": {"before": cal, "after": cal_after},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
