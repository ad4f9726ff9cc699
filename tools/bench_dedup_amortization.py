"""Streaming near-dedup scaling-tail amortization curve (r4 VERDICT #1).

The dedup leg's sub-0.8 raw scaling efficiency at 4 micro-batches was
analyzed as a fixed per-batch driver tail (Bloom build + sidecar write,
commit append, candidate collect) that Amdahl turns into a serial
fraction ∝ n_batches / total_rows. This driver measures the curve: the
IDENTICAL spark-submit dedup job at both parallelism levels across
several micro-batch counts over the SAME total input (files/fpt =
n_batches), plus optionally a larger input at the baseline batch count
(per-batch rows ×2). Prediction: efficiency rises toward the
batch/stream legs' level as per-batch rows grow.

Usage: python tools/bench_dedup_amortization.py [--turns 2400000]
Writes one JSON line per config and a markdown table to stdout; append
the table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import build_zip, cpu_ceiling, run_at


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_400_000)
    ap.add_argument("--cores", type=int, nargs=2, default=[2, 8])
    ap.add_argument("--fpts", type=int, nargs="*", default=[4, 16, 32])
    ap.add_argument("--big-turns", type=int, default=0,
                    help="optional extra config: this many turns at fpt=16")
    args = ap.parse_args()
    zpath = build_zip()
    lo, hi = args.cores
    rows = []
    configs = [(args.turns, fpt) for fpt in args.fpts]
    if args.big_turns:
        configs.append((args.big_turns, 16))
    for turns, fpt in configs:
        ceiling = cpu_ceiling(lo, hi)
        r_lo = run_at(lo, turns, zpath, "dedup", fpt)
        r_hi = run_at(hi, turns, zpath, "dedup", fpt)
        eff = round(
            (r_hi["dedup_turns_per_sec"] / r_lo["dedup_turns_per_sec"]) / (hi / lo), 3
        )
        row = {
            "turns": turns,
            "fpt": fpt,
            "n_batches": r_lo.get("dedup_n_batches"),
            "rows_per_batch": turns // max(r_lo.get("dedup_n_batches") or 1, 1),
            "low_s": r_lo["dedup_s"],
            "high_s": r_hi["dedup_s"],
            "low_tps": r_lo["dedup_turns_per_sec"],
            "high_tps": r_hi["dedup_turns_per_sec"],
            "raw_efficiency": eff,
            "ceiling": ceiling,
            "vs_ceiling": round(eff / ceiling, 3) if ceiling else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print("\n| turns | micro-batches | rows/batch | eff (raw) | host ceiling | eff/ceiling |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['turns']:,} | {r['n_batches']} | {r['rows_per_batch']:,} |"
            f" {r['raw_efficiency']} | {r['ceiling']} | {r['vs_ceiling']} |"
        )


if __name__ == "__main__":
    main()
