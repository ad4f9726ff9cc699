"""Round-8 optimization harness (guide §1.4): per-query isolation with the
noop sink, repeated timing (min + all samples), and `.explain("formatted")`
capture under plans/r08/.

This file is NOT the driver's bench — bench.py stays the frozen measurement
contract. This harness exists so each optimization can be measured in
isolation (cold-start noise amortized away by repeats) and so the committed
plan files under plans/r08/ are reproducible.

Usage:
  python bench_extra.py [--plans SUFFIX] [--reps N] [query ...]

With --plans SUFFIX, writes plans/r08/<query>_<SUFFIX>.txt for each query.
With no query args, runs the full headline list from bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "dedup_minhash_lsh", "dedup_exact_md5", "window_tumbling",
    "window_session", "assembly_conversations", "join_user_assistant",
    "ann_topk_bruteforce", "ann_topk_ivf", "pricing_summary", "score_ngram",
    "score_bigram_perplexity", "score_trigram_kn", "score_token_count_bpe",
    "classify_source_nb", "line_dedup_global", "pack_token_shards",
    "dsir_logweights", "dedup_semdedup_kmeans", "ccnet_pipeline",
    "gopher_pipeline", "quality_signals",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_suffix = None
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_suffix = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = list(HEADLINE)

    from pyspark.sql import functions as F

    from dataflow_spark.entry_queries import build_queries
    from dataflow_spark.session import get_spark

    spark = get_spark("dataflow-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the stateless Arrow machinery once (mirrors bench.py's warmup
    # class 3) so first-query numbers are not worker-spawn numbers
    _warm = F.pandas_udf(lambda x: x, "long")
    _force(
        spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism).select(
            _warm("id")
        )
    )

    q = build_queries()
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08")
    if plans_suffix:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r08:{name}")
        samples = []
        for _ in range(reps):
            t0 = time.time()
            _force(q[name](spark, SF_DIR))
            samples.append(round(time.time() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        if plans_suffix:
            plan = q[name](spark, SF_DIR)._sc._jvm.PythonSQLUtils.explainString(
                q[name](spark, SF_DIR)._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{plans_suffix}.txt"), "w") as f:
                f.write(plan)
        print(
            json.dumps({"query": name, **out[name]}), file=sys.stderr, flush=True
        )
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "reps": reps, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
