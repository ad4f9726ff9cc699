"""Print formatted physical plans for headline queries + plan-quality
checks (pushed filters, pruned schemas, codegen spans, broadcast joins).

Usage: python tools/explain_plans.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "filter_word_number",
    "dedup_exact_md5",
    "window_tumbling",
    "assembly_conversations",
    "join_user_assistant",
    "ann_topk_bruteforce",
    "top_orders_per_segment",
    "pipeline_pt_chain",
    "bm25_topk",
    "dedup_minhash_lsh",
    "split_semantic",
    "sql_component_classify",
    "html_to_markdown_doc",
    "kcenter_select",
    "ann_topk_ivf",
    "score_bigram_perplexity",
    "superfiltering_ifd",
    "sample_hash_fraction",
    "cap_per_source",
    "answer_judger_math",
    "sketch_profile_kmv",
    "score_trigram_kn",
    "score_token_count_bpe",
    "answer_token_length_filter_bpe",
    # round 6
    "score_perplexity_cjk",
    "classify_source_nb",
    "extract_smiles",
    "smiles_equivalence",
    "speech2text_stub",
    "vqa_stub",
    "text2sql_prompt",
    # round 7
    "score_perplexity_thai",
    "dsir_logweights",
    "dsir_select_gumbel",
    "line_dedup_global",
    "dedup_substrings_global",
    "ccnet_ppl_buckets",
    "ccnet_pipeline",
    "dedup_semdedup_kmeans",
    "quality_signals",
    "paragraph_dedup_global",
    "curriculum_pack_shards",
    "hist_quantiles_quality",
    "classify_lang_chargram",
    "bm25_hard_negatives",
    "tfidf_top_terms",
    "score_distinct_n",
    "crossdoc_ngram_overlap",
    "refine_c4_lines_doc",
    "gopher_pipeline",
    "assign_hash_splits",
    "pack_token_shards",
    "mixture_sample_sources",
    "gopher_top_bigram_char",
    "decontaminate_ngram",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from dataflow_spark.entry_queries import build_queries
    from dataflow_spark.session import get_spark

    spark = get_spark("explain", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    q = build_queries()
    print("# Physical plans (judge artifact)\n")
    for name in HEADLINE:
        df = q[name](spark, sf_dir)
        df.collect()  # execute THIS QueryExecution so AQE finalizes in place
        plan = df._jdf.queryExecution().executedPlan().toString()
        checks = {
            "whole-stage codegen": "*(" in plan or "codegen id" in plan,
            "broadcast join used": "BroadcastHashJoin" in plan or "Broadcast" in plan,
            "python on hot path": "BatchEvalPython" in plan,
            "aqe final plan": "isFinalPlan=true" in plan or "AdaptiveSparkPlan" not in plan,
        }
        explained = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        print(f"\n## {name}\n")
        print("checks:", {k: v for k, v in checks.items()})
        # plan text can contain raw newlines inside SQL string literals
        # (e.g. the html→markdown "\n\n## " replacement); pad any line
        # that would look like a markdown heading so `^## ` greps over
        # this file only ever hit real section headers
        body = "\n".join(
            (" " + ln if ln.startswith("#") else ln)
            for ln in explained[:4000].splitlines()
        )
        print("\n```\n" + body + "\n```")
    spark.stop()


if __name__ == "__main__":
    main()
