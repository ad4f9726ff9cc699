"""CLI entry point — ``python -m dataflow_spark.cli <cmd>``.

Reference: the ``dataflow`` console script dispatches subcommands
(/root/reference/dataflow/cli.py:4-13, pyproject.toml:39-40). Engine
subcommands:

* ``list-ops``                         — print the operator registry
* ``pt-filter  --input --output``      — run the batch PT chain
* ``stream-app --input --output``      — run the composed streaming app
* ``gen-transcripts --output --turns`` — synthesize a transcripts table

Runs identically under plain python or ``spark-submit --py-files``.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dataflow_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list-ops")

    p1 = sub.add_parser("pt-filter")
    p1.add_argument("--input", required=True)
    p1.add_argument("--output", required=True)
    p1.add_argument("--text-col", default="text")
    p1.add_argument("--order-col", default="doc_id")

    p2 = sub.add_parser("stream-app")
    p2.add_argument("--input", required=True)
    p2.add_argument("--output", required=True)

    p3 = sub.add_parser("gen-transcripts")
    p3.add_argument("--output", required=True)
    p3.add_argument("--turns", type=int, default=100_000)
    p3.add_argument("--seed", type=int, default=42)
    p3.add_argument("--files", type=int, default=8)

    args = ap.parse_args(argv)

    if args.cmd == "list-ops":
        from dataflow_spark.registry import list_operators

        try:
            for name in list_operators():
                print(name)
        except BrokenPipeError:  # `| head` closed the pipe
            pass
        return 0

    if args.cmd == "gen-transcripts":
        from dataflow_spark.datagen import write_transcripts_parquet

        path = write_transcripts_parquet(
            args.output, n_turns=args.turns, seed=args.seed, n_files=args.files
        )
        print(json.dumps({"path": path, "turns": args.turns}))
        return 0

    from dataflow_spark.session import get_spark

    spark = get_spark("dataflow-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "pt-filter":
        from pyspark.sql import functions as F

        from dataflow_spark.functions.filters import apply_filters
        from dataflow_spark.functions.refiners import apply_refiners
        from dataflow_spark.functions.scorers import quality_score_native
        from dataflow_spark.io import read_any, write_any
        from dataflow_spark.operators.dedup import dedup_exact, dedup_minhash, with_order_rank

        df = read_any(spark, args.input)
        refined = apply_refiners(
            df, ["remove_extra_spaces", "remove_emoji", "remove_html_url"], col=args.text_col
        )
        deduped = dedup_exact(refined, [args.text_col], args.order_col)
        ranked = with_order_rank(deduped, [args.order_col])
        near = dedup_minhash(ranked, "__ord", text_col=args.text_col).drop("__ord")
        out = apply_filters(
            near,
            ["content_null", "word_number", "mean_word_length", "alpha_words",
             "unique_words", "lorem_ipsum", "curly_bracket", "watermark"],
            col=args.text_col,
        ).withColumn("quality", quality_score_native(F.col(args.text_col)))
        write_any(out, args.output)
        print(json.dumps({"rows_out": spark.read.parquet(args.output).count()}))
        spark.stop()
        return 0

    if args.cmd == "stream-app":
        from dataflow_spark.streaming.app import TranscriptsApp

        app = TranscriptsApp(src_dir=args.input, out_dir=args.output)
        counts = app.run_to_completion(spark)
        print(json.dumps(counts))
        spark.stop()
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
