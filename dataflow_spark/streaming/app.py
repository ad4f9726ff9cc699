"""The composed streaming application — the engine's north-star job.

One transcripts stream drives three concurrent Structured Streaming
queries (shared source directory, independent checkpoints):

1. **clean**   — stateless refine + quality-filter chain → exactly-once
   keyed MERGE sink on (conv_id, turn_idx);
2. **assembly** — session-window conversation assembly
   (applyInPandasWithState) → exactly-once sink on (conv_id, session_start);
3. **pairs**   — stream-stream user↔response join → exactly-once sink on
   (conv_id, user_turn_idx, resp_turn_idx);
4. **dedup**   — incremental MinHash first-wins near-dedup (band state on
   disk, commit-log replay safety) → exactly-once sink on
   (conv_id, turn_idx); first-wins priority/identity is a per-batch
   arrival rank over (ts, turn_idx, conv_id), so the survivor among
   near-duplicates is always the earliest qualifying turn.

A JsonlMetricsListener records per-batch progress; each sink records
per-batch per-partition lineage. Everything restarts from checkpoints.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from dataflow_spark.functions.filters import apply_filters
from dataflow_spark.functions.refiners import apply_refiners
from dataflow_spark.streaming.assembly import assemble_conversations
from dataflow_spark.streaming.join import join_user_responses
from dataflow_spark.streaming.metrics import JsonlMetricsListener
from dataflow_spark.streaming.sink import KeyedMergeSink
from dataflow_spark.streaming.source import file_stream

DEFAULT_REFINERS = ["remove_extra_spaces", "remove_emoji", "remove_html_url"]
DEFAULT_FILTERS = ["content_null", "word_number", "alpha_words", "unique_words"]


@dataclass
class TranscriptsApp:
    src_dir: str
    out_dir: str
    refiners: list[str] = field(default_factory=lambda: list(DEFAULT_REFINERS))
    filters: list[str] = field(default_factory=lambda: list(DEFAULT_FILTERS))
    gap_seconds: int = 600
    watermark: str = "2 minutes"
    max_files_per_trigger: int | None = 4

    def __post_init__(self):
        self.clean_sink = KeyedMergeSink(
            os.path.join(self.out_dir, "clean"), keys=("conv_id", "turn_idx")
        )
        self.assembly_sink = KeyedMergeSink(
            os.path.join(self.out_dir, "conversations"), keys=("conv_id", "session_start")
        )
        self.pairs_sink = KeyedMergeSink(
            os.path.join(self.out_dir, "pairs"),
            keys=("conv_id", "user_turn_idx", "resp_turn_idx"),
        )
        self.dedup_sink = KeyedMergeSink(
            os.path.join(self.out_dir, "deduped"), keys=("conv_id", "turn_idx")
        )

    def start(self, spark: SparkSession, available_now: bool = True):
        listener = JsonlMetricsListener(os.path.join(self.out_dir, "metrics.jsonl"))
        spark.streams.addListener(listener)

        def stream():
            return file_stream(spark, self.src_dir, self.max_files_per_trigger)

        trigger = {"availableNow": True} if available_now else {"processingTime": "10 seconds"}

        cleaned = apply_filters(apply_refiners(stream(), self.refiners), self.filters)
        q1 = (
            cleaned.writeStream.queryName("clean")
            .foreachBatch(self.clean_sink.foreach_batch)
            .option("checkpointLocation", os.path.join(self.out_dir, "ck_clean"))
            .trigger(**trigger)
            .start()
        )
        assembled = assemble_conversations(
            apply_refiners(stream(), self.refiners),
            gap_seconds=self.gap_seconds,
            watermark=self.watermark,
        )
        q2 = (
            assembled.writeStream.queryName("assembly")
            .foreachBatch(self.assembly_sink.foreach_batch)
            .option("checkpointLocation", os.path.join(self.out_dir, "ck_assembly"))
            .trigger(**trigger)
            .start()
        )
        paired = join_user_responses(stream(), max_response_seconds=300)
        q3 = (
            paired.writeStream.queryName("pairs")
            .foreachBatch(self.pairs_sink.foreach_batch)
            .option("checkpointLocation", os.path.join(self.out_dir, "ck_pairs"))
            .trigger(**trigger)
            .start()
        )
        from dataflow_spark.streaming.dedup import StreamingFirstWinsDedup

        self._dedup = StreamingFirstWinsDedup(
            os.path.join(self.out_dir, "dedup_state"),
            order_col="__ord",
            ts_col="ts",
            downstream=lambda df, b: self.dedup_sink.foreach_batch(
                df.drop("__ord"), b
            ),
        )
        # first-wins priority/identity key: a per-micro-batch arrival rank
        # over (ts, turn_idx, conv_id) — the kept row among near-duplicates
        # is the EARLIEST qualifying turn, matching the reference's
        # arrival-order insertion-session semantics (an earlier xxhash64 key
        # was deterministic but picked the survivor in hash order). Rank is
        # unique within the batch, which is all first-wins needs: rows in
        # earlier batches always win via the committed-band anti-join, so
        # ranks may repeat across batches. with_order_rank is a distributed
        # range-sort + partition-offset pass over BATCH rows only — no
        # global state, deterministic on replay (full sort key is unique).
        from dataflow_spark.operators.dedup import with_order_rank

        refined = apply_refiners(stream(), self.refiners)

        def _dedup_batch(bdf, batch_id):
            ranked = with_order_rank(bdf, ["ts", "turn_idx", "conv_id"], "__ord")
            self._dedup.process_batch(ranked, batch_id)

        q4 = (
            refined.writeStream.queryName("dedup")
            .foreachBatch(_dedup_batch)
            .option("checkpointLocation", os.path.join(self.out_dir, "ck_dedup"))
            .trigger(**trigger)
            .start()
        )
        return [q1, q2, q3, q4]

    def run_to_completion(self, spark: SparkSession, timeout: int = 600):
        queries = self.start(spark, available_now=True)
        for q in queries:
            q.awaitTermination(timeout)
        return {
            "clean_rows": sum(r["rows"] for r in self.clean_sink.lineage()),
            "conversations": sum(r["rows"] for r in self.assembly_sink.lineage()),
            "pairs": sum(r["rows"] for r in self.pairs_sink.lineage()),
            "deduped": sum(r["rows"] for r in self.dedup_sink.lineage()),
        }
