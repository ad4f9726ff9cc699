"""dataflow_spark — a from-scratch PySpark-native streaming analytics engine.

Re-expresses the deterministic data-preparation semantics of the reference
system (smfszhpr/DataFlow: text refiners, heuristic quality filters,
exact/near deduplication, scorers, conversation assembly — see SURVEY.md §2)
as an idiomatic Spark engine:

* batch operators are declarative DataFrame transforms (Catalyst-optimizable
  native expressions on the hot path, Arrow-vectorized pandas_udfs where
  Python-string parity demands it — never per-row Python),
* the streaming runtime is Structured Streaming over a transcripts table
  ``(conv_id, turn_idx, role, text, tool, ts)``: watermarked tumbling /
  sliding / session windows, stateful conversation assembly
  (applyInPandasWithState), a stream-stream user↔assistant join, and an
  exactly-once keyed MERGE sink with per-batch lineage.

Nothing here is a port: the reference executes row-at-a-time Python loops
with full disk materialization between operators
(/root/reference/dataflow/utils/storage.py:95-107); this engine keeps the
whole pipeline inside one Catalyst plan.
"""

__version__ = "0.1.0"

from dataflow_spark.session import get_spark  # noqa: F401
