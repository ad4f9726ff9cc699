"""Streaming metrics: a StreamingQueryListener that records per-batch
progress (rows, duration, state size) to a JSONL file — the metrics leg of
the north rule's "per-partition lineage + metrics logged"."""

from __future__ import annotations

import json
import os

from pyspark.sql.streaming import StreamingQueryListener


class JsonlMetricsListener(StreamingQueryListener):
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "processed_rows_per_second": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
                "state_operators": [
                    {
                        "operator": so.operatorName,
                        "rows_total": so.numRowsTotal,
                        "rows_updated": so.numRowsUpdated,
                        "memory_bytes": so.memoryUsedBytes,
                    }
                    for so in (p.stateOperators or [])
                ],
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write({"event": "terminated", "id": str(event.id), "exception": event.exception})

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def _write(self, rec: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")
