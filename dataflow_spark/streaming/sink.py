"""Exactly-once keyed MERGE sink with per-batch, per-partition lineage.

Production target is Iceberg ``MERGE INTO ... ON t.conv_id = s.conv_id AND
t.turn_idx = s.turn_idx`` inside ``foreachBatch`` (the reference's
FileStorage.write step files, storage.py:212-277, generalized to an ACID
table). No Iceberg runtime jar ships in this container, so the same
contract is implemented on plain parquet:

* data layout: ``<dir>/data/batch=<id>/`` written via a temp dir + atomic
  rename; a batch directory is visible only when complete;
* commit log: ``<dir>/_commits.jsonl`` appended AFTER the data rename —
  a replayed micro-batch (same batchId after restart) is detected and its
  rewrite is harmless (same deterministic content), the commit append is
  skipped → exactly-once table state;
* lineage: every commit records batchId, row count, per-spark-partition
  row counts, and wall time — the per-partition lineage the north rule
  asks for;
* read side: ``read_table`` resolves the key (conv_id, turn_idx) by
  last-writer-wins (max batchId) — MERGE semantics.

``iceberg_merge_sink`` is the real-catalog path, exercised only when an
Iceberg catalog is configured on the session.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class KeyedMergeSink:
    table_dir: str
    keys: tuple[str, ...] = ("conv_id", "turn_idx")

    @property
    def _commits_path(self) -> str:
        return os.path.join(self.table_dir, "_commits.jsonl")

    @property
    def _lineage_path(self) -> str:
        return os.path.join(self.table_dir, "_lineage.jsonl")

    def committed_batches(self) -> set[int]:
        if not os.path.exists(self._commits_path):
            return set()
        with open(self._commits_path) as f:
            return {json.loads(line)["batch_id"] for line in f if line.strip()}

    @staticmethod
    def _footer_partition_counts(parquet_dir: str) -> dict[str, int]:
        """partition-id → row count from part-file footers (metadata-only;
        'part-00007-...' file index == spark partition id)."""
        import pyarrow.parquet as pq

        counts: dict[str, int] = {}
        for name in os.listdir(parquet_dir):
            if not name.startswith("part-") or not name.endswith(".parquet"):
                continue
            pid = str(int(name.split("-")[1]))
            n = pq.ParquetFile(os.path.join(parquet_dir, name)).metadata.num_rows
            if n:
                counts[pid] = counts.get(pid, 0) + n
        return counts

    def foreach_batch(self, df: DataFrame, batch_id: int) -> None:
        if batch_id in self.committed_batches():
            # replay after restart — already durable, exactly-once no-op
            return
        os.makedirs(os.path.join(self.table_dir, "data"), exist_ok=True)
        final = os.path.join(self.table_dir, "data", f"batch={batch_id}")
        tmp = final + ".tmp"
        t0 = time.time()
        out = df.withColumn("__batch_id", F.lit(batch_id)).withColumn(
            "__part_id", F.spark_partition_id()
        )
        out.write.mode("overwrite").parquet(tmp)
        # per-partition lineage from the written parquet FOOTERS — pure
        # metadata, no second scan of the batch (task part-files map 1:1 to
        # spark partitions; footer carries the row count)
        part_counts = self._footer_partition_counts(tmp)
        n_rows = sum(part_counts.values())
        if os.path.exists(final):
            # crashed between rename and commit append on a previous run
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)
        with open(self._lineage_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "batch_id": batch_id,
                        "rows": n_rows,
                        "partition_rows": part_counts,
                        "wall_s": round(time.time() - t0, 3),
                        "ts": time.time(),
                    }
                )
                + "\n"
            )
        with open(self._commits_path, "a") as f:
            f.write(json.dumps({"batch_id": batch_id, "rows": n_rows}) + "\n")

    def read_table(self, spark: SparkSession, as_of_batch: int | None = None) -> DataFrame:
        """Merged view: last-writer-wins per key over committed batches.

        ``as_of_batch`` gives snapshot time travel (the Iceberg
        snapshot-id read, storage.py step-file restart analogue): the
        table exactly as it stood after that batch committed."""
        committed = self.committed_batches()
        if as_of_batch is not None:
            committed = {b for b in committed if b <= as_of_batch}
        data_dir = os.path.join(self.table_dir, "data")
        if not committed or not os.path.exists(data_dir):
            raise FileNotFoundError(f"no committed batches in {self.table_dir}")
        df = spark.read.parquet(os.path.join(data_dir, "batch=*"))
        df = df.filter(
            F.col("__batch_id").isin([int(b) for b in committed])
        )
        value_cols = [c for c in df.columns if c not in ("__part_id",)]
        winners = df.groupBy(*[F.col(k) for k in self.keys]).agg(
            F.max_by(
                F.struct(*[F.col(c) for c in value_cols]), F.col("__batch_id")
            ).alias("row")
        )
        return winners.select("row.*").drop("__batch_id", "__part_id")

    def lineage(self) -> list[dict]:
        if not os.path.exists(self._lineage_path):
            return []
        with open(self._lineage_path) as f:
            return [json.loads(line) for line in f if line.strip()]


def merge_sink_for(
    spark,
    path: str,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    iceberg_table: str | None = None,
):
    """Sink factory behind the Iceberg feature probe: when the session's
    JVM actually has the Iceberg runtime (``session.iceberg_available`` —
    activated by ``DFS_ICEBERG_JAR`` at session build), return the real
    MERGE INTO foreachBatch against ``iceberg_table`` (default: a
    ``local.db.<basename>`` hadoop-catalog table, created on first use);
    otherwise fall back to the parquet :class:`KeyedMergeSink` at
    ``path``. Returns ``(foreach_batch_fn, sink_or_None)`` — the sink
    object is None on the Iceberg path (lineage lives in table history)."""
    from dataflow_spark.session import iceberg_available

    if iceberg_available(spark):
        table = iceberg_table or (
            "local.db." + os.path.basename(path.rstrip("/")).replace("-", "_")
        )

        def fn(df: DataFrame, batch_id: int) -> None:
            s = df.sparkSession
            s.sql(
                f"CREATE TABLE IF NOT EXISTS {table} "
                f"({', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}) "
                "USING iceberg"
            )
            iceberg_merge_sink(table, keys)(df, batch_id)

        return fn, None
    sink = KeyedMergeSink(path, keys=keys)
    return sink.foreach_batch, sink


def iceberg_merge_sink(table: str, keys: tuple[str, ...] = ("conv_id", "turn_idx")):
    """foreachBatch function doing a real Iceberg MERGE INTO (requires an
    Iceberg catalog on the session; activated via the DFS_ICEBERG_JAR
    probe in session.get_spark — not available in this container)."""

    def fn(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        view = f"__merge_src_{batch_id}"
        df.createOrReplaceTempView(view)
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        spark.sql(
            f"MERGE INTO {table} t USING {view} s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )

    return fn
