"""Training-shard packing and domain-mixture sampling.

Two staples of assembling a pretraining mix that the reference leaves to
ad-hoc scripts:

* ``pack_token_shards`` — assign documents to contiguous fixed-token-
  budget training shards by running token count in a deterministic
  global order (the "sequence packing" pre-step: shard k holds the docs
  whose running sum lands in [k*budget, (k+1)*budget)). The naive Spark
  spelling is a GLOBAL window cumsum — one reducer sorting the corpus, a
  scale-killer. This is the two-pass distributed prefix sum instead:
  range-repartition on the order key, per-partition cumsum under a
  partition-local window, then add each partition's prefix offset
  (computed from a partition-count-sized aggregate — the only collect,
  bounded by the partition count, not the data). The result is
  independent of the partitioning, so the single-window DuckDB oracle
  replays it exactly (integer sums — no FP order sensitivity).

* ``mixture_sample`` — downsample each source/domain to hit target mix
  proportions exactly at the largest feasible total: T = min_s(n_s /
  share_s), rate_s = T * share_s / n_s, keep iff the row's seeded
  md5-uniform draw < rate_s (operators/sampling.py device —
  deterministic, retry-stable, SQL-replayable). One tiny per-source
  count aggregate broadcast back onto the corpus; the corpus itself
  streams through a single codegen'd filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataflow_spark.operators.sampling import _md5_u01


def pack_token_shards(
    df: DataFrame,
    order_col: str,
    n_tokens_col: str,
    shard_budget: int,
    n_partitions: int | None = None,
) -> DataFrame:
    """Add ``cum_tokens`` (inclusive running sum in ``order_col`` order)
    and ``shard_id`` (the contiguous budget bin the document STARTS in:
    ``(cum_tokens - n_tokens) / shard_budget`` — a straddling doc belongs
    to the shard it begins in). ``order_col`` must be unique (callers
    pass a doc id); token counts are integers, so the distributed prefix
    sum is exact and partitioning-invariant."""
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint PINS the range layout: the partitioner samples with
    # a seed derived from the RDD id, so re-executing the lineage for the
    # totals pass and the cumsum pass can place boundary rows in
    # DIFFERENT partitions — offsets computed for one layout would then
    # be added to another (observed: exact at 500 rows, wrong at 5000).
    # Staging one materialized copy is the honest cost of a global
    # prefix sum; it replaces re-reading the source twice.
    d = (
        df.repartitionByRange(parts, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # pass 1: partition totals -> prefix offsets (partition-count rows on
    # the driver; range partitions are ordered by key, so offsets are the
    # cumsum of totals in pid order)
    totals = {
        r["__pid"]: r["t"]
        for r in d.groupBy("__pid").agg(F.sum(n_tokens_col).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("__pid"),
    ) if offsets else F.lit(0)
    # pass 2: partition-local cumsum + the partition's prefix offset
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (F.sum(n_tokens_col).over(w) + off).alias("cum_tokens")
    return (
        d.withColumn("cum_tokens", cum)
        .withColumn(
            "shard_id",
            F.floor(
                (F.col("cum_tokens") - F.col(n_tokens_col))
                / F.lit(shard_budget)
            ).cast("long"),
        )
        .drop("__pid")
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_cols: list[str],
    target_shares: dict[str, float],
    seed: int = 0,
) -> DataFrame:
    """Keep a deterministic Bernoulli sample of each source so the
    EXPECTED output hits ``target_shares`` at the largest feasible total
    ``T = min_s(n_s / share_s)``. Sources absent from ``target_shares``
    are dropped (share 0). Rates are IEEE divisions of exact integers
    and the draw is the md5-uniform device, so the DuckDB oracle replays
    the exact row set."""
    spark = df.sparkSession
    shares = spark.createDataFrame(
        [(k, float(v)) for k, v in target_shares.items()],
        f"{source_col} string, __share double",
    )
    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    sized = counts.join(shares, source_col)  # inner: share-less sources drop
    t_max = sized.agg(
        F.min(F.col("__n") / F.col("__share")).alias("__t")
    )
    rates = (
        sized.crossJoin(F.broadcast(t_max))
        .select(
            source_col,
            F.least(
                F.lit(1.0), F.col("__t") * F.col("__share") / F.col("__n")
            ).alias("__rate"),
        )
    )
    u = _md5_u01(id_cols, seed)
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(u < F.col("__rate"))
        .drop("__rate")
    )
