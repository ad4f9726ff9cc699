"""DSIR-style data selection via hashed-n-gram importance resampling.

Implements the published DSIR recipe (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"): featurize every
document as counts over B hash buckets of its uni+bigrams, fit two
bag-of-hashed-ngrams unigram models — one on a small TARGET corpus (the
distribution you want more of), one on the RAW corpus — and weight each
raw document by its log importance ratio
``log w(x) = sum_b c_b(x) * (log p_target(b) - log p_raw(b))``,
then resample the raw corpus by Gumbel-perturbed top-k (exactly the
paper's "sample without replacement ∝ w" trick, made deterministic here
by deriving the Gumbel noise from md5 arithmetic over the row key — the
same seeded-RNG substitute as operators/sampling.py, so a retry or a
different cluster layout reproduces the identical selection).

The reference engine has no DSIR operator; this is one of the
training-data-pipeline extensions the engine carries beyond reference
parity (like decontamination and the Gopher rules). Everything is
exact-oracle-able: bucket ids come from the md5-hex device both engines
share, the smoothed probabilities are single IEEE divisions of exact
integers (alpha=1), and per-document sums fold in ascending bucket
order on both sides.

100 TB shape: featurization is one explode + map-side-combinable
``groupBy(id, bucket)`` per corpus (no joins); the two bucket models and
their log-ratio table are at most B rows (default 4096) — broadcast;
weighting is one broadcast join + one per-doc aggregation; selection is
a global top-k (TakeOrderedAndProject — no full sort). The target
corpus is small by construction (that is DSIR's premise), the raw
corpus streams through exactly twice (featurize, weight) and never
needs to hold state anywhere but the B-row model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_spark.operators.lm import tokens_expr
from dataflow_spark.operators.sampling import _md5_u01

DEFAULT_BUCKETS = 4096


def hashed_ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, bucket, cnt): hashed uni+bigram counts per document.

    Tokens via the shared LM tokenizer (lowercase, CJK char-level
    fallback, ASCII-whitespace split); bigrams are space-joined adjacent
    pairs; the bucket is the first 8 md5 hex chars of the n-gram mod
    ``n_buckets`` — the engine's standard SQL-replayable hash device.
    One narrow explode + one map-side-combinable aggregation; no join.
    """
    toks = df.select(
        F.col(id_col).alias("id"), tokens_expr(F.col(text_col)).alias("tk")
    )
    grams = toks.select(
        "id",
        F.explode(
            F.concat(
                F.col("tk"),
                F.expr(
                    "CASE WHEN size(tk) >= 2 THEN transform("
                    "sequence(0, size(tk) - 2),"
                    " i -> concat(tk[i], ' ', tk[i + 1])) "
                    "ELSE array() END"
                ),
            )
        ).alias("g"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).alias("bucket")
    return grams.select("id", bucket).groupBy("id", "bucket").count().select(
        "id", "bucket", F.col("count").alias("cnt")
    )


def bucket_log_ratio(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(bucket, lr): per-bucket log importance ratio
    ``ln((t_b + 1) / (T + B)) - ln((r_b + 1) / (R + B))`` — add-one
    smoothed unigram models over hash buckets for the target and raw
    corpora. alpha=1 keeps every numerator/denominator an exact integer,
    so each probability is a single IEEE division and the oracle replays
    it bit-for-bit. At most ``n_buckets`` rows; totals ride along as
    1-row cross joins (no driver collect)."""
    t = target_feats.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
    r = raw_feats.groupBy("bucket").agg(F.sum("cnt").alias("rc"))
    tt = t.agg(F.sum("tc").alias("tn"))
    rt = r.agg(F.sum("rc").alias("rn"))
    b = F.lit(n_buckets).cast("long")
    joined = (
        r.join(t, "bucket", "left").crossJoin(F.broadcast(tt)).crossJoin(
            F.broadcast(rt)
        )
    )
    lr = F.log(
        (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.col("tn") + b).cast("double")
    ) - F.log(
        (F.col("rc") + F.lit(1)).cast("double") / (F.col("rn") + b).cast("double")
    )
    # raw-side buckets only: weights are computed for raw documents, whose
    # buckets are by construction a subset of raw_feats' — target-only
    # buckets can never be probed
    return joined.select("bucket", lr.alias("lr"))


def dsir_log_weights(raw_feats: DataFrame, log_ratio: DataFrame) -> DataFrame:
    """(id, logw): per-document importance log-weight — the feature
    counts dotted with the broadcast B-row log-ratio table, folded in
    ascending bucket order so the floating-point sum is deterministic
    and the DuckDB oracle (``list_sum(list(... ORDER BY bucket))``)
    reproduces it term-for-term."""
    terms = raw_feats.join(F.broadcast(log_ratio), "bucket").select(
        "id", "bucket", (F.col("cnt").cast("double") * F.col("lr")).alias("term")
    )
    return terms.groupBy("id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "term"))),
                lambda s: s["term"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("logw")
    )


def dsir_select(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    k: int = 100,
    seed: int = 0,
    gumbel: bool = True,
) -> DataFrame:
    """Top-k resample of ``df`` by importance weight. With ``gumbel``
    (the paper's sampling-without-replacement-∝-w estimator) each row's
    key is ``logw + Gumbel(0,1)`` where the noise is
    ``-ln(-ln(u))`` for the row's seeded md5-uniform draw — fully
    deterministic, retry-stable, and SQL-replayable. Rows with no
    features (zero tokens) carry no weight and are never selected.
    Selection is a bounded top-k, not a global sort."""
    u = _md5_u01([id_col], seed)
    scored = df.join(
        weights.withColumnRenamed("id", id_col), id_col
    ).withColumn(
        "sel_key",
        F.col("logw") + (-F.log(-F.log(u)) if gumbel else F.lit(0.0)),
    )
    return scored.orderBy(F.col("sel_key").desc(), F.col(id_col).asc()).limit(k)
