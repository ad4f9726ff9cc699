"""Text2SQL deterministic operators.

The reference's text2sql family is mostly LLM-backed (SQLGenerator,
SQLVariationGenerator, SQLConsistencyFilter, SQLExecutionClassifier — all
take an ``llm_serving``; out of deterministic scope per SURVEY §7.3). Two
components are pure functions of their input and are re-expressed here:

* ``SQLExecutionFilter`` (reference
  text2sql/filter/sql_execution_filter.py:13-115): keep rows whose SQL
  (a) survives the SELECT/WITH gate after comment stripping and
  (b) actually executes against the target database. The reference runs a
  DatabaseManager over sqlite files; the Spark re-expression runs the gate
  as a Catalyst predicate (phase 1 never leaves the JVM) and the execute
  probe as an Arrow-batched ``mapInPandas`` with one in-process DB-API
  connection per batch — the same per-task connection discipline as
  ``io.read_db_paginated``. At 100 TB the probe stage is embarrassingly
  parallel and the gate has already pruned non-SELECT rows at the scan.

* ``SQLComponentClassifier`` / EvalHardnessLite (reference
  text2sql/eval/sql_component_classifier.py:630-698): difficulty label
  from component counts — regex/substring arithmetic, fully
  Catalyst-native here (and DuckDB-oracle-checkable). The reference's
  quirky substring semantics (e.g. ``'in' in sql`` matching the 'in'
  inside 'join') are replicated faithfully, not "fixed".
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def strip_sql_comments(col: Column) -> Column:
    """Remove /* */ block comments (DOTALL) then ``--`` line comments and
    trim — the exact order of reference filter_select_sql (:40-47)."""
    c = F.regexp_replace(col, r"(?s)/\*.*?\*/", "")
    c = F.regexp_replace(c, r"--.*", "")
    # NOT F.trim: Spark trim strips only 0x20, but the reference's Python
    # .strip() also removes the newline left behind by a leading line
    # comment — regexp-strip the full whitespace class instead
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def is_select_sql(col: Column) -> Column:
    """Reference phase-1 gate: comment-stripped SQL starts with
    select/with (case-insensitive)."""
    s = F.lower(strip_sql_comments(F.coalesce(col, F.lit(""))))
    return s.rlike(r"^(select|with)")


def _count(s: Column, token: str) -> Column:
    """Occurrences of a literal substring (replace-length arithmetic —
    stays in whole-stage codegen)."""
    return (
        F.length(s) - F.length(F.replace(s, F.lit(token), F.lit("")))
    ) / len(token)


def sql_component_difficulty(
    col: Column,
    thresholds: tuple[int, ...] = (2, 5, 9),
    labels: tuple[str, ...] = ("easy", "medium", "hard", "extra"),
) -> Column:
    """EvalHardnessLite score -> difficulty label, Catalyst-native.

    Faithful transcription of the reference's scoring
    (sql_component_classifier.py:630-698) over the lowered SQL string.
    """
    s = F.lower(F.coalesce(col, F.lit("")))
    contains = lambda t: F.contains(s, F.lit(t))  # noqa: E731

    score = F.lit(0)
    score += F.when(s.rlike(r"\( *select"), 2).otherwise(0)
    njoin = _count(s, " join ").cast("int")
    score += F.when(njoin > 0, njoin).otherwise(0)
    score += F.when((_count(s, ",") > 0) & contains("from"), 1).otherwise(0)
    score += F.when(_count(s, " and ") + _count(s, " or ") >= 2, 1).otherwise(0)
    score += F.when(contains("in") | contains("exists") | contains("like"), 1).otherwise(0)
    score += F.when(contains("group by"), 1).otherwise(0)
    score += F.when(contains("having"), 1).otherwise(0)
    score += F.when(
        contains("cast") | contains("round") | contains("substring")
        | contains("date") | contains("coalesce"),
        1,
    ).otherwise(0)
    score += F.when(contains("order by"), 1).otherwise(0)
    score += F.when(contains("limit"), 1).otherwise(0)
    score += F.when(
        contains("union") | contains("intersect") | contains("except"), 2
    ).otherwise(0)
    # first `select [distinct] <cols> from` match; +1 if the column list
    # has a comma (multi-column select)
    cols = F.regexp_extract(s, r"(?s)select\s+(distinct\s+)?(.+?)\s+from", 2)
    score += F.when(_count(cols, ",") >= 1, 1).otherwise(0)

    out = F.lit(labels[-1])
    for t, lab in zip(reversed(thresholds), reversed(labels[:-1])):
        out = F.when(score <= t, lab).otherwise(out)
    return out


def sql_execution_filter(
    df: DataFrame,
    sql_col: str = "sql",
    db_factory=None,
    timeout: float | None = None,
) -> DataFrame:
    """Keep rows whose SQL passes the SELECT gate AND executes.

    ``db_factory`` is a no-arg callable returning a DB-API connection,
    created once per Arrow batch inside the worker (default: in-memory
    DuckDB — pure scalar SELECTs need no tables; pass a factory that
    opens/attaches the real database for schema-bound workloads).
    ``timeout`` is accepted for reference parity (DatabaseManager's
    per-query timeout); enforcement belongs to the DB engine's own
    interrupt mechanism and is a documented seam here.
    """
    gated = df.filter(is_select_sql(F.col(sql_col)))
    cols = gated.columns

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if db_factory is None:
            import duckdb

            con = duckdb.connect()
        else:
            con = db_factory()
        try:
            for pdf in batches:
                keep = []
                for q in pdf[sql_col]:
                    try:
                        con.execute(q)
                        keep.append(True)
                    except Exception:  # noqa: BLE001 - any DB error = reject
                        keep.append(False)
                        # transactional drivers (psycopg2 et al.) abort the
                        # whole transaction on error — without a rollback the
                        # poisoned connection would reject every later row in
                        # the batch. No-op on autocommit/DuckDB connections.
                        try:
                            con.rollback()
                        except Exception:  # noqa: BLE001 - driver w/o txns
                            pass
                yield pdf[pd.Series(keep, index=pdf.index)]
        finally:
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass

    return gated.mapInPandas(probe, schema=gated.schema).select(*cols)


def sql_execution_match(
    df: DataFrame,
    pred_col: str = "pred_sql",
    gt_col: str = "gt_sql",
    db_factory=None,
    result_col: str = "exec_match",
) -> DataFrame:
    """Execution-accuracy core of SQLExecutionClassifier
    (text2sql/eval/sql_execution_classifier.py:87-120): run the predicted
    and ground-truth SQL and compare RESULT SETS as order-insensitive
    row multisets (column names ignored — the reference compares fetched
    rows). A row matches only when BOTH execute successfully and return
    identical sorted row tuples; any execution error is a non-match. The
    reference wraps this in an LLM candidate-generation loop (scoped
    out); this operator judges any (pred, gt) pair. One DB-API
    connection per Arrow batch, rollback after every failed execute."""
    from pyspark.sql import types as T

    cols = df.columns
    out_schema = T.StructType(df.schema.fields + [T.StructField(result_col, T.BooleanType())])

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if db_factory is None:
            import duckdb

            con = duckdb.connect()
        else:
            con = db_factory()

        def run(q):
            try:
                cur = con.execute(q)
                return True, sorted(map(tuple, cur.fetchall()))
            except Exception:  # noqa: BLE001 - any DB error = no result
                try:
                    con.rollback()
                except Exception:  # noqa: BLE001
                    pass
                return False, None

        try:
            for pdf in batches:
                verdicts = []
                for p, g in zip(pdf[pred_col], pdf[gt_col]):
                    okp, rp = run(p)
                    okg, rg = run(g)
                    verdicts.append(bool(okp and okg and rp == rg))
                pdf = pdf.copy()
                pdf[result_col] = verdicts
                yield pdf
        finally:
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass

    return df.mapInPandas(probe, schema=out_schema).select(*cols, result_col)


PROMPT_TEMPLATE = """Task Overview:
/* Given the following database schema: */
{schema}
/* Answer the following: {question} */
Let's think step by step"""


def text2sql_prompt(
    df: DataFrame,
    question_col: str,
    db_id_col: str,
    schemas: DataFrame,
    template: str = PROMPT_TEMPLATE,
    out_col: str = "prompt",
) -> DataFrame:
    """Text2SQLPromptGenerator (reference
    text2sql/generate/text2sql_prompt_generator.py:13-110): combine each
    row's question with its database's schema DDL under the reference's
    default template. Deterministic — the only reference dependency is
    the DatabaseManager schema fetch, which here is ``schemas``, a
    ``(db_id, ddl)`` table joined (broadcast — the schema catalog is
    dims-sized) after the reference's db_id sanitization
    (``re.sub(r'[^A-Za-z0-9_]', '', db_id)``, :113). Rows whose db_id
    has no schema get a NULL prompt (the reference raises per item and
    skips — the driver-side filter is the caller's choice).

    The template is applied via two ``replace`` calls exactly like
    Python ``str.format`` with these two placeholders (neither value is
    itself templated)."""
    clean = F.regexp_replace(
        F.regexp_replace(F.coalesce(F.col(db_id_col), F.lit("")), r"\n", ""),
        r"[^A-Za-z0-9_]",
        "",
    )
    joined = df.withColumn("__db", clean).join(
        F.broadcast(schemas.select(F.col("db_id").alias("__db"), "ddl")),
        "__db",
        "left",
    )
    prompt = F.replace(
        F.replace(F.lit(template), F.lit("{schema}"), F.col("ddl")),
        F.lit("{question}"),
        F.coalesce(F.col(question_col), F.lit("")),
    )
    return joined.withColumn(out_col, prompt).drop("__db", "ddl")
