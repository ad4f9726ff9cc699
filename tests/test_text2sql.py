"""text2sql deterministic operators vs pinned reference transcriptions.

The kernel below is a sequential Python transcription of the reference's
EvalHardnessLite (text2sql/eval/sql_component_classifier.py:630-698); the
Catalyst expression must agree on every input, including the quirky
substring semantics ('in' matching inside 'join'/'having')."""

import re

from pyspark.sql import functions as F

from dataflow_spark.operators.text2sql import (
    is_select_sql,
    sql_component_difficulty,
    sql_execution_filter,
)


def _hardness_kernel(sql: str) -> str:
    s = sql.lower()
    score = 0
    if re.search(r"\( *select", s):
        score += 2
    if s.count(" join ") > 0:
        score += s.count(" join ")
    if s.count(",") > 0 and "from" in s:
        score += 1
    if s.count(" and ") + s.count(" or ") >= 2:
        score += 1
    if any(kw in s for kw in ["in", "exists", "like"]):
        score += 1
    if "group by" in s:
        score += 1
    if "having" in s:
        score += 1
    if any(f in s for f in ["cast", "round", "substring", "date", "coalesce"]):
        score += 1
    if "order by" in s:
        score += 1
    if "limit" in s:
        score += 1
    if any(op in s for op in ["union", "intersect", "except"]):
        score += 2
    cols = re.findall(r"select\s+(distinct\s+)?(.+?)\s+from", s, re.DOTALL)
    if cols and cols[0][1].count(",") >= 1:
        score += 1
    for t, lab in zip([2, 5, 9], ["easy", "medium", "hard"]):
        if score <= t:
            return lab
    return "extra"


CASES = [
    "SELECT name FROM users WHERE id = 7",
    "select a, b from t order by a limit 5",
    "select x from t1 join t2 on t1.id = t2.id where x > 1 and y < 2 or z = 3",
    "select count(x) from t group by g having count(x) > 2 order by g",
    "select a from (select a from t) sub union select a from u",
    "select a, b from t1 join t2 on a = b join t3 on b = c where a in "
    "(select x from s) and b > 1 and c < 2 group by a, b having count(x) > 1 "
    "order by a limit 5 union select 1, 2 from v",
    "select cast(a as int), round(b) from t where a like '%x%'",
    "with t as (select a from x) select a from t where a = 1",
    "insert into t values (1)",
    "",
    "select distinct a, b,\nc from multi_line",
]


def test_difficulty_matches_reference_kernel(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i long, sql string")
    got = {
        r.i: r.d
        for r in df.select("i", sql_component_difficulty(F.col("sql")).alias("d")).collect()
    }
    for i, s in enumerate(CASES):
        assert got[i] == _hardness_kernel(s), f"case {i}: {s!r}"


def test_select_gate_matches_reference_strip_semantics(spark):
    rows = [
        (0, "SELECT 1", True),
        (1, "  with t as (select 1) select * from t", True),
        (2, "/* block */ select 2", True),
        (3, "-- line comment\nselect 3", True),  # newline after strip — Python .strip() semantics
        (4, "update t set x = 1", False),
        (5, "/* only a comment */", False),
        (6, None, False),
    ]
    df = spark.createDataFrame([(i, s) for i, s, _ in rows], "i long, sql string")
    got = {r.i: r.k for r in df.select("i", is_select_sql(F.col("sql")).alias("k")).collect()}
    for i, _, want in rows:
        assert got[i] == want, f"case {i}"


def test_execution_filter_duckdb_and_sqlite(spark):
    rows = [
        (0, "select 1 + 1"),            # valid
        (1, "select from nowhere"),     # parse error
        (2, "select * from missing_t"), # binder error
        (3, "delete from t"),           # gate-reject
        (4, "with c as (select 2 as v) select v from c"),  # valid
    ]
    df = spark.createDataFrame(rows, "i long, sql string")
    kept = sorted(r.i for r in sql_execution_filter(df, "sql").collect())
    assert kept == [0, 4]

    # db_factory path: real tables in sqlite make the binder query valid
    def sqlite_factory():
        import sqlite3

        con = sqlite3.connect(":memory:")
        con.execute("CREATE TABLE missing_t (a int)")
        return con

    kept2 = sorted(
        r.i for r in sql_execution_filter(df, "sql", db_factory=sqlite_factory).collect()
    )
    assert kept2 == [0, 2, 4]


def test_difficulty_fuzz_batch(spark):
    """300 seeded random SQL-ish strings (token soup incl. edge tokens the
    scorer keys on) through Catalyst vs the kernel in one Spark pass."""
    import random

    rng = random.Random(73)
    pool = (
        "select from where and or join ( ) , * a b c t1 t2 group by having "
        "order limit union intersect except cast round substring date coalesce "
        "in exists like distinct with as = > < 1 2 'x' \n \t -- /* */"
    ).split(" ")
    cases = [
        " ".join(rng.choice(pool) for _ in range(rng.randrange(0, 30)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "i long, sql string"
    )
    got = {
        r.i: r.d
        for r in df.select(
            "i", sql_component_difficulty(F.col("sql")).alias("d")
        ).collect()
    }
    for i, s in enumerate(cases):
        assert got[i] == _hardness_kernel(s), f"case {i}: {s!r}"


def test_pipeline_sql_step(spark):
    from dataflow_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f")], "doc_id long, text string"
    )
    pipe = (
        Pipeline(initial_keys=["doc_id", "text"])
        .sql(
            "SELECT doc_id, size(split(text, ' ')) AS n_words FROM t",
            input_keys=["doc_id", "text"],
            output_keys=["n_words"],
        )
        .compile()
    )
    out = {r.doc_id: r.n_words for r in pipe.run(df).collect()}
    assert out == {1: 3, 2: 2, 3: 1}


def test_entry_queries_deterministic(spark):
    """The pinned-template corpus construction is stable across runs."""
    from dataflow_spark.entry_queries import build_queries

    q = build_queries()["sql_component_classify"]
    a = q(spark, "/root/testdata/sf0.001").toPandas().sort_values("doc_id")
    b = q(spark, "/root/testdata/sf0.001").toPandas().sort_values("doc_id")
    assert a.equals(b)


def test_difficulty_fuzz_duckdb():
    """The driver-oracle transcription (_duck_sql_difficulty) against the
    sequential kernel on the same seeded token soup."""
    import random

    import duckdb
    import pandas as pd

    from dataflow_spark.entry_queries import _duck_sql_difficulty

    rng = random.Random(74)
    pool = (
        "select from where and or join ( ) , * a b t1 t2 group by having "
        "order limit union intersect except cast round substring date coalesce "
        "in exists like distinct with as = 1 'x' \n -- /* */"
    ).split(" ")
    cases = [
        " ".join(rng.choice(pool) for _ in range(rng.randrange(0, 30)))
        for _ in range(300)
    ]
    con = duckdb.connect()
    con.register("c", pd.DataFrame({"sql": cases}))
    duck = con.execute(
        f"SELECT {_duck_sql_difficulty('lower(sql)')} AS d FROM c"
    ).df()["d"].tolist()
    for i, s in enumerate(cases):
        assert duck[i] == _hardness_kernel(s), f"case {i}: {s!r}"


def test_text2sql_prompt_template_and_sanitization(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from dataflow_spark.operators.text2sql import PROMPT_TEMPLATE, text2sql_prompt

    schemas = spark.createDataFrame(
        pd.DataFrame(
            {"db_id": ["shop_db", "hr"], "ddl": ["CREATE TABLE a (x INT);", "CREATE TABLE b (y INT);"]}
        )
    )
    rows = spark.createDataFrame(
        pd.DataFrame(
            {
                "q": ["how many rows", "who is newest"],
                # 'shop-db!' sanitizes to 'shopdb' (NO schema); 'h\nr' -> 'hr'
                "db": ["shop-db!", "h\nr"],
            }
        )
    )
    got = {
        r["db"]: r["prompt"]
        for r in text2sql_prompt(rows, "q", "db", schemas).collect()
    }
    # unmatched (sanitized-away) db id -> NULL prompt
    assert got["shop-db!"] is None
    want = PROMPT_TEMPLATE.replace("{schema}", "CREATE TABLE b (y INT);").replace(
        "{question}", "who is newest"
    )
    assert got["h\nr"] == want
