"""Reasoning judger/filters: math parse-verify grammar, token cap, and
the text2sql execution-match core."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataflow_spark.operators.reasoning import (
    answer_judger_math,
    answer_token_length_filter,
)


CASES = [
    # (answer, gt, expect)
    ("42", "42", True),
    ("42", "43", False),
    ("\\boxed{42}", "42", True),
    ("\\boxed{42}.", "$42", True),
    ("84/2", "42", True),
    ("\\frac{84}{2}", "42.0", True),
    ("50%", "0.5", True),
    ("50%", "50", False),
    ("1,234", "1234", True),
    ("3.14", "3.14000", True),
    ("1/3", "0.3333", False),  # tolerance is tight, not sloppy
    ("Paris", "paris", True),
    ("Paris", "London", False),
    ("1/0", "2/0", False),  # zero denominators parse NULL → string compare
    ("", "", True),
    ("x42", "42", False),  # non-numeric vs numeric → string compare fails
]


def test_math_judger_grammar(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [(i, a, g) for i, (a, g, _) in enumerate(CASES)],
            columns=["i", "answer", "gt"],
        )
    )
    got = {
        r["i"]: r["answer_match"]
        for r in answer_judger_math(df, "answer", "gt").collect()
    }
    for i, (a, g, expect) in enumerate(CASES):
        assert got[i] == expect, (a, g, expect)


def test_answer_token_length_filter(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": [0, 1, 2], "t": ["short", "x" * 100, "y" * 500]})
    )
    kept = {r["i"] for r in answer_token_length_filter(df, "t", 30).collect()}
    assert kept == {0, 1}  # ceil(500/4)=125 > 30


def test_answer_pipeline_root_branches(spark):
    """GT backfill + branch split: explicit GT passes through, missing GT
    is extracted from the answer (boxed else last number), unextractable
    rows route to the without-GT branch with gt nulled."""
    from dataflow_spark.operators.reasoning import answer_pipeline_root

    rows = [
        (0, "whatever 7", "given-gt"),       # explicit GT wins
        (1, "compute: 3 + 4 = 7", ""),       # extract last number → '7'
        (2, "\\boxed{42} obviously 9", None),  # boxed beats last number
        (3, "no numbers at all", None),       # unextractable → without
        (4, "", "  "),                        # '  ' is non-empty → with (reference != '' check)
        (5, None, None),                      # nothing → without
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["i", "answer", "gt"])
    )
    w, wo = answer_pipeline_root(df, "answer", "gt")
    got_w = {r["i"]: r["gt"] for r in w.collect()}
    got_wo = {r["i"]: r["gt"] for r in wo.collect()}
    assert got_w == {0: "given-gt", 1: "7", 2: "42", 4: "  "}
    assert got_wo == {3: None, 5: None}


def test_sql_execution_match_verdicts(spark):
    from dataflow_spark.operators.text2sql import sql_execution_match

    rows = [
        (0, "select 1 + 1", "select 2", True),
        (1, "select 5 as a", "select 5", True),  # names ignored
        (2, "select 1 union all select 2", "select 2 union all select 1", True),
        (3, "select 1", "select 2", False),
        (4, "select broken +", "select 1", False),
        (5, "select 1", "select nope_fn(1)", False),
        (6, "select null", "select null", True),
        (7, "select 1, 'a'", "select 1, 'b'", False),
    ]
    df = spark.createDataFrame(
        pd.DataFrame([(i, p, g) for i, p, g, _ in rows], columns=["i", "p", "g"])
    )
    got = {r["i"]: r["exec_match"] for r in sql_execution_match(df, "p", "g").collect()}
    for i, _p, _g, expect in rows:
        assert got[i] == expect, i
