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


def _py_math_value(s: str):
    """Sequential Python transcription of reasoning.math_answer_value —
    the fuzz reference. (?a): the engine's grammar is ASCII (Java and RE2
    \\d agree on that); Python's unicode \\d and float() would otherwise
    accept fullwidth digits the engine deliberately rejects."""
    import re

    s = s or ""
    m = re.search(r"\\boxed\{([^}]*)\}", s)
    if m and m.group(1) != "":
        s = m.group(1)
    s = re.sub(r"[$,]", "", s.strip()).strip()
    s = re.sub(r"\.$", "", s)
    for pat in (r"(?a)^\\frac\{(-?\d+)\}\{(-?\d+)\}$",
                r"(?a)^(-?\d+)\s*/\s*(-?\d+)$"):
        m = re.match(pat, s)
        if m:
            a, b = float(m.group(1)), float(m.group(2))
            return None if b == 0 else a / b
    m = re.match(r"(?a)^(-?\d+(?:\.\d+)?)%$", s)
    if m:
        return float(m.group(1)) / 100.0
    if re.match(r"(?a)^-?\d+(?:\.\d+)?$", s):
        return float(s)
    return None


def test_math_value_fuzz_vs_python(spark):
    """Randomized (seeded) answer strings through every grammar branch —
    Spark's parse must agree with the Python transcription exactly,
    including which strings parse at all."""
    import random

    from dataflow_spark.operators.reasoning import math_answer_value

    rnd = random.Random(99)
    pieces = ["42", "-7", "3.50", "1,234", "$99", "50%", "-12.5%", "84/2",
              "8 / 4", "1/0", "\\frac{9}{3}", "\\frac{1}{0}", "\\boxed{17}",
              "\\boxed{-2.5}", "\\boxed{}", "word", "x3", "3x", "", "  42  ",
              "42.", "..", "-", "4 2", "１２"]
    cases = []
    for _ in range(300):
        n = rnd.randint(1, 2)
        cases.append(" ".join(rnd.choice(pieces) for _ in range(n)))
    cases += pieces
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(cases)), "s": cases})
    )
    got = {
        r["i"]: r["v"]
        for r in df.select("i", math_answer_value(F.col("s")).alias("v")).collect()
    }
    for i, s in enumerate(cases):
        exp = _py_math_value(s)
        if exp is None:
            assert got[i] is None, (s, got[i])
        else:
            assert got[i] == pytest.approx(exp, abs=1e-12), (s, got[i], exp)


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
