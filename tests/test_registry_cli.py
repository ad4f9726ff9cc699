"""Operator registry lookup + CLI surface."""

import pytest

from dataflow_spark.registry import get_operator, list_operators


def test_registry_covers_families():
    names = list_operators()
    assert sum(n.startswith("refine.") for n in names) >= 16
    # 22 reference heuristics + the r7 Gopher repetition rules
    assert sum(n.startswith("filter.") for n in names) >= 25
    assert {"dedup.exact", "dedup.minhash", "retrieve.bm25",
            "ann.bruteforce", "select.kcenter", "split.chars"} <= set(names)


def test_get_operator_applies(spark):
    op = get_operator("refine.lowercase")
    df = spark.createDataFrame([(0, "ABC")], "doc_id long, text string")
    assert op(df).first().text == "abc"


def test_unknown_operator_suggests():
    with pytest.raises(KeyError, match="refine.lowercase"):
        get_operator("refine.lowercase_typo")


def test_cli_list_ops(capsys):
    from dataflow_spark.cli import main

    assert main(["list-ops"]) == 0
    out = capsys.readouterr().out
    assert "dedup.minhash" in out and "filter.word_number" in out
