"""Refiner parity: Spark (native AND pandas_udf) vs pinned reference
kernels, byte-for-byte under (conv_id, turn_idx) ordering."""

import pytest

from dataflow_spark.functions.refiners import REFINERS, apply_refiner
from tests import reference_kernels as RK

CHECKED = {
    "remove_extra_spaces": RK.remove_extra_spaces,
    "lowercase": RK.lowercase,
    "remove_emoji": RK.remove_emoji,
    "remove_html_url": RK.remove_html_url,
}


def _run(spark_df, name, mode):
    out = (
        apply_refiner(spark_df, name, mode=mode)
        .select("rid", "text")
        .toPandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    return out["text"].tolist()


@pytest.mark.parametrize("name", sorted(CHECKED))
@pytest.mark.parametrize("mode", ["native", "parity"])
def test_refiner_matches_reference(corpus_df, corpus_pdf, name, mode):
    expected = CHECKED[name](corpus_pdf["text"].tolist())
    got = _run(corpus_df, name, mode)
    assert got == expected


@pytest.mark.parametrize("name", sorted(REFINERS))
def test_native_equals_parity(corpus_df, name):
    a = _run(corpus_df, name, "native")
    b = _run(corpus_df, name, "parity")
    assert a == b


def test_null_text_stays_null(spark):
    rows = [("c", 0, "user", None, "", None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    for name in REFINERS:
        out = apply_refiner(df, name, mode="parity").select("text").first()[0]
        assert out is None, name
