"""Benchmark decontamination: Spark vs a sequential reference, plus the
broadcast-join plan shape (the 100-TB-side contract: the corpus never
shuffles on the n-gram key)."""

import pytest


def _seq_ngrams(text: str, n: int) -> set[str]:
    toks = [t for t in (text or "").lower().split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "completely unrelated text about distributed query engines"),
    (2, "THE QUICK BROWN FOX JUMPS OVER the lazy dog again"),  # case-folds in
    (3, "short text"),  # shorter than n — never contaminated
    (4, None),  # null text — never contaminated
    (5, "the quick brown fox jumps over a sleepy cat instead"),  # partial only
]
BENCH = [
    (100, "watch the quick brown fox jumps over the lazy dog forever"),
    (101, "benchmark answer about nothing in particular at all here"),
]
N = 8


def _seq_contaminated() -> dict[int, int]:
    bench_grams = set()
    for _, t in BENCH:
        bench_grams |= _seq_ngrams(t, N)
    out = {}
    for did, t in CORPUS:
        shared = _seq_ngrams(t, N) & bench_grams
        if shared:
            out[did] = len(shared)
    return out


def test_contaminated_docs_matches_sequential(spark):
    from dataflow_spark.operators.decontaminate import contaminated_docs

    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    got = {
        r.doc_id: r.n_shared_ngrams
        for r in contaminated_docs(corpus, bench, n=N).collect()
    }
    expected = _seq_contaminated()
    assert got == expected
    assert got, "fixture must actually contaminate something"
    assert 3 not in got and 4 not in got


def test_decontaminate_drops_exactly_contaminated(spark):
    from dataflow_spark.operators.decontaminate import (
        contaminated_docs,
        decontaminate,
    )

    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    kept = {r.doc_id for r in decontaminate(corpus, bench, n=N).collect()}
    dropped = {r.doc_id for r in contaminated_docs(corpus, bench, n=N).collect()}
    assert kept | dropped == {d for d, _ in CORPUS}
    assert kept & dropped == set()


def test_contamination_join_is_broadcast(spark):
    """The benchmark side must reach the join as a broadcast (the corpus
    side is the 100-TB side and must not shuffle on the gram key)."""
    from dataflow_spark.operators.decontaminate import contaminated_docs

    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    df = contaminated_docs(corpus, bench, n=N)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "BatchEvalPython" not in plan
