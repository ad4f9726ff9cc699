"""Corpus-wide first-wins line dedup (operators/dedup.py
dedup_lines_global)."""

from dataflow_spark.operators.dedup import dedup_lines_global


def _get(df, doc_id):
    r = [x for x in df.collect() if x.doc_id == doc_id]
    return r[0].text if r else None


def test_line_dedup_first_wins_and_reassembly(spark):
    boiler = "accept our cookie policy to continue"
    rows = [
        (1, f"alpha beta gamma delta\n{boiler}\nunique one here"),
        (2, f"{boiler}\nsecond doc body line text"),
        (3, f"third doc body line text\n{boiler}"),
        (4, boiler),                      # every line loses -> doc dropped
        (5, "a\n\nb"),                    # short + blank lines exempt
        (6, None),                        # null -> one empty line, kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_lines_global(df, min_chars=10)
    # boilerplate survives only in its first occurrence (doc 1, pos 1)
    assert _get(out, 1) == rows[0][1]
    assert _get(out, 2) == "second doc body line text"
    assert _get(out, 3) == "third doc body line text"
    assert _get(out, 4) is None          # all lines were losing dups
    assert _get(out, 5) == "a\n\nb"      # short lines never deduped
    assert _get(out, 6) == ""


def test_line_dedup_within_doc_and_order(spark):
    rows = [
        (1, "repeated internal line x\nmiddle filler line y\nrepeated internal line x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_lines_global(df, min_chars=10)
    # second occurrence inside the SAME doc also loses; order preserved
    assert _get(out, 1) == "repeated internal line x\nmiddle filler line y"


def test_substring_dedup_first_wins(spark):
    from dataflow_spark.operators.dedup import dedup_substrings_global

    run = "a b c d e"  # k=5 run shared verbatim
    rows = [
        (1, f"x1 x2 {run} y1 y2"),        # first occurrence -> intact
        (2, f"p1 {run} q1"),              # later -> run cut
        (3, run),                          # fully covered -> doc dropped
        (4, "a b c d"),                    # < k tokens -> uncut
        (5, None),                         # null -> no tokens -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in dedup_substrings_global(df, k=5).collect()}
    assert out[1] == f"x1 x2 {run} y1 y2"
    assert out[2] == "p1 q1"
    assert 3 not in out
    assert out[4] == "a b c d"
    assert 5 not in out


def test_substring_dedup_overlapping_runs(spark):
    from dataflow_spark.operators.dedup import dedup_substrings_global

    # doc 2 repeats a 6-token run: BOTH its k=5 windows lose, covering
    # all 6 positions of the run
    rows = [
        (1, "t1 t2 t3 t4 t5 t6"),
        (2, "u1 t1 t2 t3 t4 t5 t6 u2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in dedup_substrings_global(df, k=5).collect()}
    assert out[1] == "t1 t2 t3 t4 t5 t6"
    assert out[2] == "u1 u2"


def test_paragraph_dedup_blank_line_granularity(spark):
    """dedup_lines_global with a blank-line delimiter dedups PARAGRAPHS:
    a repeated multi-line paragraph loses wholesale even though its
    individual lines also appear (untouched) elsewhere; short paragraphs
    are exempt; reassembly preserves paragraph order."""
    from dataflow_spark.operators.dedup import dedup_lines_global

    boiler = "subscribe to our newsletter\nall rights reserved"
    rows = [
        (1, f"real content paragraph one\n\n{boiler}"),
        (2, f"{boiler}\n\nother real content here"),      # boiler is a dup
        (3, "subscribe to our newsletter\n\nshort"),       # single LINE of
        # the boiler as its own paragraph: different string -> survives
        (4, boiler),                                       # only the dup -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.text
        for r in dedup_lines_global(
            df, "doc_id", "text", min_chars=20, newline="\n\n"
        ).collect()
    }
    assert out[1] == f"real content paragraph one\n\n{boiler}"
    assert out[2] == "other real content here"
    assert out[3] == "subscribe to our newsletter\n\nshort"  # <20 exempt tail
    assert 4 not in out
