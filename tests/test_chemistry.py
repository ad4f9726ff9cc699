"""Chemistry domain: deterministic SMILES extraction / validation /
subset equivalence (operators/chemistry.py) and the speech/VQA stand-ins
over real mapInPandas plumbing (operators/multimodal.py)."""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from dataflow_spark.operators.chemistry import (
    extract_smiles,
    smiles_equivalent,
    smiles_normalize,
    smiles_structurally_valid,
)
from dataflow_spark.operators.multimodal import speech_to_text, vqa_answer

VALID = [
    "CC(=O)Oc1ccccc1C(=O)O",   # aspirin
    "C1CCCCC1",                # cyclohexane
    "N[C@@H](C)C(=O)O",        # L-alanine
    "[Na+].[Cl-]",             # salt
    "c1ccc2ccccc2c1",          # naphthalene (two ring labels, paired)
    "C/C=C\\C(=O)O",           # stereo bonds
]
INVALID = [
    "CC((O",                   # paren never closes + nested open
    "CC)O(C",                  # close before open
    "C1CCCC",                  # unpaired ring digit
    "C[[N]]O",                 # nested brackets
    "C[NH2",                   # unclosed bracket
    "hello",                   # no structure chars
    "a=b",                     # too short
    "no-smiles-here",          # word with hyphen, no structure
]


def test_structural_validator(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"tok": VALID + INVALID})
    ).withColumn("ok", smiles_structurally_valid("tok"))
    got = {r["tok"]: r["ok"] for r in df.collect()}
    for t in VALID:
        assert got[t], f"valid rejected: {t}"
    for t in INVALID:
        assert not got[t], f"invalid accepted: {t}"


def test_validator_plan_is_native(spark):
    df = spark.createDataFrame(pd.DataFrame({"tok": VALID})).withColumn(
        "ok", smiles_structurally_valid("tok")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_extract_smiles_from_text(spark):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "aspirin is CC(=O)Oc1ccccc1C(=O)O in water",
                "malformed CC((O and short a=b only",
                None,
            ],
        }
    )
    got = extract_smiles(spark.createDataFrame(docs), "doc_id").collect()
    assert [(r["doc_id"], r["smiles"]) for r in got] == [
        (1, "CC(=O)Oc1ccccc1C(=O)O")
    ]


def test_smiles_subset_equivalence(spark):
    pairs = pd.DataFrame(
        {
            "a": ["C[C@H](N)C(=O)O", "[C]1CCCCC1", "CCO", "C/C=C/C"],
            "b": ["CC(N)C(=O)O", "C1CCCCC1", "OCC", "CC=CC"],
        }
    )
    df = spark.createDataFrame(pairs)
    got = df.select(smiles_equivalent(df, "a", "b").alias("e")).toPandas()["e"].tolist()
    # stereo stripped / unbracketed plain atom / conservative reorder / bonds
    assert got == [True, True, False, True]
    # normalization is idempotent
    n1 = df.select(smiles_normalize("a").alias("n")).toPandas()["n"]
    n2 = (
        df.select(smiles_normalize("a").alias("n"))
        .select(smiles_normalize("n").alias("n"))
        .toPandas()["n"]
    )
    assert n1.tolist() == n2.tolist()


def _assets(spark):
    pdf = pd.DataFrame(
        {
            "asset_id": [0, 1, 2],
            "payload": [b"hello audio", b"", b"\x00\xff binary \x01"],
            "question": [
                "is the speaker visible",
                "is it a cat",
                "what colour dominates",
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_speech_to_text_stub(spark):
    got = speech_to_text(_assets(spark)).orderBy("asset_id").collect()
    assert len(got) == 3
    for r, payload in zip(got, [b"hello audio", b"", b"\x00\xff binary \x01"]):
        words = r["transcript"].split()
        assert len(words) == r["n_words"] == 8
        assert all(len(w) == 4 and w.isalpha() for w in words)
        # deterministic: derived from the payload md5
        hx = hashlib.md5(payload).hexdigest()
        assert r["transcript"].replace(" ", "") == hx.translate(
            str.maketrans("0123456789", "aeioubcdfg")
        )
        assert r["duration_s"] == len(payload) / 16000.0


def test_vqa_stub(spark):
    got = {r["asset_id"]: r["answer"] for r in vqa_answer(_assets(spark)).collect()}
    # keyword = first word longer than 3 chars
    assert got[0].startswith("the speaker is ")
    assert got[1].startswith("the it is ")  # no word >3 chars -> default
    assert got[2].startswith("the what is ")
    # answer token is the payload digest's head — stable across runs
    again = {r["asset_id"]: r["answer"] for r in vqa_answer(_assets(spark)).collect()}
    assert got == again


def test_smiles_validator_fuzz_vs_sequential(spark):
    """Property fuzz: the Catalyst fold validator must agree with a
    direct sequential Python transcription of the same subset rules on
    arbitrary char soup from the SMILES alphabet."""
    import random
    import re

    def ref_valid(tok: str) -> bool:
        if len(tok) < 5:
            return False
        if not re.fullmatch(r"[A-Za-z0-9@+\-\[\]()=#$%/\\.:]+", tok):
            return False
        if not re.search(r"[()=#\[\]0-9]", tok) or not re.search(
            r"[BCNOPSFIbcnops]", tok
        ):
            return False
        p = b = 0
        for ch in tok:
            if ch == "(":
                p += 1
            elif ch == ")":
                p -= 1
            elif ch == "[":
                b += 1
            elif ch == "]":
                b -= 1
            if p < 0 or b < 0 or b > 1:
                return False
        if p != 0 or b != 0:
            return False
        nobr = re.sub(r"\[[^\]]*\]", "", tok)
        return all(nobr.count(d) % 2 == 0 for d in "123456789")

    rng = random.Random(42)
    alphabet = "CCCNNOScco123()[]=#@+-.\\/%$:"
    toks = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 18)))
        for _ in range(400)
    ] + VALID + INVALID
    df = spark.createDataFrame(pd.DataFrame({"tok": toks})).withColumn(
        "ok", smiles_structurally_valid("tok")
    )
    got = [(r["tok"], r["ok"]) for r in df.collect()]
    for tok, ok in got:
        assert ok == ref_valid(tok), f"mismatch on {tok!r}: spark={ok}"


def test_fold_freezes_on_deep_violation(spark):
    """r6 ADVICE item: a token with >50 unmatched close-parens used to
    drive the packed fold accumulator negative, where Spark's truncating
    div/mod and DuckDB's flooring // and % are not pinned to agree. The
    fold now freezes at the 505001 sentinel on the first violation, so
    the accumulator never goes negative and both engines must reject
    such degenerate tokens identically."""
    import duckdb

    from dataflow_spark.entry_queries import _SM_FOLD
    from dataflow_spark.operators.chemistry import _BROKEN, _INIT, _fold_step

    deep = [
        ")" * 60 + "C1CC1",            # 60 unmatched closers, then valid tail
        "C" + ")" * 55 + "CCO",        # closers mid-token
        "(" * 3 + ")" * 60 + "CCN1",   # recovers past -50 then keeps folding
        "]" * 52 + "C1CC1",            # bracket-depth excursion
    ]
    df = spark.createDataFrame(pd.DataFrame({"tok": deep})).select(
        "tok",
        smiles_structurally_valid("tok").alias("ok"),
        F.aggregate(
            F.split("tok", ""),
            F.lit(_INIT),
            lambda acc, ch: F.when(ch == "", acc).otherwise(_fold_step(acc, ch)),
        ).alias("fold"),
    )
    got = {r["tok"]: (r["ok"], r["fold"]) for r in df.collect()}
    con = duckdb.connect()
    for t in deep:
        duck_fold = con.execute(
            f"SELECT {_SM_FOLD} FROM (SELECT ? AS tok)", [t]
        ).fetchone()[0]
        ok, spark_fold = got[t]
        assert ok is False, f"degenerate token accepted: {t!r}"
        assert spark_fold == _BROKEN == duck_fold, (
            f"fold mismatch on {t!r}: spark={spark_fold} duck={duck_fold}"
        )
