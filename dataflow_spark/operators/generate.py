"""Deterministic generator-shaped operators.

The reference's generators are LLM-backed (PromptedGenerator
core_text/generate/prompted_generator.py:10,50; PretrainGenerator; …). The
engine preserves their SHAPE — add a generated column / convert formats /
emit synthetic rows — with deterministic kernels, per the north star.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def prompted_template(df: DataFrame, template: str, out_col: str = "generated") -> DataFrame:
    """PromptedGenerator stand-in: fill ``{col}`` slots of a template from
    row columns (format_string — pure Catalyst). The LLM-call seam is this
    column; swapping in a real serving call is a mapInPandas drop-in."""
    import re

    slots = re.findall(r"\{(\w+)\}", template)
    fmt = re.sub(r"\{\w+\}", "%s", template)
    return df.withColumn(out_col, F.format_string(fmt, *[F.col(s) for s in slots]))


def pretrain_format_converter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PretrainFormatConverter (reasoning/generate/pretrain_format_convert.py:9):
    deterministic column mapping into the pretrain record shape."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("content"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias("content_len"),
        F.lit("pretrain").alias("format"),
    )


def _normalized_gram(df: DataFrame, vec_col: str, dim: int | None):
    """Distributed X^T X / n over unit-normalized rows: per-Arrow-batch
    outer-product partials (map-side combine), only d x d matrices reach
    the driver. Returns ``(gram ndarray | None, total_n)`` — the shared
    core of vendi_score / vendi_gram. Pass ``dim`` to avoid the fallback
    ``.first()`` probe job."""
    from pyspark.sql import types as T

    if dim is None:
        dim = len(df.select(vec_col).first()[0])

    def partials(batches):
        acc = np.zeros((dim, dim))
        n = 0
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].values).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(norms == 0, 1.0, norms)
            acc += mat.T @ mat
            n += len(pdf)
        yield pd.DataFrame({"g": [acc.reshape(-1).tolist()], "n": [n]})

    schema = T.StructType(
        [T.StructField("g", T.ArrayType(T.DoubleType())), T.StructField("n", T.LongType())]
    )
    parts = df.select(vec_col).mapInPandas(partials, schema=schema).collect()
    total_n = sum(r["n"] for r in parts)
    if total_n == 0:
        return None, 0
    gram = sum(np.array(r["g"]).reshape(dim, dim) for r in parts) / total_n
    return gram, total_n


def vendi_score(df: DataFrame, vec_col: str = "embedding", dim: int | None = None) -> float:
    """Whole-dataset diversity — Vendi score (eval/diversity/vendi_scorer.py:11):
    exp(Shannon entropy of the normalized similarity-kernel eigenvalues).

    Scale path: with L2-normalized rows X (n x d), the cosine Gram K/n has
    the same nonzero spectrum as X^T X / n (d x d), computed distributed by
    ``_normalized_gram`` — works at any row count."""
    gram, total_n = _normalized_gram(df, vec_col, dim)
    if total_n == 0:
        return 0.0
    eig = np.linalg.eigvalsh(gram)
    eig = eig[eig > 1e-12]
    eig = eig / eig.sum()
    entropy = -(eig * np.log(eig)).sum()
    return float(np.exp(entropy))


def vendi_gram(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """The driver-verifiable intermediate of the Vendi pipeline: exploded
    entries (i, j, g) of the normalized cosine Gram X^T X / n over
    unit-normalized rows — everything in ``vendi_score`` EXCEPT the final
    eigendecomposition, which is the one genuinely non-SQL step. A DuckDB
    oracle checks the d x d matrix exactly, so the distributed partial-sum
    machinery (the part that matters at scale) is independently verified.
    Pass ``dim`` — the fallback probe launches an extra driver job."""
    gram, total_n = _normalized_gram(df, vec_col, dim)
    spark = df.sparkSession
    if total_n == 0:
        return spark.createDataFrame([], "i int, j int, g double")
    rows = [
        (i + 1, j + 1, float(gram[i, j])) for i in range(len(gram)) for j in range(len(gram))
    ]
    out = spark.createDataFrame(rows, "i int, j int, g double")
    return out.select("i", "j", F.round("g", 6).alias("g"))
