"""Batch sources/sinks — the FileStorage analogue.

Reference: FileStorage.read/write handles json/jsonl/csv/parquet/pickle
(/root/reference/dataflow/utils/storage.py:124-135, 264-275) plus remote
hf:/ms: datasets, and cleans invalid unicode surrogates on write
(storage.py:212-277). Spark-side: format inference from the extension,
surrogate cleaning as a native regexp, no pickle (no Spark analogue) and
no remote hubs (no network here — the seam is this function).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMATS = {
    ".json": "json",
    ".jsonl": "json",
    ".csv": "csv",
    ".parquet": "parquet",
}


def _fmt(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext in _FORMATS:
        return _FORMATS[ext]
    if ext in (".pkl", ".pickle"):
        raise ValueError("pickle has no distributed reader — convert to parquet")
    return "parquet"


def read_any(spark: SparkSession, path: str, schema=None) -> DataFrame:
    fmt = _fmt(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        return reader.option("header", "true").option("inferSchema", schema is None).csv(path)
    if fmt == "json":
        return reader.json(path)
    return reader.parquet(path)


def clean_surrogates(c) -> "F.Column":
    """Strip unpaired UTF-16 surrogate codepoints (FileStorage.write's
    invalid-unicode cleaning, storage.py:231-247) — native regexp."""
    return F.regexp_replace(c, "[\\x{D800}-\\x{DFFF}]", "")


def write_any(df: DataFrame, path: str, mode: str = "overwrite", clean_text_cols=()) -> None:
    for col in clean_text_cols:
        df = df.withColumn(col, clean_surrogates(F.col(col)))
    fmt = _fmt(path)
    w = df.write.mode(mode)
    if fmt == "csv":
        w.option("header", "true").csv(path)
    elif fmt == "json":
        w.json(path)
    else:
        w.parquet(path)


def micro_batch_apply(df: DataFrame, fn, schema, batch_size: int = 10_000) -> DataFrame:
    """BatchWrapper analogue (wrapper/batch_wrapper.py:42-98): run ``fn``
    (pandas DataFrame -> pandas DataFrame) over size-bounded Arrow batches.
    Unlike the reference there is no index-merge step — each batch maps to
    output rows directly inside one distributed stage."""

    def runner(batches):
        import pandas as pd

        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            while len(pdf) >= batch_size:
                yield fn(pdf.iloc[:batch_size])
                pdf = pdf.iloc[batch_size:].reset_index(drop=True)
            carry = pdf
        if carry is not None and len(carry):
            yield fn(carry)

    return df.mapInPandas(runner, schema=schema)
