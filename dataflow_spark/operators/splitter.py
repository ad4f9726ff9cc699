"""Corpus text splitter — chunk long documents into rows.

Reference: CorpusTextSplitter (knowledge_cleaning/generate/
corpus_text_splitter.py:19-144) supports token/sentence/recursive chunking
with overlap. Engine semantics (pinned):

* ``char``   — fixed-size character windows with overlap;
* ``word``   — fixed-size whitespace-token windows with overlap;
* ``sentence`` — greedy packing of regex sentences up to chunk_size chars.

UDTF shape: one input row → N output rows (chunk_idx, chunk). The char and
word modes are pure Catalyst (sequence + substring / slice — explode stays
JVM-side); sentence mode packs inside an Arrow pandas_udf.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataflow_spark.functions.text import SENTENCE_REGEX


def split_chars(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 200,
    overlap: int = 20,
) -> DataFrame:
    """Character-window chunking, fully native."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    cc = F.coalesce(F.col(text_col), F.lit(""))
    n_chunks = F.greatest(
        F.ceil((F.length(cc) - F.lit(overlap)).cast("double") / step).cast("int"),
        F.lit(1),
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(starts, lambda i: F.substring(cc, i * step + 1, chunk_size))
    out = df.select(
        *df.columns, F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    return out.filter(F.col("chunk") != "").drop(text_col)


def split_words(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 50,
    overlap: int = 5,
) -> DataFrame:
    """Token-window chunking, fully native (slice over the token array)."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"), lambda x: x != ""
    )
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - F.lit(overlap)).cast("double") / step).cast("int"),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * step + 1, chunk_size), " "),
    )
    out = df.select(*df.columns, F.posexplode(chunks).alias("chunk_idx", "chunk"))
    return out.filter(F.col("chunk") != "").drop(text_col)


_SENT = re.compile(SENTENCE_REGEX)


def split_sentences_udf(chunk_size: int = 200):
    """Greedy sentence packing: emit chunks of whole sentences, each chunk
    <= chunk_size chars (a single over-long sentence becomes its own chunk)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(s: pd.Series) -> pd.Series:
        def pack(v: str) -> list[str]:
            sents = _SENT.findall(v or "")
            chunks: list[str] = []
            cur = ""
            for sent in sents:
                if cur and len(cur) + len(sent) > chunk_size:
                    chunks.append(cur)
                    cur = sent
                else:
                    cur = cur + sent if cur else sent
            if cur:
                chunks.append(cur)
            return chunks

        return s.map(pack)

    return _udf


def split_sentences(
    df: DataFrame, text_col: str = "text", chunk_size: int = 200
) -> DataFrame:
    chunks = split_sentences_udf(chunk_size)(F.col(text_col))
    out = df.select(*df.columns, F.posexplode(chunks).alias("chunk_idx", "chunk"))
    return out.drop(text_col)
