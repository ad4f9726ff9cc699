"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode libraries (PIL/ffmpeg/librosa) are not in this container, so the
decode step is a clearly-marked deterministic fake behind the same
``mapInPandas`` plumbing a real decoder would use — schema, Arrow batch
shape, partitioning and UDF signatures are real and tested; only the
bytes→pixels step is stubbed (mirrors the reference's binary ingestion
boundary, knowledge_cleaning/generate/file_or_url_to_markdown_converter.py:150).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_sha", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
        T.StructField("frames_sampled", T.IntegerType(), True),
    ]
)


def _decode_stub(payload: bytes, modality: str) -> np.ndarray:
    """STUB decoder: a real implementation would decode image/audio bytes.

    Deterministic fake: derive a fixed-length float feature from the
    byte content (so tests are stable and the Arrow plumbing is exercised
    with realistic shapes). Raises for unknown modalities like a real
    decoder would.
    """
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for modality {modality!r}")
    h = hashlib.sha256(payload).digest()
    vals = struct.unpack(">8Q", h[:64].ljust(64, b"\0"))
    return (np.array(vals, dtype=np.float64) % 1000) / 1000.0


def extract_features(df: DataFrame, frame_stride: int = 10) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: one Arrow batch of (asset_id, modality, payload) in →
    one batch of FEATURE_SCHEMA out. ``frames_sampled`` fakes video frame
    sampling (n_bytes // (1000*stride)) to exercise the metadata path.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(lambda b: b if b is not None else b"")
            feats = [
                _decode_stub(b, m).tolist()
                for b, m in zip(payloads, pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "content_sha": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": feats,
                    "frames_sampled": (
                        payloads.map(len) // (1000 * frame_stride)
                    ).astype("int32"),
                }
            )

    return df.select("asset_id", "modality", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def synth_assets(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake binary assets — the test corpus for the
    multimodal plumbing. Payload bytes are md5-arithmetic (length =
    256 + md5int('len:seed:i') % 4096; content = md5-hex chunk stream
    truncated to that length, ASCII bytes): exactly SQL-replayable, so
    the multimodal_features query has an exact DuckDB oracle — the
    binary column, Arrow batches and decoder plumbing neither know nor
    care that the fake bytes happen to be ASCII."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        length = 256 + int(
            hashlib.md5(f"len:{seed}:{i}".encode()).hexdigest()[:8], 16
        ) % 4096
        chunks: list[str] = []
        j = 0
        while 32 * len(chunks) < length:
            chunks.append(hashlib.md5(f"pay:{seed}:{i}:{j}".encode()).hexdigest())
            j += 1
        payload = "".join(chunks)[:length].encode("ascii")
        rows.append((i, modality, bytearray(payload), f"{modality}/fake"))
    pdf = pd.DataFrame(rows, columns=["asset_id", "modality", "payload", "mime"])
    return spark.createDataFrame(pdf)


SPEECH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("transcript", T.StringType(), False),
        T.StructField("n_words", T.IntegerType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
    ]
)

# md5 hex digits → letters, so the fake transcript reads as words; the
# SAME translate table is replayed by the DuckDB oracle
_HEX2ALPHA = str.maketrans("0123456789", "aeioubcdfg")


def _fake_transcript(payload: bytes) -> str:
    """STUB speech decoder (reference core_speech
    speech2text_generator.py:16 runs a served ASR model): deterministic
    md5-derived pseudo-words — one 4-char word per 4 hex digits. The
    derivation is expressible in SQL, so the full mapInPandas path gets
    an exact oracle; a real ASR drops in behind the same signature."""
    hx = hashlib.md5(payload).hexdigest().translate(_HEX2ALPHA)
    return " ".join(hx[i : i + 4] for i in range(0, len(hx), 4))


def speech_to_text(df: DataFrame, sample_rate: int = 16_000) -> DataFrame:
    """Arrow-batched speech→text over (asset_id, payload) binary rows:
    real mapInPandas plumbing, stubbed decode (no ASR model in this
    container). ``duration_s`` treats the payload as 8-bit mono PCM at
    ``sample_rate`` — metadata-path realism for a fake decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "transcript": payloads.map(_fake_transcript),
                    "n_words": 8,
                    "duration_s": (payloads.map(len) / float(sample_rate)),
                }
            )

    return df.select("asset_id", "payload").mapInPandas(run, schema=SPEECH_SCHEMA)


VQA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("question", T.StringType(), False),
        T.StructField("answer", T.StringType(), False),
    ]
)


def vqa_answer(df: DataFrame) -> DataFrame:
    """PromptedVQAGenerator stand-in (reference core_vision
    prompted_vqa_generator.py:9 — a served VLM): deterministic template
    answer keyed on the question's first content word (>3 chars,
    lowercased) and the image payload's md5-derived token. Real
    mapInPandas plumbing over (asset_id, payload, question); the
    derivation is SQL-replayable for the exact oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
            toks = payloads.map(
                lambda b: hashlib.md5(b).hexdigest().translate(_HEX2ALPHA)[:4]
            )
            kws = pdf["question"].map(
                lambda q: next(
                    (w.lower() for w in (q or "").split() if len(w) > 3), "it"
                )
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "question": pdf["question"],
                    "answer": [
                        f"the {k} is {t}" for k, t in zip(kws, toks)
                    ],
                }
            )

    return df.select("asset_id", "payload", "question").mapInPandas(
        run, schema=VQA_SCHEMA
    )
