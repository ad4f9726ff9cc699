"""Explicit schemas for the engine's tables.

The primary table is ``transcripts`` — multi-turn conversation / agent
transcripts, one row per turn, exactly the shape mandated by
BASELINE.json ``input_hint``. ``(conv_id, turn_idx)`` is the unique /
idempotency key and the stable global order key every order-dependent
operator (first-wins dedup, conversation assembly) is defined against.
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),  # user|assistant|tool
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),  # tool name when role='tool'
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Assembled-conversation shape (reference conversation assembly output:
# /root/reference/dataflow/operators/conversations/consistent_chat.py:116-132
# — ordered role/value list, never ending on a user turn).
CONVERSATION = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField(
            "conversation",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("role", T.StringType(), False),
                        T.StructField("value", T.StringType(), True),
                    ]
                )
            ),
            False,
        ),
        T.StructField("n_turns", T.IntegerType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
    ]
)

# Multimodal documents: opaque binary payload + typed metadata
# (image/audio/video are binary columns; decode runs in mapInPandas).
MULTIMODAL = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)
