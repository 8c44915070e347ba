"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are treated as `binary` columns with a metadata
struct; decode / feature-extraction run as Arrow-batched Pandas UDFs
over mapInPandas, so each batch crosses the JVM↔Python boundary once.

The actual media decoding libraries (PIL/ffmpeg/...) are NOT available
in this environment, so the decode step is STUBBED: `decode_image`
raises NotImplementedError unless `fake=True`, in which case a
deterministic fake decoder (derived from the payload bytes) exercises
the full Spark plumbing — schema, batching, partitioning — for real.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image/audio/video
        StructField("meta", StructType([
            StructField("source", StringType(), True),
            StructField("declared_w", IntegerType(), True),
            StructField("declared_h", IntegerType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def _decode_image_real(payload: bytes):
    raise NotImplementedError(
        "real image decoding needs PIL/opencv — not available in this "
        "environment; pass fake=True for the deterministic stub decoder"
    )


def _decode_image_fake(payload: bytes):
    """Deterministic fake 'decode': dimensions derived from the digest."""
    d = hashlib.md5(payload).hexdigest()
    return int(d[:4], 16) % 1920 + 1, int(d[4:8], 16) % 1080 + 1


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas batch is processed vectorized-ish in one
    Python call; at scale, batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    decode = _decode_image_fake if fake else _decode_image_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )
            dims = payloads.map(lambda b: decode(b) if b is not None else (None, None))
            out["width"] = [d[0] for d in dims]
            out["height"] = [d[1] for d in dims]
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame sampling for video payloads (stub): emits one row per
    sampled frame index with a deterministic frame digest. Real frame
    extraction would replace the fake frame synthesizer; the exploded
    output shape and partition-preserving plumbing are real."""
    if not fake:
        raise NotImplementedError("real video decoding unavailable here")

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_digest", StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = max(1, len(payload) // 64)
                for idx in range(0, n_frames, every_n):
                    h = hashlib.md5(payload + idx.to_bytes(4, "little")).hexdigest()
                    rows.append((mid, idx, h))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_digest"])

    return df.mapInPandas(run, schema=schema)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as a binary payload column —
    lets the multimodal plumbing be exercised (and oracle-checked)
    against the text testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.col("source").alias("source"),
            F.lit(None).cast("int").alias("declared_w"),
            F.lit(None).cast("int").alias("declared_h"),
        ).alias("meta"),
    )
