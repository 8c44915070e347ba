"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are treated as `binary` columns with a metadata
struct; decode / feature-extraction run as Arrow-batched Pandas UDFs
over mapInPandas, so each batch crosses the JVM↔Python boundary once.

Decode is REAL for PNG images, PCM WAV audio, baseline+progressive
JPEG (operators/jpeg.py from the T.81 spec), and — round 4 — VIDEO in
the two formats honestly decodable without ffmpeg: YUV4MPEG2 and
MJPEG-in-AVI (`operators/video.py`; AVI frames decode through the
in-repo JPEG codec). `extract_real_features` routes payloads by magic
bytes and emits decoded dimensions / signal features / frame counts,
and `sample_frames(fake=False)` extracts REAL frames from video
payloads. Formats needing external codec libraries (H.264/...;
PIL/ffmpeg are not in this environment) still go through the STUBBED
path: `decode_image` raises NotImplementedError unless `fake=True`,
in which case a deterministic fake decoder (derived from the payload
bytes) exercises the full Spark plumbing — schema, batching,
partitioning — for real.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
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
    """Real decode for the formats the in-repo codecs cover (PNG via
    stdlib zlib, baseline JPEG via operators/jpeg.py); other image
    formats still need PIL/opencv."""
    from graphula_spark.operators.codecs import PNG_SIG, decode_png
    from graphula_spark.operators.jpeg import decode_jpeg

    if payload[: len(PNG_SIG)] == PNG_SIG:
        w, h, _c, _px = decode_png(payload)
        return w, h
    if payload[:2] == b"\xff\xd8":
        w, h, _c, _px = decode_jpeg(payload)
        return w, h
    raise NotImplementedError(
        "image format beyond PNG/baseline-JPEG needs PIL/opencv — not "
        "available in this environment; pass fake=True for the "
        "deterministic stub decoder"
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
    """Frame sampling for video payloads: one row per sampled frame.

    ``fake=False`` does REAL extraction — Y4M and MJPEG-AVI payloads
    decode through operators/video.py, and each sampled frame's digest
    is the md5 of its decoded pixel bytes (so two videos containing
    the same frame content dedup regardless of container); payloads in
    neither format yield no rows. ``fake=True`` keeps the
    deterministic stub (digest derived from payload bytes + index) for
    oracle-checkable plumbing tests. The exploded output shape and
    partition-preserving mapInPandas plumbing are identical either
    way."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_digest", StringType(), True),
        ]
    )

    def run_fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

    def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphula_spark.operators.video import (
            Y4M_MAGIC,
            decode_mjpeg_avi,
            decode_via_ffmpeg,
            decode_y4m,
            ffmpeg_available,
            is_avi,
        )

        # checked once per worker batch, not per payload
        have_ffmpeg = ffmpeg_available()
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                try:
                    if payload.startswith(Y4M_MAGIC):
                        _w, _h, _c, luma = decode_y4m(payload)
                        frames = list(luma)
                    elif is_avi(payload):
                        _w, _h, frames = decode_mjpeg_avi(payload)
                    elif have_ffmpeg:
                        # inter-frame codecs (H.264/VP9/AV1) route
                        # through the ffmpeg gate where the binary
                        # exists; same bytes-in/frames-out contract
                        _w, _h, _c, luma = decode_via_ffmpeg(payload)
                        frames = list(luma)
                    else:
                        continue
                except ValueError:
                    continue  # poison payloads must not kill the batch
                for idx in range(0, len(frames), every_n):
                    h = hashlib.md5(frames[idx].tobytes()).hexdigest()
                    rows.append((int(mid), idx, h))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_digest"])

    return df.mapInPandas(run_fake if fake else run_real, schema=schema)


def _widen_for_python(df: DataFrame) -> DataFrame:
    """Partitioning follows input BYTES but Python codec/feature work
    follows ROWS: a KB-sized documents file arrives as ONE partition,
    and every downstream mapInPandas then runs in ONE task no matter
    how many cores exist (round-14 sweep: a 3.9 s single-task stage
    inside mm_pipeline). Widen to the session's parallelism when the
    scan under-splits; an already-wide input (any real corpus) passes
    through untouched. repartition(N) with an explicit count is exempt
    from AQE coalescing, so the width survives into the exchange."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as a binary payload column —
    lets the multimodal plumbing be exercised (and oracle-checked)
    against the text testdata. Widened for the downstream Python
    stages (see _widen_for_python)."""
    return _widen_for_python(docs).select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.col("source").alias("source"),
            F.lit(None).cast("int").alias("declared_w"),
            F.lit(None).cast("int").alias("declared_h"),
        ).alias("meta"),
    )


REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("detected", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_pixel", DoubleType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("max_amp", IntegerType(), True),
        StructField("n_zero_cross", IntegerType(), True),
        StructField("vid_frames", IntegerType(), True),
    ]
)


def synthesize_real_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL media payloads from document rows, cycling by
    doc_id % 4: actual PNG images (grayscale, w = id%64+1, h = id%48+1,
    constant pixel id%256), actual PCM-16 WAV files (8 kHz square wave,
    period 8, amplitude 1000, n = id%500+100 samples), actual baseline
    JPEGs (flat gray w = id%40+1, h = id%32+1, value id%256 at quality
    90 — flat blocks decode to a value that is a CLOSED-FORM function
    of the DC quantizer, so even the lossy codec's output is
    SQL-predictable), and — id%4==3 — actual VIDEOS with id%5+2 flat
    frames of value id%256: YUV4MPEG2 (id%8==3, lossless mono) or
    MJPEG-in-AVI (id%8==7, per-frame JPEGs whose flat decode follows
    the same DC closed form). The payloads round-trip through any
    standards-compliant decoder, and every decoded feature is a
    closed-form function of doc_id — so a SQL oracle can verify a
    REAL encode→decode pipeline without a codec."""
    from graphula_spark.operators.codecs import encode_png, encode_wav_pcm16
    from graphula_spark.operators.jpeg import encode_jpeg
    from graphula_spark.operators.video import encode_mjpeg_avi, encode_y4m

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, source in zip(pdf["doc_id"], pdf["source"]):
                mid = int(mid)
                if mid % 4 == 0:
                    w, h = mid % 64 + 1, mid % 48 + 1
                    px = np.full((h, w), mid % 256, dtype=np.uint8)
                    rows.append(
                        (mid, encode_png(px), "image", (source, w, h))
                    )
                elif mid % 4 == 1:
                    n = mid % 500 + 100
                    t = np.arange(n)
                    sq = np.where((t // 4) % 2 == 0, 1000, -1000).astype(
                        np.int16
                    )
                    rows.append(
                        (mid, encode_wav_pcm16(sq, 8000), "audio", (source, None, None))
                    )
                elif mid % 4 == 2:
                    w, h = mid % 40 + 1, mid % 32 + 1
                    px = np.full((h, w), mid % 256, dtype=np.uint8)
                    rows.append(
                        (mid, encode_jpeg(px, quality=90), "image", (source, w, h))
                    )
                else:
                    w, h = mid % 24 + 2, mid % 16 + 2
                    n_frames = mid % 5 + 2
                    fr = np.full((n_frames, h, w), mid % 256, dtype=np.uint8)
                    payload = (
                        encode_y4m(fr)
                        if mid % 8 == 3
                        else encode_mjpeg_avi(fr, quality=90)
                    )
                    rows.append((mid, payload, "video", (source, w, h)))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "media_type", "meta"]
            )

    src = _widen_for_python(docs.select("doc_id", "source"))
    return src.mapInPandas(run, schema=MEDIA_SCHEMA)


def extract_real_features(df: DataFrame) -> DataFrame:
    """REAL decode + feature extraction, routed by magic bytes:
    PNG → parse/inflate/unfilter to pixels (width, height, mean pixel
    value); RIFF/WAVE → PCM samples (rate, count, peak amplitude,
    zero crossings). Unknown formats yield detected='unknown' with
    null features rather than failing the batch — at 100 TB a poison
    payload must not kill the pipeline."""
    from graphula_spark.operators.codecs import (
        PNG_SIG,
        audio_features,
        decode_png,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphula_spark.operators.video import (
            Y4M_MAGIC,
            decode_mjpeg_avi,
            decode_y4m,
            is_avi,
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                base = {
                    "media_id": mid, "detected": "unknown",
                    "width": None, "height": None, "mean_pixel": None,
                    "sample_rate": None, "n_samples": None,
                    "max_amp": None, "n_zero_cross": None,
                    "vid_frames": None,
                }
                try:
                    if payload is None:
                        base["detected"] = "empty"
                    elif bytes(payload[:8]) == PNG_SIG:
                        w, h, c, px = decode_png(bytes(payload))
                        base.update(
                            detected="png", width=w, height=h,
                            mean_pixel=float(px.mean()),
                        )
                    elif bytes(payload[: len(Y4M_MAGIC)]) == Y4M_MAGIC:
                        w, h, _c, luma = decode_y4m(bytes(payload))
                        base.update(
                            detected="y4m", width=w, height=h,
                            mean_pixel=float(luma.mean()),
                            vid_frames=int(luma.shape[0]),
                        )
                    elif is_avi(bytes(payload[:12])):
                        w, h, frames = decode_mjpeg_avi(bytes(payload))
                        base.update(
                            detected="mjpeg", width=w, height=h,
                            mean_pixel=float(
                                np.mean([f.mean() for f in frames])
                            ),
                            vid_frames=len(frames),
                        )
                    elif bytes(payload[:4]) == b"RIFF":
                        base.update(detected="wav", **audio_features(bytes(payload)))
                    elif bytes(payload[:2]) == b"\xff\xd8":
                        from graphula_spark.operators.jpeg import decode_jpeg

                        w, h, c, px = decode_jpeg(bytes(payload))
                        base.update(
                            detected="jpeg", width=w, height=h,
                            mean_pixel=float(px.mean()),
                        )
                except Exception:
                    base["detected"] = "corrupt"
                rows.append(base)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=REAL_FEATURE_SCHEMA)
