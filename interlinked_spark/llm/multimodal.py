"""Multimodal column plumbing (SURVEY.md §2b-K).

Images / audio / video are opaque ``binary`` columns with typed metadata
structs.  The Spark-side plumbing — schemas, Arrow-batched UDF
signatures, partition sizing — is real and tested; the actual codec
calls are stubbed (image/audio libraries are not in this environment)
behind ``decode_stub``: a deterministic fake that derives "features"
from the bytes, so pipelines exercise the exact data path a real
decoder would.

Scale notes: binary payloads make rows heavy — keep
``spark.sql.files.maxPartitionBytes`` modest, never collect, and do all
feature extraction in ``mapInPandas`` (Arrow batches, bounded memory via
the batch iterator) rather than per-row UDFs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical schema for a multimodal asset row.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("meta_width", LongType(), True),
        StructField("meta_height", LongType(), True),
        StructField("meta_duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build an asset table from any string column (test harness for the
    binary path: encode utf-8 bytes as the payload)."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("meta_width"),
        F.lit(1).cast("long").alias("meta_height"),
        F.lit(None).cast("long").alias("meta_duration_ms"),
    )


def decode_real(payload: bytes, media_type: str):  # pragma: no cover
    """The real decoder hook.  Plug PIL / torchaudio / decord here."""
    raise NotImplementedError(
        "codec libraries are not available in this environment; "
        "use decode_stub for the deterministic fake"
    )


def decode_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': folds payload bytes into a
    fixed-dim float vector.  Same contract (bytes -> float features) a
    real image/audio decoder would satisfy."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [v / 997.0 for v in acc]


def extract_features(assets: DataFrame, dim: int = 8, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column
    via ``mapInPandas`` — the iterator shape keeps executor memory
    bounded regardless of asset sizes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feature": pdf["payload"].map(lambda p: decode_stub(p, dim)),
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(payload: bytes, width: int = 8, height: int = 8) -> bytes:
    """Deterministic fake 'resize': fold the payload into a width*height
    byte grid (real impl: PIL Image.resize).  Same contract — bytes in,
    resized-asset bytes out."""
    if payload is None:
        return b"\x00" * (width * height)
    grid = bytearray(width * height)
    for i, b in enumerate(payload):
        grid[i % (width * height)] = (grid[i % (width * height)] + b) % 256
    return bytes(grid)


def frame_sample_stub(payload: bytes, n_frames: int = 4, frame_bytes: int = 16) -> list[bytes]:
    """Deterministic fake 'video frame sampling': n_frames evenly-spaced
    byte windows (real impl: decord/ffmpeg keyframe extraction)."""
    if not payload:
        return [b"\x00" * frame_bytes] * n_frames
    step = max(1, len(payload) // n_frames)
    return [
        bytes(payload[i * step : i * step + frame_bytes]).ljust(frame_bytes, b"\x00")
        for i in range(n_frames)
    ]


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("resized", BinaryType(), True),
        StructField("frames", ArrayType(BinaryType()), True),
    ]
)


def transform_assets(assets: DataFrame, width: int = 8, height: int = 8, n_frames: int = 4) -> DataFrame:
    """Arrow-batched resize + frame-sample over binary payloads — the
    full multimodal transform plumbing (schema, batching, partitioning)
    with stubbed codecs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "resized": pdf["payload"].map(lambda p: resize_stub(p, width, height)),
                    "frames": pdf["payload"].map(lambda p: frame_sample_stub(p, n_frames)),
                }
            )

    return assets.mapInPandas(run, RESIZED_SCHEMA)
