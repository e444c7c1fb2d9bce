"""Multimodal (image/audio/video) column plumbing (north-star M5).

Media travels as an opaque ``binary`` column plus a typed metadata struct —
the schema/partitioning/UDF-shape layer is real and tested; the actual codec
step is stubbed (image/audio libraries are not in this container) behind
either ``NotImplementedError`` or a clearly-marked deterministic fake.

Scale posture: decode/feature-extract are ``mapInPandas`` stages — Arrow
batches in and out, one Python worker per core, no driver involvement. The
binary column rides the parquet scan like any other column; partition sizing
is governed by ``spark.sql.files.maxPartitionBytes`` exactly as for text.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("bytes", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build a media table from any string column: deterministic fake bytes
    (utf-8 of the payload) + metadata. Stands in for reading real image/audio
    blobs; every downstream stage treats `bytes` as opaque."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("mime"),
        F.encode(F.col(payload_col), "utf-8").alias("bytes"),
        F.create_map(
            F.lit("source"), F.lit("synthetic"),
            F.lit("n_chars"), F.length(F.col(payload_col)).cast("string"),
        ).alias("meta"),
    )


def decode_image(df: DataFrame) -> DataFrame:
    """STUB: real implementation would Pillow-decode ``bytes`` to
    (height, width, channels) inside mapInPandas. Raises at execution time;
    the plan (schema, Arrow batching) is real."""

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("height", IntegerType()),
            StructField("width", IntegerType()),
            StructField("channels", IntegerType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode requires Pillow/libvips — not available in this "
            "container; plumbing (schema/Arrow/mapInPandas) is real"
        )

    return df.mapInPandas(decode, schema=out_schema)


def extract_features(df: DataFrame) -> DataFrame:
    """Deterministic fake feature extractor: FEATURE_DIM floats derived from
    the byte content (rolling checksum per stripe). Real system swaps the
    inner function for a model forward pass; the Spark-side contract
    (mapInPandas, Arrow batches, fixed-dim float array out) is identical."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mime, blob in zip(pdf["media_id"], pdf["mime"], pdf["bytes"]):
                data = bytes(blob or b"")
                stripe = max(1, len(data) // FEATURE_DIM)
                feats = []
                for i in range(FEATURE_DIM):
                    chunk = data[i * stripe : (i + 1) * stripe]
                    feats.append(float(sum(chunk) % 1000) / 1000.0)
                rows.append((mid, mime, len(data), feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "mime", "n_bytes", "features"]
            )

    return df.mapInPandas(features, schema=FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Deterministic fake frame sampler (video analogue): slices the payload
    into fixed-size 'frames', emitting ≤ max_frames per media row. Real
    system: pyav keyframe extraction; identical mapInPandas shape."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                data = bytes(blob or b"")
                for idx in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    rows.append((mid, idx, data[idx * every_n_bytes : (idx + 1) * every_n_bytes]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return df.mapInPandas(frames, schema=FRAME_SCHEMA)
