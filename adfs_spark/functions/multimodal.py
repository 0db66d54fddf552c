"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns with a typed
metadata struct alongside (modality, mime, width/height/duration, …).
Heavy per-item work (decode, resize, frame-sample, feature-extract)
runs in Arrow-batched ``mapInPandas`` — the Spark-side contract
(schemas, batch shape, partitioning) is real and tested here; the
actual codec calls are STUBBED because no image/audio libraries exist
in this container.  Drop-in: replace ``_decode_stub`` with PIL/ffmpeg
calls and nothing else changes.

Scale notes: payload tables should be written with
``spark.sql.files.maxPartitionBytes`` sized so one task holds a few
hundred payloads; mapInPandas streams Arrow batches so executor memory
is bounded by batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``),
not partition size.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload_size", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def from_documents(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from any table with a payload-able column —
    here text bytes stand in for an encoded image. Demonstrates the
    binary + metadata-struct shape."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decode + feature extract'.

    REAL DECODE NOT AVAILABLE IN THIS CONTAINER — replace with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` + model inference.  The
    fake derives a stable pseudo-embedding from the payload's sha256 so
    tests are reproducible.
    """
    h = hashlib.sha256(payload).digest()
    return [(h[i % 32] - 128) / 128.0 for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_size": payloads.map(len),
                    "content_hash": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _decode_stub(b, dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — STUB: raises at execution time because no codec
    library is present; the plan/schema contract is real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode/resize requires PIL/opencv which are not in this "
            "container; swap this body for a real implementation"
        )
        yield  # pragma: no cover

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int) -> DataFrame:
    """Video frame sampling — STUB (no ffmpeg in container): emits one
    deterministic fake frame per payload so downstream plumbing and
    schema flow can be exercised end-to-end."""

    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_index": 0,
                    "frame": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).digest()
                    ),
                }
            )

    return media.mapInPandas(run, schema=frame_schema)
