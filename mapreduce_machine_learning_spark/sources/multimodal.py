"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas over ``mapInPandas``.

The Spark-side machinery here is real and tested — schema, partitioning, UDF
signature, batch shapes. Only the *codec* is stubbed: this container has no
image/audio libraries, so ``decode_image`` raises NotImplementedError and the
pipeline runs with ``fake_features`` (a deterministic md5-derived feature
vector) instead. Swapping in a real decoder changes one function, nothing
about the plan.

Scale notes: media payloads ride the normal columnar path (parquet BYTE_ARRAY
with dictionary off), so partition sizing is by bytes not rows — set
``spark.sql.files.maxPartitionBytes`` so one task's batch of payloads fits in
executor memory, and keep feature extraction in ``mapInPandas`` (one Python
worker per partition, Arrow record batches) rather than a per-row UDF.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),  # opaque encoded bytes
        StructField("width", IntegerType()),  # typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decoder slot — image libs are absent in this environment."""
    raise NotImplementedError(
        "image codec not available in this container; pipeline runs with "
        "fake_features (deterministic md5-derived) instead"
    )


def fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature extractor: md5(payload) → 8 floats in
    [0, 1). Same bytes → same features, any engine, any partitioning."""
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h, dtype=np.uint16)[:FEATURE_DIM].astype(np.float32) / 65536.0


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.
    The batch loop is vectorized per-column; the per-payload codec call is
    the only scalar loop (inherent to variable-length media)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": [list(fake_features(p)) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Synthesize a deterministic media table (payload = repeated md5 bytes)
    for tests — stands in for real encoded images/audio."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        payload = hashlib.md5(f"media-{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kinds[i % 3],
                bytearray(payload),
                64 + i,
                48 + i,
                1000 * (i % 7),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_stats(features: DataFrame) -> DataFrame:
    """Downstream relational use of extracted features — proves the vector
    column re-enters the declarative plan (JVM array ops, no Python)."""
    l2 = F.sqrt(
        F.aggregate(
            F.transform("features", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, z: a + z,
        )
    )
    return features.groupBy("kind").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
        F.round(F.avg(l2), 6).alias("avg_l2"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize slot — image libs are absent in this environment."""
    raise NotImplementedError(
        "image codec not available in this container; pipeline runs with "
        "fake_resize (deterministic md5-derived) instead"
    )


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in resize: output bytes = md5(payload | WxH)
    repeated to a length proportional to the target area. Same input and
    target → same bytes on any partitioning."""
    h = hashlib.md5(payload + f"|{width}x{height}".encode()).digest()
    return h * max(1, (width * height) // len(h))


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize stage: images/videos re-encoded to a target
    geometry, audio passed through untouched. Payload-in/payload-out keeps
    the column opaque, so resize composes with extract_features /
    sample_frames in one pipeline without schema churn."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            visual = pdf["kind"] != "audio"
            out = pdf[["media_id", "kind"]].copy()
            out["payload"] = [
                fake_resize(p, width, height) if v else p
                for p, v in zip(pdf["payload"], visual)
            ]
            out["width"] = np.where(visual, width, pdf["width"]).astype("int32")
            out["height"] = np.where(visual, height, pdf["height"]).astype("int32")
            yield out

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """mapInPandas frame sampling: each video row fans out to ``n_frames``
    (media_id, frame_idx, frame_payload) rows — the 1→N batch shape of real
    frame extraction (ffmpeg would fill frame_payload; the deterministic
    stand-in derives it as md5(payload | idx)). Non-video rows are dropped,
    and the fan-out happens inside the Arrow batch, so output partitioning
    follows input partitioning with no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            if vids.empty:
                continue
            yield pd.DataFrame(
                {
                    "media_id": vids["media_id"].repeat(n_frames),
                    "frame_idx": list(range(n_frames)) * len(vids),
                    "frame_payload": [
                        hashlib.md5(p + f"|{i}".encode()).digest()
                        for p in vids["payload"]
                        for i in range(n_frames)
                    ],
                }
            )

    return media.mapInPandas(run, FRAMES_SCHEMA)
