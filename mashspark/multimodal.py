"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode/resample kernels themselves are STUBBED (this container ships
no image/audio codecs — see ``_decode_image_stub``); everything Spark-side
is real and tested: schemas, batch iteration, partition-size control,
deterministic fake features so downstream operators (dedup over frame
hashes, ANN over extracted features) can be exercised end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

from .hashing import murmur3_x64_128_h1

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),    # opaque encoded bytes
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content_hash", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode. A real deployment plugs Pillow/libvips here:

        raise NotImplementedError("image codecs not available in sandbox")

    For pipeline plumbing tests we return a deterministic fake 'decoded
    plane' derived from the bytes, shaped like a tiny grayscale image, so
    resize/feature stages have real array input."""
    if payload is None or len(payload) == 0:
        return np.zeros((8, 8), dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = 8
    reps = int(np.ceil(side * side / len(arr)))
    plane = np.tile(arr, reps)[: side * side].reshape(side, side)
    return plane.astype(np.float32) / 255.0


def _feature_from_plane(plane: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic 'embedding': block means + gradients (stands in for a
    model forward pass; shape/dtype contract is the real one)."""
    pooled = plane.reshape(4, 2, 4, 2).mean(axis=(1, 3)).ravel()  # 16 values
    return pooled[:dim].astype(np.float32)


def extract_media_features(media: DataFrame, batch_target_rows: int = 256) -> DataFrame:
    """media table -> (media_id, content_hash, n_bytes, feature[16]).

    mapInPandas so one Arrow batch of payloads is processed per Python
    call; keep media tables partitioned by size (payloads are MBs — set
    ``spark.sql.files.maxPartitionBytes`` accordingly upstream; the
    ``batch_target_rows`` knob caps rows per Arrow batch via repartition
    guidance, it does not copy payloads)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].to_numpy(dtype=np.int64)
            out_hash = np.zeros(len(pdf), dtype=np.int64)
            out_bytes = np.zeros(len(pdf), dtype=np.int64)
            feats = []
            for i, payload in enumerate(pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                row = np.frombuffer(b, dtype=np.uint8).reshape(1, -1)
                if row.shape[1] == 0:
                    row = np.zeros((1, 0), dtype=np.uint8)
                out_hash[i] = np.int64(
                    murmur3_x64_128_h1(row, 42)[0].astype(np.uint64) ^ np.uint64(1 << 63)
                )
                out_bytes[i] = len(b)
                plane = _decode_image_stub(b)
                feats.append(_feature_from_plane(plane))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content_hash": out_hash,
                    "n_bytes": out_bytes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def media_exact_dups(features: DataFrame) -> DataFrame:
    """Exact media dedup on content hash: (content_hash, n_copies, min_id)."""
    return (
        features.groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("media_id").alias("min_id"))
        .filter(F.col("n_copies") > 1)
    )


def synthetic_media(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no codecs needed)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 7 == 0 and i > 0:  # planted exact dup of the previous row
            payload = rows[-1][3]
        else:
            payload = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                                   dtype=np.uint8).tobytes()
        rows.append((i, "image", "image/fake", payload, 8, 8, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
