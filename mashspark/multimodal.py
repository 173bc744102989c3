"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Decode is REAL for codec-free container formats — WAV PCM/float audio,
uncompressed 24-bit BMP, binary PNM, Y4M uncompressed video
(``codecs.py``, pure numpy, magic-byte dispatch in ``decode_media``) —
AND for baseline JPEG (``jpeg.py``: pure-numpy ITU-T T.81 baseline
sequential decoder — Huffman + dequant + IDCT + chroma upsample —
written from the public spec because this container ships no codec
libraries), plus a real area-mean resize, a real audio
energy/autocorrelation plane, and real video frame sampling
(``sample_video_frames``). Remaining compressed formats (PNG, MP3,
MP4, progressive/arithmetic JPEG) route to the documented STUB
(``_decode_image_stub``); a real deployment plugs
Pillow/libvips/ffmpeg into that branch. Everything Spark-side is real
and tested: schemas, batch iteration, partition-size control, and
deterministic features so downstream operators (dedup over content
hashes, ANN over extracted features) run end-to-end.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, BooleanType,
                               DoubleType, FloatType, IntegerType, LongType,
                               StringType, StructField, StructType)

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
        StructField("fmt", StringType(), False),
        StructField("decoded_real", BooleanType(), False),
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


def payload_format(payload: bytes) -> str:
    """Magic-byte container sniff (pure prefix check, no decode):
    'wav' | 'jpeg' | 'png' | 'gif' | 'y4m' | 'bmp' | 'pnm' |
    'unknown'."""
    if (len(payload) >= 12 and payload[:4] == b"RIFF"
            and payload[8:12] == b"WAVE"):
        return "wav"
    if payload[:2] == b"\xFF\xD8":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P5", b"P6"):
        return "pnm"
    return "unknown"


def decode_media_routed(payload: bytes) -> tuple[np.ndarray, str, bool]:
    """payload bytes -> (2-D float32 plane, format, decoded_real), by
    magic:

    * ``RIFF..WAVE`` -> real WAV decode -> energy/autocorrelation plane
    * ``BM`` -> real BMP decode -> luma plane (mean over RGB / 255)
    * ``P5``/``P6`` -> real PNM decode -> luma plane
    * ``FF D8`` -> real JPEG decode (``jpeg.py``: baseline AND
      progressive) -> luma plane
    * ``\\x89PNG`` -> real PNG decode (``png.py``: all color types,
      Adam7) -> luma plane
    * ``GIF8?a`` -> real GIF decode (``gif.py``: LZW, first frame) ->
      luma plane
    * anything else (WebP/AVIF, arithmetic-coded JPEG, ...) ->
      deterministic stub

    ``decoded_real`` is False when no real codec matched OR the matched
    codec refused/failed (progressive JPEG, truncated stream): corrupt
    rows are data, not bugs, at 100 TB — they degrade to the stub, and
    the (format, decoded_real) pair lets pipelines report exactly what
    fraction of a crawl's media took the real path per container."""
    from . import codecs

    fmt = payload_format(payload)
    try:
        if fmt == "wav":
            samples, _rate = codecs.decode_wav(payload)
            return codecs.audio_energy_plane(samples), fmt, True
        if fmt == "jpeg":
            from .jpeg import decode_jpeg

            img = decode_jpeg(payload)
            if img.ndim == 3:
                img = img.mean(axis=2)
            return img.astype(np.float32) / 255.0, fmt, True
        if fmt == "png":
            from .png import decode_png

            img = decode_png(payload)
            return img.mean(axis=2).astype(np.float32) / 255.0, fmt, True
        if fmt == "gif":
            from .gif import decode_gif

            img = decode_gif(payload)
            return img.mean(axis=2).astype(np.float32) / 255.0, fmt, True
        if fmt == "y4m":
            frames, _fps = codecs.decode_y4m(payload)
            # whole-video feature: temporal mean of the luma planes
            return frames.mean(axis=0).astype(np.float32) / 255.0, fmt, True
        if fmt == "bmp":
            img = codecs.decode_bmp(payload)
            return img.mean(axis=2).astype(np.float32) / 255.0, fmt, True
        if fmt == "pnm":
            img = codecs.decode_pnm(payload)
            if img.ndim == 3:
                img = img.mean(axis=2)
            return img.astype(np.float32) / 255.0, fmt, True
    except (ValueError, IndexError, KeyError, struct.error):
        # truncated/malformed payloads (routine in crawls) raise any of
        # these from the pure-python codecs (e.g. decode_jpeg:
        # IndexError past-end marker scan, struct.error on short
        # segments, KeyError on stripped DHT) — all degrade to the stub
        # instead of crashing the Spark task
        pass
    return _decode_image_stub(payload), fmt, False


def decode_media(payload: bytes) -> np.ndarray:
    """decode_media_routed without the routing metadata."""
    plane, _fmt, _real = decode_media_routed(payload)
    return plane


def _feature_from_plane(plane: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic 'embedding': 4x4 area-mean pool of the (arbitrarily
    sized) decoded plane (stands in for a model forward pass; shape/dtype
    contract is the real one, and the resize kernel is real)."""
    from .codecs import resize_plane

    pooled = resize_plane(plane, 4, 4).ravel()  # 16 values
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
            fmts, reals, feats = [], [], []
            for i, payload in enumerate(pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                row = np.frombuffer(b, dtype=np.uint8).reshape(1, -1)
                if row.shape[1] == 0:
                    row = np.zeros((1, 0), dtype=np.uint8)
                out_hash[i] = np.int64(
                    murmur3_x64_128_h1(row, 42)[0].astype(np.uint64) ^ np.uint64(1 << 63)
                )
                out_bytes[i] = len(b)
                plane, fmt, real = decode_media_routed(b)
                fmts.append(fmt)
                reals.append(real)
                feats.append(_feature_from_plane(plane))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content_hash": out_hash,
                    "n_bytes": out_bytes,
                    "fmt": fmts,
                    "decoded_real": reals,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("frame_mean", DoubleType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def sample_frame_indices(n_frames: int, n_sample: int) -> np.ndarray:
    """Deterministic uniform frame sampling: k = min(n_sample, n_frames)
    indices ``floor(i*(n_frames-1)/(k-1) + 0.5)`` for i in 0..k-1 (just
    index 0 when k == 1) — strictly increasing, endpoints always
    included, and simple enough that an oracle can recompute it in SQL."""
    k = min(n_sample, n_frames)
    if k <= 0:
        return np.zeros(0, dtype=np.int64)
    if k == 1:
        return np.zeros(1, dtype=np.int64)
    i = np.arange(k, dtype=np.float64)
    return np.floor(i * (n_frames - 1) / (k - 1) + 0.5).astype(np.int64)


def sample_video_frames(media: DataFrame, n_sample: int = 4,
                        payload_col: str = "payload",
                        id_col: str = "media_id") -> DataFrame:
    """Video frame sampling: decode each Y4M payload (real codec), keep
    ``n_sample`` uniformly spaced frames, and emit one row per kept frame
    with its luma mean and pooled feature — the multimodal spec's
    'frame-sample' verb as an Arrow-batched mapInPandas (one Python call
    per batch of payloads; frames never become Spark rows before
    sampling, so a 10k-frame video costs n_sample output rows).

    Undecodable payloads degrade to a single stub frame (frame_idx 0,
    n_frames 0) — corrupt rows are data, not job failures."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_y4m

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "frame_idx", "n_frames", "frame_mean", "feature")}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                try:
                    frames, _fps = decode_y4m(b)
                except ValueError:
                    plane = _decode_image_stub(b)
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(0)
                    out["n_frames"].append(0)
                    out["frame_mean"].append(float(plane.astype(np.float64).mean()))
                    out["feature"].append(_feature_from_plane(plane))
                    continue
                nf = frames.shape[0]
                for idx in sample_frame_indices(nf, n_sample):
                    plane = frames[idx].astype(np.float64) / 255.0
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(int(idx))
                    out["n_frames"].append(nf)
                    out["frame_mean"].append(float(plane.mean()))
                    out["feature"].append(_feature_from_plane(plane))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME_SCHEMA)


def media_exact_dups(features: DataFrame) -> DataFrame:
    """Exact media dedup on content hash: (content_hash, n_copies, min_id)."""
    return (
        features.groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("media_id").alias("min_id"))
        .filter(F.col("n_copies") > 1)
    )


def synthetic_media(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests, mixing REAL codec-free
    formats (BMP images, WAV audio — exercised through the real decoders)
    with opaque random payloads (exercise the stub fallback)."""
    from .codecs import encode_bmp, encode_wav

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 7 == 0 and i > 0:  # planted exact dup of the previous row
            rows.append((i,) + rows[-1][1:])
            continue
        if i % 3 == 1:
            img = rng.integers(0, 256, size=(int(rng.integers(4, 24)),
                                             int(rng.integers(4, 24)), 3),
                               dtype=np.uint8)
            rows.append((i, "image", "image/bmp", encode_bmp(img),
                         img.shape[1], img.shape[0], None))
        elif i % 3 == 2:
            nsamp = int(rng.integers(200, 4000))
            wav = encode_wav(rng.uniform(-0.8, 0.8, nsamp), 8000)
            rows.append((i, "audio", "audio/wav", wav, None, None,
                         nsamp * 1000 // 8000))
        else:
            payload = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                                   dtype=np.uint8).tobytes()
            rows.append((i, "image", "image/fake", payload, 8, 8, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
