"""Perceptual-hash near-duplicate detection for multimodal binary
columns — the media-side analog of SimHash text dedup.

A 64-bit difference hash (dHash, Krawetz 2013) or average hash (aHash)
is computed over each payload's decoded 2-D plane: real codecs for the
codec-free containers (BMP / PNM images -> luma plane, WAV audio ->
energy/autocorrelation plane, Y4M video -> temporal-mean luma plane; see
``multimodal.decode_media``) plus baseline JPEG (pure-numpy ``jpeg.py``),
deterministic stub for the remaining compressed formats the sandbox
can't decode. dHash takes the sign of horizontal gradients
on an area-mean 8x9 downscale, which makes it invariant to uniform
brightness shifts, global amplitude scaling (audio), and resolution
changes — the transformations that defeat exact content-hash dedup.

Candidate pairs within ``max_hamming`` bits reuse the SimHash Manku
block equi-join (``simhash.simhash_dup_pairs``): nb = max_hamming+1
signature blocks, pigeonhole guarantees every close pair shares a
block, the exact ``bit_count(a XOR b)`` filter runs JVM-side. The
shuffle carries only (id, 16 B block) rows — never payloads, never a
cross join — so the pair stage scales exactly like text SimHash.

Reference analog: Mash's sketch-then-compare shape (``mash dist``,
CommandDistance.cpp) applied to decoded media planes instead of k-mer
sets; the hash itself is the published dHash/aHash construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, LongType, StructField,
                               StructType)

PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("decoded_real", BooleanType(), False),
    ]
)


def dhash_from_plane(plane: np.ndarray) -> int:
    """2-D float plane -> 64-bit dHash (int64 bit pattern).

    Area-mean resize to 8 rows x 9 cols (``codecs.resize_plane``), then
    bit i*8+j = 1 iff cell[i, j+1] > cell[i, j]. Ties (==) vote 0, so a
    constant plane hashes to 0 — degenerate inputs collide by design."""
    from .codecs import resize_plane

    small = resize_plane(plane, 8, 9).astype(np.float64)
    bits = (small[:, 1:] > small[:, :-1]).astype(np.uint8)  # (8, 8)
    return int(
        np.packbits(bits.ravel(), bitorder="little").view("<u8")[0].astype(np.int64)
    )


def ahash_from_plane(plane: np.ndarray) -> int:
    """2-D float plane -> 64-bit aHash: 8x8 area-mean downscale, bit set
    iff the cell exceeds the 64-cell mean. Cheaper but brightness-shift
    sensitive at the mean boundary; dHash is the default."""
    from .codecs import resize_plane

    small = resize_plane(plane, 8, 8).astype(np.float64)
    bits = (small > small.mean()).astype(np.uint8)
    return int(
        np.packbits(bits.ravel(), bitorder="little").view("<u8")[0].astype(np.int64)
    )


def _looks_real(b: bytes) -> bool:
    """A real codec path exists for this payload's magic (the decode
    may still fall back on corrupt bytes — phash_media records the
    ACTUAL outcome via decode_media_routed)."""
    from .multimodal import payload_format

    return payload_format(b) != "unknown"


def phash_media(media: DataFrame, id_col: str = "media_id",
                payload_col: str = "payload",
                method: str = "dhash") -> DataFrame:
    """media table -> (media_id, phash, n_bytes, decoded_real).

    Arrow-batched ``mapInPandas``: one Python call per batch of payloads,
    decode + hash per row inside the batch (decode dominates; the hash is
    one 8x9 resize). ``decoded_real`` records whether a real codec path
    was taken (magic-byte dispatch) — at scale this column is the audit
    trail separating true perceptual matches from stub-plane collisions.
    Payloads never leave the scan stage; only 28 B/row survives."""
    if method == "dhash":
        hasher = dhash_from_plane
    elif method == "ahash":
        hasher = ahash_from_plane
    else:
        raise ValueError(f"unknown phash method {method!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import decode_media_routed

        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            hashes = np.zeros(len(pdf), dtype=np.int64)
            nbytes = np.zeros(len(pdf), dtype=np.int64)
            real = np.zeros(len(pdf), dtype=bool)
            for i, payload in enumerate(pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                nbytes[i] = len(b)
                plane, _fmt, real[i] = decode_media_routed(b)
                hashes[i] = hasher(plane)
            yield pd.DataFrame(
                {"media_id": ids, "phash": hashes, "n_bytes": nbytes,
                 "decoded_real": real}
            )

    return media.mapInPandas(run, PHASH_SCHEMA)


def phash_dup_pairs(hashes: DataFrame, max_hamming: int = 6) -> DataFrame:
    """(id_a, id_b, hamming) media pairs within ``max_hamming`` bits.

    Delegates to the SimHash Manku block join — same pigeonhole
    guarantee, same plan (one scan + eager localCheckpoint feeding both
    self-join branches, equi-join on (block_idx, block_val), JVM
    bit_count filter). Default radius 6 is wider than text SimHash's 3:
    perceptual hashes of re-encoded media legitimately drift more bits
    than token-level text edits do."""
    from .simhash import simhash_dup_pairs

    sigs = hashes.select(
        F.col("media_id").alias("doc_id"), F.col("phash").alias("simhash")
    )
    return simhash_dup_pairs(sigs, max_hamming=max_hamming)


def phash_dup_clusters(hashes: DataFrame, max_hamming: int = 6) -> DataFrame:
    """(media_id, cluster_id) for every item in a perceptual-dup cluster
    (cluster_id = min media_id, via the shared connected-components op)."""
    from .cc import connected_components

    pairs = phash_dup_pairs(hashes, max_hamming=max_hamming)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return connected_components(edges).select(
        F.col("doc_id").alias("media_id"), "cluster_id"
    )
