"""Spark sketching stage: documents -> bottom-k sketches + LSH band keys.

One vectorized Arrow/pandas UDF does normalize-free shingling, a SINGLE
murmur3 pass over the whole batch's concatenated bytes, per-doc bottom-k
distinct selection (Mash ``MinHashHeap`` semantics, see ``minhash.py``),
the KMV cardinality estimate, and residue-class band keys — no per-row
Python, no shuffle (map-only stage; this is why sketching scales linearly
with executors, replacing the reference's thread pool at
``Sketch.cpp:211,354``).

Sketch hashes are stored sign-flip-encoded int64 (``hashing.encode_signed``)
so Spark-native ordering equals Mash's unsigned ordering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StructField,
                               StructType)

from .hashing import (_fmix64, encode_signed, hash_shingles_concat)
from .minhash import bottom_k, kmv_set_size
from .params import LSHParams, SketchParams

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_BANDSEED = np.uint64(0xA5A5A5A55A5A5A5A)

SKETCH_FIELDS = StructType(
    [
        StructField("sketch", ArrayType(LongType()), False),
        StructField("n_kmers", LongType(), False),
        StructField("card_est", LongType(), False),
        StructField("band_idx", ArrayType(IntegerType()), False),
        StructField("band_key", ArrayType(LongType()), False),
    ]
)


def compute_band_keys(sketch_u64: np.ndarray, bands: int):
    """(band_idx int32[], band_key uint64[]) for one sketch.

    Band of element h = ``h & (bands-1)``; key = order-independent
    fingerprint (xor-fold of fmix64-mixed elements, cardinality and class
    mixed in). Key collisions only add false candidates — the Mash-exact
    verify pass removes them — so a fold fingerprint is safe here.
    """
    if len(sketch_u64) == 0:
        return np.empty(0, dtype=np.int32), np.empty(0, dtype=np.uint64)
    mask = np.uint64(bands - 1)
    cls = (sketch_u64 & mask).astype(np.int64)
    order = np.argsort(cls, kind="stable")
    scls = cls[order]
    mixed = _fmix64(sketch_u64[order] * _GOLD ^ _BANDSEED)
    starts = np.flatnonzero(np.r_[True, scls[1:] != scls[:-1]])
    xors = np.bitwise_xor.reduceat(mixed, starts)
    counts = np.diff(np.r_[starts, len(scls)]).astype(np.uint64)
    idx = scls[starts]
    keys = _fmix64(xors ^ _fmix64(counts * _GOLD ^ idx.astype(np.uint64) ^ _BANDSEED))
    return idx.astype(np.int32), keys


def make_sketch_udf(params: SketchParams, lsh: LSHParams):
    k, s, seed, min_cov = params.k, params.s, params.seed, params.min_cov
    bands = lsh.bands

    @pandas_udf(SKETCH_FIELDS)
    def sketch_udf(texts: pd.Series) -> pd.DataFrame:
        vals = texts.fillna("").astype(str).tolist()
        bufs = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in vals]
        lens = [len(b) for b in bufs]
        big = np.concatenate(bufs) if bufs else np.empty(0, dtype=np.uint8)
        all_h = hash_shingles_concat(big, k, seed)

        sketches, n_kmers, cards, bidx_col, bkey_col = [], [], [], [], []
        off = 0
        for blen in lens:
            if blen < k:
                sk = np.empty(0, dtype=np.uint64)
                nk = 0
            else:
                nk = blen - k + 1
                sk = bottom_k(all_h[off : off + nk], s, min_cov=min_cov)
            off += blen
            card = kmv_set_size(sk) if len(sk) >= s else len(sk)
            bi, bk = compute_band_keys(sk, bands)
            sketches.append(encode_signed(sk))
            n_kmers.append(nk)
            cards.append(card)
            bidx_col.append(bi)
            bkey_col.append(bk.view(np.int64))
        return pd.DataFrame(
            {
                "sketch": sketches,
                "n_kmers": n_kmers,
                "card_est": cards,
                "band_idx": bidx_col,
                "band_key": bkey_col,
            }
        )

    return sketch_udf


def sketch_documents(df: DataFrame, params: SketchParams, lsh: LSHParams,
                     id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """documents -> (doc_id, sketch, n_kmers, card_est, band_idx, band_key).

    Map-only: filters docs shorter than k first (reference short-record
    filter, ``Sketch.cpp:337-341``) so the UDF never sees unsketchable rows.
    """
    udf = make_sketch_udf(params, lsh)
    out = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .withColumn("_sk", udf(F.col("text")))
        .select(
            "doc_id",
            F.col("_sk.sketch").alias("sketch"),
            F.col("_sk.n_kmers").alias("n_kmers"),
            F.col("_sk.card_est").alias("card_est"),
            F.col("_sk.band_idx").alias("band_idx"),
            F.col("_sk.band_key").alias("band_key"),
        )
    )
    return out
