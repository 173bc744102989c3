"""SimHash near-duplicate detection (Charikar 2002 / Manku et al. WWW'07)
— the second dedup family alongside MinHash (task brief: exact, MinHash
+LSH, SimHash, n-gram Jaccard, embedding-cosine).

64-bit SimHash over the same murmur3 shingle hashes the MinHash sketcher
uses: each shingle hash votes its bit pattern, the signature is the sign
of the per-bit vote sum. Candidate pairs = signatures within
``max_hamming`` bits, found via the Manku rotation/block trick: split the
64-bit signature into ``max_hamming+1`` blocks; any pair within d bits
agrees exactly on >= 1 block (pigeonhole), so an equi-join per block finds
all candidates without a cross join; exact Hamming check (JVM-side
``bit_count(a XOR b)``) filters the rest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from .hashing import hash_shingles_concat

# 256 x 8 lookup: _BITS8[v, b] = bit b of byte value v (voting matmul below)
_BITS8 = ((np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1).astype(np.int64)


def simhash_batch(texts, k: int, seed: int) -> np.ndarray:
    """int64 simhash per text (sign-bit semantics irrelevant — the value is
    a bit pattern, stored raw).

    Fully vectorized voting: per-doc distinct shingle hashes (set
    semantics, like MinHash) are concatenated, bit-unpacked ONCE for the
    whole batch (``np.unpackbits`` on the little-endian byte view) and
    summed per document with one ``np.add.reduceat`` — no per-document
    64-column temporaries (the old per-doc vote matrix was the simhash
    stage's hot-spot at bench scale)."""
    bufs = [np.frombuffer(str(t).encode("utf-8"), dtype=np.uint8) for t in texts]
    lens = [len(b) for b in bufs]
    big = np.concatenate(bufs) if bufs else np.empty(0, dtype=np.uint8)
    all_h = hash_shingles_concat(big, k, seed)
    n_docs = len(bufs)
    out = np.zeros(n_docs, dtype=np.int64)

    segs, seg_lens, doc_idx = [], [], []
    off = 0
    for i, blen in enumerate(lens):
        if blen >= k:
            nk = blen - k + 1
            seg = np.unique(all_h[off : off + nk])
            if len(seg):
                segs.append(seg)
                seg_lens.append(len(seg))
                doc_idx.append(i)
        off += blen
    if not segs:
        return out

    uniq_all = np.concatenate(segs)
    seg_lens = np.asarray(seg_lens, dtype=np.int64)
    # per-doc per-bit one-counts via segmented BYTE histograms (round-6):
    # for each of the 8 byte positions, one bincount of (doc*256 +
    # byte_val) over the whole batch, then a (docs x 256) @ (256 x 8)
    # bit-table matmul recovers the per-bit counts — 8 passes over the
    # data instead of the previous 64 shift/mask/reduceat triples
    # (measured 1.6x on the whole simhash batch kernel; the temporaries
    # are (docs*256) histograms, small and allocator-cached, so the
    # first-touch page-fault concern that ruled out an (N, 64)
    # unpackbits matrix does not apply)
    n_seg = len(seg_lens)
    seg_doc = np.repeat(np.arange(n_seg, dtype=np.int64), seg_lens)
    bytes_mat = uniq_all.view(np.uint8).reshape(-1, 8)
    ones = np.empty((n_seg, 64), dtype=np.int64)
    base = seg_doc << 8
    for b in range(8):
        hist = np.bincount(base + bytes_mat[:, b], minlength=n_seg * 256)
        ones[:, 8 * b : 8 * b + 8] = hist.reshape(n_seg, 256) @ _BITS8
    votes = ones * 2 - seg_lens[:, None]
    sig_bits = (votes > 0).astype(np.uint8)
    sigs = np.packbits(sig_bits, axis=1, bitorder="little").view("<u8").ravel()
    out[np.asarray(doc_idx)] = sigs.view(np.int64)
    return out


def make_simhash_udf(k: int, seed: int):
    @pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(texts.fillna("").tolist(), k, seed))

    return simhash_udf


def simhash_documents(df: DataFrame, k: int = 8, seed: int = 42,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    udf = make_simhash_udf(k, seed)
    return df.select(F.col(id_col).alias("doc_id"), udf(F.col(text_col)).alias("simhash"))


def simhash_dup_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming distance <= max_hamming.

    Manku block trick: nb = max_hamming+1 blocks of ~64/nb bits; candidates
    equi-join on (block_idx, block_value) — shuffle carries only
    (doc_id, block) rows; the exact bit_count filter is a JVM expression.
    """
    nb = max_hamming + 1
    width = 64 // nb
    structs = []
    for bi in range(nb):
        lo = bi * width
        w = width if bi < nb - 1 else 64 - lo
        blk = F.shiftrightunsigned(F.col("simhash"), lo).bitwiseAND(
            F.lit((1 << w) - 1).cast("long")
        )
        structs.append(
            F.struct(F.lit(bi).alias("block_idx"), blk.alias("block_val"))
        )
    # ONE scan of sigs (array+explode), then localCheckpoint so the
    # self-join's two branches reuse the materialized rows — a union of
    # per-block projections re-ran the upstream simhash UDF once per
    # branch per join side (measured 8x recompute at bench scale)
    exploded = sigs.select(
        "doc_id", "simhash", F.explode(F.array(*structs)).alias("_b")
    ).select(
        "doc_id", "simhash", F.col("_b.block_idx").alias("block_idx"),
        F.col("_b.block_val").alias("block_val"),
    ).localCheckpoint(eager=True)  # eager: two join branches consume it
    left = exploded.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sig_a"),
        "block_idx", "block_val",
    )
    right = exploded.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sig_b"),
        "block_idx", "block_val",
    )
    pairs = (
        left.join(right, ["block_idx", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs
