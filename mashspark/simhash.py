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


def simhash_batch(texts, k: int, seed: int) -> np.ndarray:
    """int64 simhash per text (sign-bit semantics irrelevant — the value is
    a bit pattern, stored raw)."""
    bufs = [np.frombuffer(str(t).encode("utf-8"), dtype=np.uint8) for t in texts]
    lens = [len(b) for b in bufs]
    big = np.concatenate(bufs) if bufs else np.empty(0, dtype=np.uint8)
    all_h = hash_shingles_concat(big, k, seed)
    out = np.zeros(len(bufs), dtype=np.int64)
    bitcols = np.uint64(1) << np.arange(64, dtype=np.uint64)
    off = 0
    for i, blen in enumerate(lens):
        if blen >= k:
            nk = blen - k + 1
            seg = np.unique(all_h[off : off + nk])  # set semantics, like MinHash
            if len(seg):
                # per-bit vote: count of ones per bit minus half the total
                bits = (seg[:, None] & bitcols[None, :]) != 0
                votes = bits.sum(axis=0) * 2 - len(seg)
                sig = np.uint64(0)
                sig = (bitcols[votes > 0]).sum(dtype=np.uint64)
                out[i] = np.int64(sig.view(np.int64) if hasattr(sig, "view") else sig)
        off += blen
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
    blocks = []
    for bi in range(nb):
        lo = bi * width
        w = width if bi < nb - 1 else 64 - lo
        blk = F.shiftrightunsigned(F.col("simhash"), lo).bitwiseAND(
            F.lit((1 << w) - 1).cast("long")
        )
        blocks.append(
            sigs.select(
                "doc_id", "simhash", F.lit(bi).alias("block_idx"), blk.alias("block_val")
            )
        )
    exploded = blocks[0]
    for b in blocks[1:]:
        exploded = exploded.unionByName(b)
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
