"""Distributed Bloom-filter membership prefilter for cross-corpus
dedup (reference analog: ``bloom_filter.hpp`` — the reference uses a
Bloom filter to bound k-mer multiplicity memory; here the same structure
solves the cross-corpus problem a 100 TB curation pipeline actually has:
"which of my 10^12 new documents already exist in a 10^9-document
reference corpus?" without joining the full corpus against it).

Why not just a semi-join? At scale the semi-join shuffles BOTH sides on
the fingerprint: the 10^12-row new corpus pays a full exchange to
discover that ~99% of it misses. The Bloom path:

1. BUILD (pure JVM, no Python): explode each reference fingerprint's k
   bit positions, reduce to the bitmap's nonzero 64-bit words with
   ``groupBy(word_idx).agg(bit_or(word))``. Map-side partial aggregation
   collapses hot words before the exchange, so the shuffle moves
   O(nonzero words x tasks) — bounded by the bitmap size (m/64 rows),
   NOT the reference corpus. The collected sparse words become one dense
   numpy bitmap (m/8 bytes; 2^33 bits = 1 GiB — broadcastable).
2. PROBE (one Arrow-vectorized pandas UDF): every new doc tests its k
   bits against the broadcast bitmap — map-only, no shuffle, no false
   negatives. Only the ~(true hits + fpp) survivors proceed.
3. CONFIRM (exact): survivors semi-join the reference fingerprints.
   The join input is now tiny, so the result is EXACT membership — the
   Bloom filter is a performance layer, not an approximation the caller
   sees. (``confirm=False`` skips this for callers that accept fpp.)

Hashing: positions come from double hashing (Kirsch–Mitzenmacher,
"Less Hashing, Same Performance", 2006): pos_i = (h1 + i*h2') mod m
with h1/h2 = the first/second 32-bit words of md5(fingerprint) and
h2' = 2*h2+1 (odd, so the probe sequence never degenerates). md5 keeps
the whole build SQL-expressible and engine-portable.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def bloom_size(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``n_items`` at false-positive rate
    ``fpp``: m = -n ln p / ln^2 2, k = (m/n) ln 2."""
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    n = max(1, n_items)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def bloom_hash_cols(col: Column) -> tuple[Column, Column]:
    """(h1, h2): the first two 32-bit words of md5(col), as longs.
    Deterministic across engines (md5 is everywhere) and across runs."""
    h = F.md5(col.cast("string"))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return h1, h2


def _positions_expr(m_bits: int, k: int) -> Column:
    """Array of k bit positions for (h1, h2) via double hashing — a JVM
    array transform, no Python. h1 + 63*(2*h2+1) < 2^40: no overflow."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: (F.col("h1") + i.cast("long")
                   * (F.col("h2") * 2 + 1)) % F.lit(m_bits).cast("long"),
    )


@dataclass
class BloomFilter:
    """A built filter: dense bitmap of ``m_bits`` bits as uint64 words."""

    m_bits: int
    k: int
    words: np.ndarray  # uint64, length ceil(m_bits/64)

    @property
    def n_set_bits(self) -> int:
        # byte-LUT popcount: O(bitmap) extra memory in one uint8 pass —
        # np.unpackbits would allocate 8 bytes per bit (8 GiB for the
        # documented 2^33-bit production filter)
        lut = np.array([bin(i).count("1") for i in range(256)],
                       dtype=np.uint8)
        total = 0
        bv = self.words.view(np.uint8)
        for i in range(0, bv.size, 1 << 24):
            total += int(lut[bv[i:i + (1 << 24)]].sum(dtype=np.int64))
        return total

    @property
    def est_fpp(self) -> float:
        """(set_fraction)^k — the realized false-positive estimate."""
        return float((self.n_set_bits / self.m_bits) ** self.k)


def build_bloom(fps: DataFrame, fp_col: str, m_bits: int, k: int) -> BloomFilter:
    """Build the filter over ``fps[fp_col]`` distributed, pure-JVM.

    The reduction is ``groupBy(word_idx).agg(bit_or(word))`` over one
    exploded position relation: map-side partials bound the shuffle by
    the bitmap's word count (m/64), independent of the corpus size; the
    collect moves only nonzero words (sparse), never per-item rows.
    """
    if m_bits < 64:
        raise ValueError(f"m_bits must be >= 64, got {m_bits}")
    h1, h2 = bloom_hash_cols(F.col(fp_col))
    pos = (
        fps.select(h1.alias("h1"), h2.alias("h2"))
        .select(F.explode(_positions_expr(m_bits, k)).alias("pos"))
    )
    words = (
        pos.select(
            F.shiftright(F.col("pos"), 6).alias("word_idx"),
            # SQL shiftleft accepts a column shift amount (the PySpark
            # wrapper doesn't), hence expr()
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
            .alias("word"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
        .toPandas()  # Arrow path: no per-word Row objects on the driver
    )
    dense = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    dense[words["word_idx"].to_numpy(dtype=np.int64)] = (
        words["word"].to_numpy(dtype=np.int64).view(np.uint64))
    return BloomFilter(m_bits=m_bits, k=k, words=dense)


def bloom_probe_udf(df: DataFrame, bloom: BloomFilter):
    """A (h1, h2) -> boolean pandas UDF testing membership against the
    broadcast bitmap. Vectorized: k numpy passes per Arrow batch."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bloom.words)
    m = np.uint64(bloom.m_bits)
    k = bloom.k

    @pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bm = bc.value
        # null fingerprints (md5(null) -> null h1/h2 -> NaN here) are
        # certain misses — semi-join semantics, and NaN->uint64 casts
        # are undefined
        valid = h1.notna().to_numpy() & h2.notna().to_numpy()
        a = h1.fillna(0).to_numpy(dtype=np.uint64)
        step = (h2.fillna(0).to_numpy(dtype=np.uint64) * np.uint64(2)
                + np.uint64(1))
        hit = valid.copy()
        for i in range(k):
            pos = (a + np.uint64(i) * step) % m
            word = bm[(pos >> np.uint64(6)).astype(np.int64)]
            hit &= ((word >> (pos & np.uint64(63))) & np.uint64(1)) != 0
        return pd.Series(hit)

    return probe


def save_bloom(spark, bloom: BloomFilter, path: str,
               n_items: int | None = None,
               fpp: float | None = None) -> None:
    """Persist a built filter: sparse nonzero words as parquet +
    a one-row params table. Both go through Spark writers so the store
    lands on whatever filesystem the cluster uses (HDFS/S3/local).
    ``n_items``/``fpp`` record what the filter was built from so a
    later run can detect a stale store (see cmd_member)."""
    import os

    nz = np.nonzero(bloom.words)[0]
    rows = [(int(i), int(np.int64(bloom.words[i]))) for i in nz]
    spark.createDataFrame(rows or [(int(0), int(0))],
                          "word_idx long, word long") \
        .write.mode("overwrite").parquet(os.path.join(path, "words"))
    spark.createDataFrame(
        [(bloom.m_bits, bloom.k, len(rows),
          int(n_items) if n_items is not None else None,
          float(fpp) if fpp is not None else None)],
        "m_bits long, k long, n_words long, n_items long, fpp double",
    ).coalesce(1).write.mode("overwrite").json(os.path.join(path, "params"))


def load_bloom(spark, path: str) -> BloomFilter:
    """Load a filter written by save_bloom."""
    bloom, _ = load_bloom_with_meta(spark, path)
    return bloom


def load_bloom_with_meta(spark, path: str) -> tuple[BloomFilter, dict]:
    """(filter, params-dict) — the meta carries n_items/fpp when the
    writer recorded them (staleness checks)."""
    import os

    p = spark.read.json(os.path.join(path, "params")).collect()[0].asDict()
    dense = np.zeros((int(p["m_bits"]) + 63) // 64, dtype=np.uint64)
    words = spark.read.parquet(os.path.join(path, "words")).toPandas()
    dense[words["word_idx"].to_numpy(dtype=np.int64)] = (
        words["word"].to_numpy(dtype=np.int64).view(np.uint64))
    return BloomFilter(m_bits=int(p["m_bits"]), k=int(p["k"]),
                       words=dense), p


def membership_flags(
    new_docs: DataFrame,
    ref_docs: DataFrame | None,
    fp_col: str = "text",
    id_col: str = "doc_id",
    fpp: float = 0.01,
    expected_items: int | None = None,
    confirm: bool = True,
    bloom: BloomFilter | None = None,
) -> DataFrame:
    """-> (doc_id, in_reference): does each new doc's ``fp_col`` value
    occur anywhere in the reference corpus?

    Exact when ``confirm=True`` (the default): the Bloom probe is a
    map-only prefilter and only its survivors reach the semi-join, so
    the answer matches a plain semi-join bit-for-bit while the join
    reads ~(hits + fpp * |new|) rows instead of |new|. With
    ``confirm=False`` the probe's verdict is returned directly
    (no-false-negative, fpp false positives) and the reference corpus
    is never joined at all — the streaming-friendly mode.

    Pass a prebuilt/loaded ``bloom`` (see save_bloom/load_bloom) to skip
    the build; with ``confirm=False`` that makes ``ref_docs`` optional —
    the incremental-pipeline mode where the reference filter is a
    persisted artifact.
    """
    if ref_docs is None and (bloom is None or confirm):
        raise ValueError(
            "ref_docs is required unless a prebuilt bloom is passed "
            "with confirm=False")
    ref_fps = None
    if ref_docs is not None:
        ref_fps = ref_docs.select(F.col(fp_col).alias("_fp")).distinct()
    if bloom is None:
        if expected_items is None:
            expected_items = ref_fps.count()
        m_bits, k = bloom_size(expected_items, fpp)
        bloom = build_bloom(ref_fps, "_fp", m_bits, k)
    probe = bloom_probe_udf(new_docs, bloom)

    h1, h2 = bloom_hash_cols(F.col("_fp"))
    probed = new_docs.select(
        F.col(id_col).alias("doc_id"), F.col(fp_col).alias("_fp")
    ).withColumn("_maybe", probe(h1, h2))
    if not confirm:
        return probed.select("doc_id", F.col("_maybe").alias("in_reference"))
    # only Bloom survivors enter the join; everyone else is a certain miss
    # (Bloom filters have no false negatives)
    hits = (
        probed.filter(F.col("_maybe"))
        .join(ref_fps, "_fp", "left_semi")
        .select("doc_id", F.lit(True).alias("in_reference"))
    )
    return (
        probed.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("in_reference"), F.lit(False))
            .alias("in_reference"),
        )
    )
