"""b-bit minwise hashing (Li & König 2010, "b-Bit Minwise Hashing",
WWW — the paper's motivating application IS web-page near-dup
detection at crawl scale): store only the lowest ``b`` bits of each of
``P`` independent minhash values, cutting signature storage by 64/b
(a 10^12-doc store at P=128 drops from 1 TB/bit-depth-64 to 64 GB at
b=4) while the resemblance estimator stays unbiased after a
closed-form collision correction.

Estimator (the r1, r2 -> 0 regime of the paper's Eq. 1 — web-scale
shingle sets are tiny fractions of the 2^64 hash space, so the
occupancy terms vanish): a field matches with probability
``R + (1-R)/2^b``; invert to ``R_hat = (m/P - 2^-b) / (1 - 2^-b)``.
Variance ~ R(1-R)-ish / P, so P=128..256 gives +-0.03..0.05 — the
candidate-confirmation regime, with exact verify downstream when
bit-exact Jaccard is needed.

Scale shape:

- SIGNATURES are one map-only Arrow pass: per doc, ONE murmur sweep
  over its k-byte shingles (the same vectorized kernel the sketch
  stage uses), then P approximate permutations h_p(x) =
  fmix64(x XOR salt_p) (splitmix-style bijective finalizer per salt)
  reduced by min — an (n_shingles x P) vectorized min, chunked to stay
  cache-resident. The signature leaves the scan as ceil(P*b/64)
  packed int64 words: P=128, b=4 -> 8 longs = 64 B/doc.
- COMPARISON is pure JVM SWAR inside whole-stage codegen: per word,
  ``xor``, OR-fold the b bit-lanes onto each field's low bit, mask
  with the field pattern, ``bit_count`` -> mismatched fields; no
  Python, no unpacking, 8 longs of work per pair at P=128/b=4.
  Candidates come from LSH/SimHash as everywhere else; the all-pairs
  form is fixture-scoped by contract.

Reference scope note: the reference stores full 64-bit bottom-k
sketches (`Sketch.h:136`); b-bit compression is the storage-scale
sibling from the task brief's dedup axis. NOTE the estimator needs
ALIGNED permutations, so these are k-permutation (P-permutation)
signatures, not the bottom-k sketch — the two coexist: bottom-k for
Mash-exact verify, b-bit for cheap mass confirmation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .hashing import _fmix64, hash_shingles_concat

_U64 = np.uint64


def _salts(n_perm: int, seed: int) -> np.ndarray:
    """Deterministic per-permutation salts (splitmix-style stream)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, size=n_perm, dtype=np.uint64)


def _check_layout(n_perm: int, b: int) -> int:
    if b not in (1, 2, 4, 8, 16):
        raise ValueError("b must divide 64 (1, 2, 4, 8, or 16)")
    if (n_perm * b) % 64 != 0:
        raise ValueError("n_perm * b must be a multiple of 64 "
                         "(no partially-filled words)")
    return (n_perm * b) // 64


def _pattern(b: int) -> int:
    """Signed int64 literal with the low bit of every b-bit field set."""
    pat = 0
    for i in range(64 // b):
        pat |= 1 << (b * i)
    return pat - (1 << 64) if pat >= 1 << 63 else pat


def _pack_signature(mins: np.ndarray, b: int) -> np.ndarray:
    """(P,) uint64 minhash values -> (P*b/64,) int64 packed words,
    field p at bits [p*b, (p+1)*b) of word p*b//64 (little-endian
    fields within each word)."""
    p = len(mins)
    fields = mins & _U64((1 << b) - 1)
    per_word = 64 // b
    words = np.zeros(p * b // 64, dtype=np.uint64)
    for j in range(per_word):
        words |= fields[j::per_word] << _U64(j * b)
    return words.view(np.int64)


def make_bbit_signature_udf(n_perm: int = 128, b: int = 4, k: int = 21,
                            seed: int = 42, chunk: int = 4096):
    """array<long> packed b-bit signature per text (empty array for
    docs shorter than k — unsignable rows stay visible downstream,
    matching the sketch stage's convention)."""
    _check_layout(n_perm, b)
    salts = _salts(n_perm, seed)

    @pandas_udf(ArrayType(LongType()))
    def bbit_signature_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.fillna(""):
            buf = np.frombuffer(str(t).encode("utf-8"), dtype=np.uint8)
            hashes = hash_shingles_concat(buf, k, seed)
            if len(hashes) == 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            mins = np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
            for lo in range(0, len(hashes), chunk):
                hs = hashes[lo:lo + chunk]
                # (chunk, P) permuted values; bijective per salt
                perm = _fmix64(hs[:, None] ^ salts[None, :])
                np.minimum(mins, perm.min(axis=0), out=mins)
            out.append(_pack_signature(mins, b))
        return pd.Series(out)

    return bbit_signature_udf


def bbit_signatures(docs: DataFrame, n_perm: int = 128, b: int = 4,
                    k: int = 21, seed: int = 42, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, sig): the 64/b-times-smaller signature relation."""
    udf = make_bbit_signature_udf(n_perm, b, k, seed)
    return docs.select(F.col(id_col), udf(F.col(text_col)).alias("sig"))


def _match_count_expr(sig_a, sig_b, n_perm: int, b: int):
    """Matched-field count as a pure JVM expression: per word pair,
    OR-fold the b bit-lanes of the XOR onto each field's low bit, mask,
    popcount -> mismatches; matches = P - sum(mismatches)."""
    pat = F.lit(_pattern(b)).cast("long")

    def word_mismatches(x, y):
        z = x.bitwiseXOR(y)
        folded = z
        for i in range(1, b):
            folded = folded.bitwiseOR(F.shiftrightunsigned(z, i))
        return F.bit_count(folded.bitwiseAND(pat)).cast("long")

    mism = F.aggregate(
        F.zip_with(sig_a, sig_b, word_mismatches),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    return F.lit(n_perm).cast("long") - mism


def bbit_match_pairs(signatures: DataFrame, candidates: DataFrame,
                     n_perm: int = 128, b: int = 4,
                     id_col: str = "doc_id") -> DataFrame:
    """Confirm candidate (id_a, id_b) pairs from packed signatures:
    (id_a, id_b, n_matches, jaccard_est). Two skinny attach joins +
    one codegen SWAR projection; unsignable docs (empty sig) drop out.
    ``jaccard_est`` is the collision-corrected estimator, clamped at 0
    (chance-level match rates can invert to slightly negative)."""
    _check_layout(n_perm, b)
    sa = signatures.select(F.col(id_col).alias("id_a"),
                           F.col("sig").alias("_sig_a"))
    sb = signatures.select(F.col(id_col).alias("id_b"),
                           F.col("sig").alias("_sig_b"))
    joined = (
        candidates.select("id_a", "id_b")
        .join(sa, "id_a").join(sb, "id_b")
        .filter((F.size("_sig_a") > 0) & (F.size("_sig_b") > 0))
    )
    m = _match_count_expr(F.col("_sig_a"), F.col("_sig_b"), n_perm, b)
    c = 1.0 / (1 << b)
    est = F.greatest(
        (m / F.lit(float(n_perm)) - F.lit(c)) / F.lit(1.0 - c),
        F.lit(0.0),
    )
    return joined.select(
        "id_a", "id_b", m.alias("n_matches"),
        F.round(est, 6).alias("jaccard_est"),
    )


def bbit_dup_pairs(docs: DataFrame, min_jaccard: float = 0.5,
                   n_perm: int = 128, b: int = 4, k: int = 21,
                   seed: int = 42, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """All-pairs b-bit near-dup pairs — FIXTURE-SCOPED by contract
    (the production path feeds LSH/SimHash candidates to
    ``bbit_match_pairs``). One signature pass, one self-join."""
    sigs = bbit_signatures(docs, n_perm, b, k, seed, id_col, text_col)
    a = sigs.select(F.col(id_col).alias("id_a"))
    bb = sigs.select(F.col(id_col).alias("id_b"))
    cand = (a.crossJoin(bb).filter(F.col("id_a") < F.col("id_b")))
    return bbit_match_pairs(sigs, cand, n_perm, b, id_col).filter(
        F.col("jaccard_est") >= min_jaccard)
