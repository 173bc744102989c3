"""DNA-mode helpers — used ONLY by the golden-parity tests.

The production pipeline sketches web text (no strand, no alphabet filter),
but the reference's golden fixtures (``/root/reference/test/ref/*``) are
genomic, so reproducing them bit-for-bit requires the DNA-specific rules:

* uppercase fold (``Sketch.cpp:524-530``),
* ACGT alphabet filter with skip-past-bad-char (``Sketch.cpp:544-567``;
  alphabet built at ``Sketch.cpp:1108-1137``),
* canonical k-mer = min(kmer, revcomp(kmer)) by memcmp
  (``Sketch.cpp:569-571``; complement table ``Sketch.cpp:1071-1106``),
* FASTQ record framing (``src/mash/kseq.h`` semantics: one sequence per
  record; k-mers never cross record boundaries).

Everything is vectorized numpy; the canonical choice uses numpy's
fixed-width byte-string comparison (no NUL bytes in ACGT so lexicographic
order == memcmp order).
"""

from __future__ import annotations

import gzip

import numpy as np
import pandas as pd

from .hashing import murmur3_x64_128_h1

_COMP = np.zeros(256, dtype=np.uint8)
for _a, _b in zip(b"ACGTacgt", b"TGCATGCA"):
    _COMP[_a] = _b

_UPPER = np.arange(256, dtype=np.uint8)
_UPPER[97:123] -= 32

_IS_ACGT = np.zeros(256, dtype=bool)
for _c in b"ACGT":
    _IS_ACGT[_c] = True


def read_fastq(path: str) -> list[bytes]:
    """Sequences (line 2 of each 4-line record) from a (gzipped) FASTQ."""
    opener = gzip.open if path.endswith(".gz") else open
    seqs = []
    with opener(path, "rb") as f:
        for i, line in enumerate(f):
            if i % 4 == 1:
                seqs.append(line.strip())
    return seqs


def canonical_kmer_hashes(seq: bytes, k: int, seed: int) -> np.ndarray:
    """All canonical k-mer hashes of one sequence, ACGT-filtered.

    Returns uint64 array, one per valid k-mer position (order = position).
    """
    arr = _UPPER[np.frombuffer(seq, dtype=np.uint8)]
    n = len(arr)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    fwd = np.ascontiguousarray(np.lib.stride_tricks.sliding_window_view(arr, k))
    # validity: window contains only ACGT (Sketch.cpp:544-567 skip loop)
    good = _IS_ACGT[arr].astype(np.int32)
    run = np.convolve(good, np.ones(k, dtype=np.int32), mode="valid") == k
    fwd = fwd[run]
    if len(fwd) == 0:
        return np.empty(0, dtype=np.uint64)
    # reverse complement of each window: revcomp whole seq then mirror index
    rc = _COMP[arr][::-1]
    rev = np.ascontiguousarray(np.lib.stride_tricks.sliding_window_view(rc, k))
    # window starting at i in fwd corresponds to rev window starting at n-i-k
    idx = np.flatnonzero(run)
    rev = np.ascontiguousarray(rev[n - k - idx])
    # memcmp via fixed-width byte strings (no NULs in ACGT)
    fb = fwd.reshape(-1).view(f"S{k}")
    rb = rev.reshape(-1).view(f"S{k}")
    use_fwd = fb <= rb
    canon = np.where(use_fwd[:, None], fwd, rev)
    return murmur3_x64_128_h1(np.ascontiguousarray(canon), seed)


def make_canonical_hashes_udf(k: int, seed: int):
    """DNA-mode mixture hasher for ``screen.screen(hashes_udf=...)``:
    sequence text -> array<long> of sign-encoded canonical k-mer hashes
    (one per valid position, repeats kept). Lets the reference's genomic
    golden fixtures run through the exact production Spark screen path."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    from .hashing import encode_signed

    @pandas_udf(ArrayType(LongType()))
    def dna_hashes_udf(seqs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_signed(canonical_kmer_hashes(s.encode("ascii"), k, seed))
                for s in seqs.fillna("")
            ]
        )

    return dna_hashes_udf


def hash_fastq_files(paths: list[str], k: int, seed: int) -> np.ndarray:
    """Concatenated canonical k-mer hash stream of all records of all files
    (reads-mode whole-file sketching, ``Sketch.cpp:1165-1270`` — record
    order is irrelevant to a bottom-k sketch)."""
    chunks = []
    for p in paths:
        for seq in read_fastq(p):
            h = canonical_kmer_hashes(seq, k, seed)
            if len(h):
                chunks.append(h)
    if not chunks:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(chunks)
