"""Offline (no-Spark) profile of the sketch-UDF numpy kernels.

Generates webtext-shaped docs (100-600 words) and attributes CPU between:
murmur window hashing, per-doc bottom_k, batch band keys, batch fp128,
and the pandas/Arrow glue is excluded (measured separately in-bench).

Usage: python tools/prof_sketch_kernel.py [n_docs]
"""
import os
import sys
import time

for v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[v] = "1"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mashspark.hashing import hash_shingles_concat, encode_signed
from mashspark.minhash import bottom_k, kmv_set_size
from mashspark.sketch import batch_band_keys, batch_fp128

K, S, SEED = 21, 1000, 42
BANDS, PREFIX = 32, 128


def make_docs(n, rng):
    words = ["w%04d" % i for i in range(5000)]
    docs = []
    for _ in range(n):
        nw = rng.integers(100, 600)
        docs.append(" ".join(words[i] for i in rng.integers(0, 5000, nw)))
    return docs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rng = np.random.default_rng(7)
    docs = make_docs(n, rng)
    bufs = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in docs]
    lens = [len(b) for b in bufs]
    big = np.concatenate(bufs)
    total_bytes = len(big)

    # warm scratch pools
    hash_shingles_concat(big[: 1 << 20], K, SEED)

    t0 = time.perf_counter()
    all_h = hash_shingles_concat(big, K, SEED)
    t_hash = time.perf_counter() - t0

    t0 = time.perf_counter()
    raw = []
    off = 0
    n_wins = 0
    for blen in lens:
        nk = blen - K + 1
        sk = bottom_k(all_h[off : off + nk], S)
        raw.append(sk)
        off += blen
        n_wins += nk
    t_bk = time.perf_counter() - t0

    t0 = time.perf_counter()
    for sk in raw:
        kmv_set_size(sk)
    t_kmv = time.perf_counter() - t0

    t0 = time.perf_counter()
    enc = [encode_signed(sk).astype("<i8").tobytes() for sk in raw]
    t_enc = time.perf_counter() - t0

    t0 = time.perf_counter()
    batch_band_keys(raw, BANDS, PREFIX)
    t_band = time.perf_counter() - t0

    t0 = time.perf_counter()
    batch_fp128(raw)
    t_fp = time.perf_counter() - t0

    tot = t_hash + t_bk + t_kmv + t_enc + t_band + t_fp
    print(f"docs={n} bytes={total_bytes/1e6:.1f}MB windows={n_wins/1e6:.2f}M")
    for name, t in [("hash", t_hash), ("bottom_k", t_bk), ("kmv", t_kmv),
                    ("encode", t_enc), ("band_keys", t_band), ("fp128", t_fp)]:
        print(f"  {name:10s} {t*1e3:8.1f} ms  {100*t/tot:5.1f}%")
    print(f"  total      {tot*1e3:8.1f} ms  "
          f"({n_wins/tot/1e6:.1f} Mwin/s, {n/tot:.0f} docs/s/core)")
    _ = enc


if __name__ == "__main__":
    main()
