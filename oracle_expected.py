"""Seeded expected-output oracles for contract queries whose math is not
SQL-expressible (murmur3 / MinHash / SimHash / SRP / BPE ...).

Independence model — the same one ``tests/oracle.py`` uses: these
reference implementations reuse ONLY mashspark's numpy kernels (each
golden-tested bit-exact against the reference implementation,
tests/test_hash_goldens.py) and recompose them SERIALLY in a single
process — brute-force pair enumeration, dict group-bys, explicit python
loops — never the distributed Spark plan under test.  What the driver's
hash-compare then verifies is exactly the part pytest can't see from
inside one process: that the LSH bucketing, shuffles, joins, caps and
Arrow batching of the distributed plan lose or invent nothing.

``EXPECTED[name](sf_dir)`` -> the pandas frame the Spark contract query
must reproduce (column names AND dtypes aligned with the Spark result).
``seed_expected(name, sf_dir)`` writes it to ``.expected/<name>.parquet``
(atomic rename), where the DuckDB oracle picks it up via read_parquet.
The contract query functions call ``seed_expected`` before returning
their Spark plan, so the file is always fresh for the sf_dir under test
by the time the oracle runs.
"""

from __future__ import annotations

import os
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

EXPECTED_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".expected")

# ---------------------------------------------------------------------------
# plumbing
# ---------------------------------------------------------------------------

_DOCS_CACHE: dict = {}
_PIPE_CACHE: dict = {}


def expected_path(name: str) -> str:
    return os.path.join(EXPECTED_DIR, f"{name}.parquet")


def seed_expected(name: str, sf_dir: str) -> str:
    """Compute EXPECTED[name] for sf_dir and write it where the DuckDB
    oracle reads it. Atomic replace so concurrent runs never see a torn
    file."""
    pdf = EXPECTED[name](sf_dir)
    os.makedirs(EXPECTED_DIR, exist_ok=True)
    path = expected_path(name)
    tmp = f"{path}.tmp.{os.getpid()}"
    pdf.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


def oracle_for(name: str) -> str:
    """The DuckDB oracle: read back the seeded expected frame."""
    return f"SELECT * FROM read_parquet('{expected_path(name)}')"


def java_round(x: float, digits: int) -> float:
    """Spark's F.round on doubles: BigDecimal.valueOf(x).setScale(digits,
    HALF_UP). repr() gives the same shortest round-trip decimal form."""
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def load_docs(sf_dir: str) -> pd.DataFrame:
    """documents table as pandas, sorted by doc_id (via pyarrow, no Spark)."""
    if sf_dir not in _DOCS_CACHE:
        import pyarrow.parquet as pq

        pdf = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
        _DOCS_CACHE[sf_dir] = pdf.sort_values("doc_id").reset_index(drop=True)
    return _DOCS_CACHE[sf_dir]


def _texts(sf_dir: str) -> dict[int, str]:
    d = load_docs(sf_dir)
    return dict(zip(d["doc_id"].astype(int), d["text"].astype(str)))


# ---------------------------------------------------------------------------
# serial replica of the dedup pipeline (sketch -> exact collapse -> LSH ->
# two-tier verify -> connected components), mirroring pipeline.dedup_pipeline
# semantics with brute-force python composition
# ---------------------------------------------------------------------------


def _serial_pipeline(sf_dir: str, texts: dict[int, str] | None = None,
                     k: int = 21, s: int = 1000, seed: int = 42,
                     jt: float = 0.7, bands: int = 32, prefix: int = 128,
                     band_doc_cap: int = 64, hard_bucket_cap: int = 10_000_000):
    """-> dict(sketches, rep_pairs, clusters). Semantics mirror
    pipeline.dedup_pipeline (mashspark/pipeline.py) + lsh.candidate_pairs
    + verify.verify_pairs; composition is serial brute force."""
    import math

    from mashspark.compare import capped_merge_sorted
    from mashspark.minhash import sketch_text_bytes
    from mashspark.sketch import compute_band_keys

    key = (sf_dir, id(texts) if texts is not None else None,
           k, s, seed, jt, bands, prefix)
    if key in _PIPE_CACHE:
        return _PIPE_CACHE[key]
    if texts is None:
        texts = _texts(sf_dir)

    ids = sorted(texts)
    sketches = {
        i: sketch_text_bytes(texts[i].encode("utf-8"), k, s, seed) for i in ids
    }

    # exact collapse: identical non-empty sketches -> min-id rep
    # (pipeline.exact_collapse; fp128 grouping == content grouping here)
    by_content: dict[bytes, int] = {}
    rep_of: dict[int, int] = {}
    for i in ids:
        sk = sketches[i]
        if len(sk) == 0:
            rep_of[i] = i
            continue
        c = sk.tobytes()
        by_content.setdefault(c, i)
        rep_of[i] = by_content[c]
    reps = sorted({r for r in rep_of.values()})

    # LSH candidates over reps (lsh.candidate_pairs): band-key buckets,
    # all-pairs below band_doc_cap, star candidates (hub = min id) above
    buckets: dict[int, list[int]] = {}
    for r in reps:
        for bk in np.unique(compute_band_keys(sketches[r], bands, prefix)):
            buckets.setdefault(int(bk), []).append(r)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        members = sorted(set(members))
        n = len(members)
        if n < 2 or n > hard_bucket_cap:
            continue
        if n <= band_doc_cap:
            for x in range(n):
                for y in range(x + 1, n):
                    cand.add((members[x], members[y]))
        else:
            hub = members[0]
            for m in members[1:]:
                cand.add((hub, m))

    # two-tier verify (verify.verify_pairs): prefix pre-filter with the
    # >=6-sigma widened margin, then full-s exact capped merge
    sigma = math.sqrt(max(jt * (1.0 - jt), 0.05) / float(prefix))
    margin = max(0.15, 6.0 * sigma)
    pairs = []
    for a, b in sorted(cand):
        pa, pb = sketches[a][:prefix], sketches[b][:prefix]
        c1, d1 = capped_merge_sorted(pa, pb, prefix)
        if c1 / max(d1, 1) < jt - margin:
            continue
        c2, d2 = capped_merge_sorted(sketches[a], sketches[b], s)
        j = c2 / d2 if d2 > 0 else 0.0
        if j >= jt:
            pairs.append((a, b, int(c2), int(d2)))

    # clusters: verified rep edges + member->rep edges, min-id label
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for a, b, _, _ in pairs:
        union(a, b)
    for i, r in rep_of.items():
        union(i, r)
    members_of: dict[int, list[int]] = {}
    for i in ids:
        members_of.setdefault(find(i), []).append(i)
    clusters = {}
    for ms in members_of.values():
        lbl = min(ms)
        for i in ms:
            clusters[i] = lbl

    out = {"sketches": sketches, "rep_pairs": pairs, "clusters": clusters,
           "rep_of": rep_of}
    _PIPE_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# expected frames, one per converted contract query
# ---------------------------------------------------------------------------


def _exp_minhash_dup_pairs(sf_dir: str) -> pd.DataFrame:
    p = _serial_pipeline(sf_dir)["rep_pairs"]
    return pd.DataFrame(
        {"id_a": [a for a, *_ in p], "id_b": [b for _, b, *_ in p],
         "common": [c for *_, c, _ in p], "denom": [d for *_, d in p]},
    ).astype({"id_a": "int64", "id_b": "int64",
              "common": "int64", "denom": "int64"})


def _exp_minhash_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    clusters = _serial_pipeline(sf_dir)["clusters"]
    sizes: dict[int, int] = {}
    for lbl in clusters.values():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    hist: dict[int, int] = {}
    for n in sizes.values():
        hist[n] = hist.get(n, 0) + 1
    return pd.DataFrame(
        {"cluster_size": list(hist), "n_clusters": list(hist.values())}
    ).astype({"cluster_size": "int64", "n_clusters": "int64"})


def _exp_sketch_cardinalities(sf_dir: str) -> pd.DataFrame:
    """info.sketch_cardinalities over the pipeline's sketch table
    (kmv formula from MinHashHeap.h:45; n < s => exact n)."""
    sketches = _serial_pipeline(sf_dir)["sketches"]
    s = 1000
    rows = []
    for i in sorted(sketches):
        sk = sketches[i]
        n = len(sk)
        if n == 0:
            kmv = 0
        elif n < s:
            kmv = n
        else:
            mx = float(sk[-1])
            kmv = int(2.0**64 * n / mx) if mx else n
        rows.append((i, n, kmv))
    return pd.DataFrame(rows, columns=["doc_id", "sketch_n", "kmv_cardinality"]
                        ).astype("int64")


def _exp_simhash_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Brute-force all-pairs Hamming <= 3 over simhash_batch signatures
    (the Manku block join is exact by pigeonhole, so brute force IS the
    expected output)."""
    from mashspark.simhash import simhash_batch

    texts = _texts(sf_dir)
    ids = sorted(texts)
    sigs = simhash_batch([texts[i] for i in ids], k=8, seed=42).astype(np.uint64)
    rows = []
    for x in range(len(ids)):
        ham = _popcount64(sigs[x] ^ sigs[x + 1:])
        for off in np.flatnonzero(ham <= 3):
            rows.append((ids[x], ids[x + 1 + off], int(ham[off])))
    pdf = pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])
    return pdf.astype({"id_a": "int64", "id_b": "int64", "hamming": "int32"})


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _popcount64(v: np.ndarray) -> np.ndarray:
    v = np.atleast_1d(np.asarray(v, dtype=np.uint64))
    cnt = np.zeros(v.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        cnt += _POP8[((v >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.int64)]
    return cnt


def _exp_srp_bucket_stats(sf_dir: str) -> pd.DataFrame:
    """SRP bucket-size histogram: same seeded planes as ann.make_srp_udf,
    same float32 matmul, serial histogram."""
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    mat = np.stack([np.asarray(v, dtype=np.float32) for v in emb["embedding"]])
    dim = mat.shape[1]
    rng = np.random.default_rng(11)
    planes = rng.standard_normal((dim, 8)).astype(np.float32)
    weights = (np.uint64(1) << np.arange(8, dtype=np.uint64)).astype(np.uint64)
    signs = (mat @ planes) > 0
    bucket = (signs.astype(np.uint64) * weights[None, :]).sum(axis=1).astype(np.int64)
    _, counts = np.unique(bucket, return_counts=True)
    size, nb = np.unique(counts, return_counts=True)
    return pd.DataFrame({"bucket_size": size.astype("int64"),
                         "n_buckets": nb.astype("int64")})


def _exp_media_phash_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Replays the query's deterministic BMP generator, dHash per image
    (mashspark.phash kernel over the real BMP decode), brute-force
    all-pairs Hamming <= 6."""
    from mashspark.codecs import encode_bmp
    from mashspark.multimodal import decode_media
    from mashspark.phash import dhash_from_plane

    d = load_docs(sf_dir)
    base_ids = [int(i) for i in d["doc_id"] if int(i) < 40]
    media_ids = base_ids + [i + 100 for i in base_ids]
    sigs = {}
    for mid in media_ids:
        base_id = mid % 100
        rng = np.random.default_rng(10_000 + base_id)
        block = rng.integers(40, 200, size=(8, 8, 3), dtype=np.uint8)
        img = np.repeat(np.repeat(block, 4, axis=0), 4, axis=1)
        if mid >= 100:
            img = (img.astype(np.int32) + 15).clip(0, 255).astype(np.uint8)
        sigs[mid] = np.uint64(dhash_from_plane(decode_media(encode_bmp(img))))
    ids = sorted(sigs)
    rows = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            h = int(_popcount64(sigs[ids[x]] ^ sigs[ids[y]])[0])
            if h <= 6:
                rows.append((ids[x], ids[y], h))
    pdf = pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])
    return pdf.astype({"id_a": "int64", "id_b": "int64", "hamming": "int32"})


# --- BPE (serial reference trainer/encoder, mirrors tests/test_bpe.py) ----


def _ref_bpe_train(texts: list[str], n_merges: int,
                   min_frequency: int = 2) -> list[tuple[str, str]]:
    from collections import Counter

    wf = Counter(w for t in texts for w in t.split())
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wf.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        pair, total = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if total < min_frequency:
            break
        a, b = pair
        merges.append(pair)
        nv: dict = {}
        for syms, c in vocab.items():
            s, res, i = list(syms), [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            nv[tuple(res)] = nv.get(tuple(res), 0) + c
        vocab = nv
    return merges


def _ref_bpe_encode_len(text: str, merges: list[tuple[str, str]]) -> int:
    n = 0
    for w in text.split():
        syms = list(w) + ["</w>"]
        for a, b in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        n += len(syms)
    return n


def _bpe_expected_merges(sf_dir: str) -> list[tuple[str, str]]:
    texts = _texts(sf_dir)
    train = [texts[i] for i in sorted(texts) if i % 2 == 0]
    return _ref_bpe_train(train, n_merges=12)


def _exp_bpe_trained_merges(sf_dir: str) -> pd.DataFrame:
    merges = _bpe_expected_merges(sf_dir)
    return pd.DataFrame(
        {"rank": np.arange(len(merges), dtype="int64"),
         "left": [a for a, _ in merges], "right": [b for _, b in merges]})


def _exp_bpe_encoded_lengths(sf_dir: str) -> pd.DataFrame:
    merges = _bpe_expected_merges(sf_dir)
    texts = _texts(sf_dir)
    ids = sorted(texts)
    return pd.DataFrame(
        {"doc_id": np.asarray(ids, dtype="int64"),
         "n_bpe_tokens": np.asarray(
             [_ref_bpe_encode_len(texts[i], merges) for i in ids], dtype="int64")})


EXPECTED = {
    "minhash_dup_pairs": _exp_minhash_dup_pairs,
    "minhash_cluster_sizes": _exp_minhash_cluster_sizes,
    "sketch_cardinalities": _exp_sketch_cardinalities,
    "simhash_dup_pairs": _exp_simhash_dup_pairs,
    "srp_bucket_stats": _exp_srp_bucket_stats,
    "media_phash_dup_pairs": _exp_media_phash_dup_pairs,
    "bpe_trained_merges": _exp_bpe_trained_merges,
    "bpe_encoded_lengths": _exp_bpe_encoded_lengths,
}
