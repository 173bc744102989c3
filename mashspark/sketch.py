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
from pyspark.sql.types import (ArrayType, BinaryType, IntegerType, LongType,
                               StructField, StructType)

from .hashing import _fmix64, encode_signed, hash_shingles_concat
from .minhash import bottom_k, kmv_set_size
from .params import LSHParams, SketchParams

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_BANDSEED = np.uint64(0xA5A5A5A55A5A5A5A)

SKETCH_FIELDS = StructType(
    [
        # sketch = sign-flip-encoded int64 hashes, ascending unsigned,
        # packed little-endian into ONE binary blob: shuffling/caching an
        # opaque byte[] is a memcpy, while array<long> pays per-element
        # UnsafeArrayData + columnar-cache encoding (measured ~7x slower
        # on the fat repartition at bench scale).
        StructField("sketch", BinaryType(), False),
        StructField("n_kmers", LongType(), False),
        StructField("card_est", LongType(), False),
        StructField("band_key", ArrayType(LongType()), False),
        # 128-bit fingerprint of the sketch content (sketch_fp128):
        # exact-duplicate collapse groups on (fp1, fp2) — 24 B/doc through
        # the shuffle instead of the 8 KB sketch array, collision-safe at
        # 10^12 docs (2^-128 birthday margin), unlike a single 64-bit key.
        StructField("fp1", LongType(), False),
        StructField("fp2", LongType(), False),
    ]
)


def compute_band_keys(sketch_u64: np.ndarray, bands: int,
                      prefix: int | None = None) -> np.ndarray:
    """band_key uint64[] (one per non-empty residue class) for one sketch.

    Operates on the bottom-``prefix`` prefix of the sketch (a bottom-k
    sketch of the same stream — fewer elements per band means a higher
    per-band match rate, see LSHParams). Band of element h =
    ``h & (bands-1)``; key = order-independent fingerprint (xor-fold of
    fmix64-mixed elements, cardinality and residue class all mixed in —
    the class is IN the key, so a single int64 is a complete bucket id).
    Key collisions only add false candidates — the Mash-exact verify pass
    removes them — so a fold fingerprint is safe here.
    """
    if prefix is not None:
        sketch_u64 = sketch_u64[:prefix]
    if len(sketch_u64) == 0:
        return np.empty(0, dtype=np.uint64)
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
    return keys


_FPS1 = np.uint64(0x5851F42D4C957F2D)
_FPS2 = np.uint64(0x2545F4914F6CDD1D)


def sketch_fp128(sk: np.ndarray) -> tuple[int, int]:
    """128-bit content fingerprint of a sketch (two independent xor-folds
    of fmix64-mixed elements + cardinality). Distinct-in-one-element
    sketches can never collide; random multi-element differences collide
    with ~2^-128 probability — safe for exact-dup collapse at 10^12 docs.
    Vectorized (3 array ops per doc) — a streaming murmur over the 8 KB
    sketch bytes here would be a 500-step scalar loop per doc."""
    if len(sk) == 0:
        return 0, 0
    n = np.array([len(sk)], dtype=np.uint64)  # 1-elem array: silent wraparound
    f1 = np.bitwise_xor.reduce(_fmix64(sk ^ _FPS1)) ^ _fmix64(n * _GOLD ^ _FPS1)[0]
    f2 = np.bitwise_xor.reduce(_fmix64(sk ^ _FPS2)) ^ _fmix64(n * _GOLD ^ _FPS2)[0]
    return int(np.uint64(f1).view(np.int64)), int(np.uint64(f2).view(np.int64))


def batch_band_keys(sketches: list, bands: int, prefix: int | None):
    """``compute_band_keys`` for a whole batch of sketches with ONE stable
    argsort + reduceat over the concatenation (group key = doc*bands +
    residue class) instead of ~10 small numpy calls per document — the
    per-doc calls were half the sketch UDF's CPU. Bit-identical outputs
    (asserted by tests). Returns a list of int64 arrays."""
    n_docs = len(sketches)
    pres = [
        (sk[:prefix] if prefix is not None else sk) for sk in sketches
    ]
    lens = np.array([len(p) for p in pres], dtype=np.int64)
    out: list = [None] * n_docs
    nz = np.flatnonzero(lens)
    if len(nz) == 0:
        return [np.empty(0, dtype=np.int64) for _ in range(n_docs)]
    vals = np.concatenate([pres[i] for i in nz])
    doc_of = np.repeat(np.arange(len(nz), dtype=np.uint64), lens[nz])
    mask = np.uint64(bands - 1)
    cls = vals & mask
    g = doc_of * np.uint64(bands) + cls
    order = np.argsort(g, kind="stable")
    gs = g[order]
    mixed = _fmix64(vals[order] * _GOLD ^ _BANDSEED)
    starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
    xors = np.bitwise_xor.reduceat(mixed, starts)
    counts = np.diff(np.r_[starts, len(gs)]).astype(np.uint64)
    idx = gs[starts] & mask
    keys = _fmix64(xors ^ _fmix64(counts * _GOLD ^ idx ^ _BANDSEED)).view(np.int64)
    group_doc = (gs[starts] // np.uint64(bands)).astype(np.int64)
    bounds = np.searchsorted(group_doc, np.arange(len(nz) + 1, dtype=np.int64))
    for j, i in enumerate(nz):
        out[i] = keys[bounds[j] : bounds[j + 1]]
    for i in np.flatnonzero(lens == 0):
        out[i] = np.empty(0, dtype=np.int64)
    return out


def batch_fp128(sketches: list):
    """``sketch_fp128`` for a whole batch via two reduceat passes.
    Bit-identical outputs (asserted by tests). Returns (fp1, fp2) int64
    arrays."""
    n_docs = len(sketches)
    lens = np.array([len(sk) for sk in sketches], dtype=np.int64)
    fp1 = np.zeros(n_docs, dtype=np.int64)
    fp2 = np.zeros(n_docs, dtype=np.int64)
    nz = np.flatnonzero(lens)
    if len(nz) == 0:
        return fp1, fp2
    vals = np.concatenate([sketches[i] for i in nz])
    starts = np.zeros(len(nz), dtype=np.int64)
    np.cumsum(lens[nz][:-1], out=starts[1:])
    n_u = lens[nz].astype(np.uint64)
    f1 = np.bitwise_xor.reduceat(_fmix64(vals ^ _FPS1), starts) ^ _fmix64(
        n_u * _GOLD ^ _FPS1
    )
    f2 = np.bitwise_xor.reduceat(_fmix64(vals ^ _FPS2), starts) ^ _fmix64(
        n_u * _GOLD ^ _FPS2
    )
    fp1[nz] = f1.view(np.int64)
    fp2[nz] = f2.view(np.int64)
    return fp1, fp2


def make_sketch_udf(params: SketchParams, lsh: LSHParams):
    k, s, seed, min_cov = params.k, params.s, params.seed, params.min_cov
    bands, prefix = lsh.bands, lsh.prefix

    @pandas_udf(SKETCH_FIELDS)
    def sketch_udf(texts: pd.Series) -> pd.DataFrame:
        vals = texts.fillna("").astype(str).tolist()
        bufs = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in vals]
        lens = [len(b) for b in bufs]
        big = np.concatenate(bufs) if bufs else np.empty(0, dtype=np.uint8)
        all_h = hash_shingles_concat(big, k, seed)

        n_rows = len(lens)
        raw_sketches, sketches = [], []
        n_kmers = np.zeros(n_rows, dtype=np.int64)
        cards = np.zeros(n_rows, dtype=np.int64)
        off = 0
        for i, blen in enumerate(lens):
            if blen < k:
                sk = np.empty(0, dtype=np.uint64)
                nk = 0
            else:
                nk = blen - k + 1
                sk = bottom_k(all_h[off : off + nk], s, min_cov=min_cov)
            off += blen
            n_kmers[i] = nk
            cards[i] = kmv_set_size(sk) if len(sk) >= s else len(sk)
            raw_sketches.append(sk)
            sketches.append(encode_signed(sk).tobytes())  # int64 IS <i8 here (LE asserted)
        bkeys = batch_band_keys(raw_sketches, bands, prefix)
        fp1, fp2 = batch_fp128(raw_sketches)
        return pd.DataFrame(
            {
                "sketch": sketches,
                "n_kmers": n_kmers,
                "card_est": cards,
                "band_key": bkeys,
                "fp1": fp1,
                "fp2": fp2,
            }
        )

    return sketch_udf


COUNT_SKETCH_FIELDS = StructType(
    [
        StructField("sketch", BinaryType(), False),
        # multiplicity of each surviving sketch hash, aligned with the
        # sketch order (reference -M counts, HashSet.cpp:48-76)
        StructField("counts", ArrayType(IntegerType()), False),
        StructField("n_kmers", LongType(), False),
        StructField("card_est", LongType(), False),
    ]
)


def make_minhash_count_udf(params: SketchParams):
    """SURVEY §2.8 ``minhash_count_udf``: text -> struct<sketch, counts,
    n_kmers, card_est> — the A1 bottom-k sketch WITH per-hash multiplicities
    (reference reads-mode ``-M``/``-m``, ``MinHashHeap.cpp:96-118``,
    ``HashSet.cpp:48-76``). Same single-murmur-pass batch layout as
    ``make_sketch_udf``; counts feed the coverage estimate (A6,
    ``MinHashHeap.h:44``) and the count histogram (A7,
    ``CommandInfo.cpp:187-220``)."""
    k, s, seed, min_cov = params.k, params.s, params.seed, params.min_cov

    @pandas_udf(COUNT_SKETCH_FIELDS)
    def minhash_count_udf(texts: pd.Series) -> pd.DataFrame:
        vals = texts.fillna("").astype(str).tolist()
        bufs = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in vals]
        lens = [len(b) for b in bufs]
        big = np.concatenate(bufs) if bufs else np.empty(0, dtype=np.uint8)
        all_h = hash_shingles_concat(big, k, seed)

        n_rows = len(lens)
        sketches, counts_col = [], []
        n_kmers = np.zeros(n_rows, dtype=np.int64)
        cards = np.zeros(n_rows, dtype=np.int64)
        off = 0
        for i, blen in enumerate(lens):
            if blen < k:
                sk = np.empty(0, dtype=np.uint64)
                cnt = np.empty(0, dtype=np.int32)
                nk = 0
            else:
                nk = blen - k + 1
                sk, cnt = bottom_k(
                    all_h[off : off + nk], s, min_cov=min_cov, with_counts=True
                )
            off += blen
            n_kmers[i] = nk
            cards[i] = kmv_set_size(sk) if len(sk) >= s else len(sk)
            sketches.append(encode_signed(sk).tobytes())  # int64 IS <i8 here (LE asserted)
            counts_col.append(cnt)
        return pd.DataFrame(
            {
                "sketch": sketches,
                "counts": counts_col,
                "n_kmers": n_kmers,
                "card_est": cards,
            }
        )

    return minhash_count_udf


def sketch_documents_with_counts(df: DataFrame, params: SketchParams,
                                 id_col: str = "doc_id",
                                 text_col: str = "text") -> DataFrame:
    """documents -> (doc_id, sketch, counts, n_kmers, card_est). Map-only,
    like ``sketch_documents`` but with multiplicities kept (A2)."""
    udf = make_minhash_count_udf(params)
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .withColumn("_sk", udf(F.col("text")))
        .select(
            "doc_id",
            F.col("_sk.sketch").alias("sketch", metadata=_params_meta(params)),
            F.col("_sk.counts").alias("counts"),
            F.col("_sk.n_kmers").alias("n_kmers"),
            F.col("_sk.card_est").alias("card_est"),
        )
    )


def _params_meta(params: SketchParams) -> dict:
    from .params import PARAMS_META_KEY

    return {PARAMS_META_KEY: params.to_dict()}


def make_sketch_arrow_gen(params: SketchParams, lsh: LSHParams,
                          id_col: str = "doc_id", text_col: str = "text"):
    """mapInArrow generator: RecordBatch(doc_id, text) -> RecordBatch(
    doc_id, sketch, n_kmers, card_est, band_key, fp1, fp2).

    Why Arrow-native instead of a pandas UDF: the UDF's numpy core is
    ~flat across parallelism, but the pandas wrapping was measured to
    stall workers between batches — materializing every document as a
    Python str on input and every 8 KB sketch as a Python bytes on output
    is per-doc interpreter work plus an extra copy each way. Here the
    input text is read straight out of the Arrow string buffer (the
    offsets+data layout IS the concatenated-bytes layout the one-pass
    murmur wants, zero copies), and the output sketch/band columns are
    built zero-copy from numpy buffers.
    """
    import pyarrow as pa

    k, s, seed, min_cov = params.k, params.s, params.seed, params.min_cov
    bands, prefix = lsh.bands, lsh.prefix

    def gen(batches):
        for batch in batches:
            n_rows = batch.num_rows
            if n_rows == 0:
                continue
            ids = batch.column(id_col)
            txt = batch.column(text_col)
            if isinstance(txt, pa.ChunkedArray):
                txt = txt.combine_chunks()
            if txt.null_count:
                txt = txt.fill_null("")
            if pa.types.is_large_string(txt.type):
                txt = txt.cast(pa.string())
            bufs = txt.buffers()
            all_offs = np.frombuffer(bufs[1], dtype=np.int32)
            offs = all_offs[txt.offset : txt.offset + n_rows + 1]
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            # one explicit copy into process-heap memory: repeated reads
            # from the Arrow-allocated buffer are ~11x slower on this host
            # (measured) — the copy is 2 MB/batch and pays for itself in
            # the first murmur chunk
            big = data[offs[0] : offs[-1]].copy()
            lens = np.diff(offs)

            all_h = hash_shingles_concat(big, k, seed)

            # per-row: only the bottom-k itself. Band keys and fp128 go
            # through their BATCH kernels (one stable argsort/reduceat
            # over the whole batch, bit-identical to the per-doc forms —
            # asserted by tests): the per-doc calls were ~2/3 of this
            # generator's CPU (profiled round 4: 0.89 s of 1.31 s at
            # 5k docs — the round-3 q1 sketch regression).
            raw_sks, sk_parts = [], []
            sk_offs = np.zeros(n_rows + 1, dtype=np.int32)
            bk_offs = np.zeros(n_rows + 1, dtype=np.int32)
            n_kmers = np.zeros(n_rows, dtype=np.int64)
            cards = np.zeros(n_rows, dtype=np.int64)
            off = 0
            for i in range(n_rows):
                blen = int(lens[i])
                if blen < k:
                    sk = np.empty(0, dtype=np.uint64)
                    nk = 0
                else:
                    nk = blen - k + 1
                    sk = bottom_k(all_h[off : off + nk], s, min_cov=min_cov)
                off += blen
                n_kmers[i] = nk
                cards[i] = kmv_set_size(sk) if len(sk) >= s else len(sk)
                raw_sks.append(sk)
                sk_parts.append(encode_signed(sk))
                sk_offs[i + 1] = sk_offs[i] + 8 * len(sk)
            bkeys = batch_band_keys(raw_sks, bands, prefix)
            fp1, fp2 = batch_fp128(raw_sks)
            bk_parts = bkeys
            for i in range(n_rows):
                bk_offs[i + 1] = bk_offs[i] + len(bkeys[i])

            sk_values = (
                np.concatenate(sk_parts).view(np.uint8)  # int64 IS <i8 (LE)
                if sk_parts else np.empty(0, dtype=np.uint8)
            )
            bk_values = (
                np.concatenate(bk_parts) if bk_parts else np.empty(0, dtype=np.int64)
            )
            sketch_arr = pa.Array.from_buffers(
                pa.binary(), n_rows,
                [None, pa.py_buffer(sk_offs), pa.py_buffer(sk_values)],
            )
            band_arr = pa.ListArray.from_arrays(
                pa.array(bk_offs, type=pa.int32()),
                pa.array(bk_values, type=pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    sketch_arr,
                    pa.array(n_kmers, type=pa.int64()),
                    pa.array(cards, type=pa.int64()),
                    band_arr,
                    pa.array(fp1, type=pa.int64()),
                    pa.array(fp2, type=pa.int64()),
                ],
                names=["doc_id", "sketch", "n_kmers", "card_est",
                       "band_key", "fp1", "fp2"],
            )

    return gen


def sketch_documents(df: DataFrame, params: SketchParams, lsh: LSHParams,
                     id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """documents -> (doc_id, sketch, n_kmers, card_est, band_key, fp1, fp2).

    Map-only, one vectorized Arrow pass (``make_sketch_arrow_gen``). Docs
    shorter than k yield an EMPTY sketch inside the UDF (reference skips
    such records, ``Sketch.cpp:337-341``); they stay in the output as
    unsketchable rows so downstream cluster assignment keeps them as
    singletons.

    Round-6 reversal of the round-4 mapInArrow rejection: with the u64
    murmur kernel and lean bottom_k the numpy core got ~2x faster, so the
    pandas wrapping (per-doc str materialization in, per-doc bytes out)
    became the larger share — re-measured at 12 cores on the 70k-doc
    bench corpus: arrow 1.85 s vs pandas 2.35 s noop-isolated, rows
    bit-identical (pinned by test_sketch_arrow_matches_pandas). The
    pandas UDF (``make_sketch_udf``) remains for callers that need it.
    """
    from pyspark.sql.types import StructField, StructType

    gen = make_sketch_arrow_gen(params, lsh)
    out_schema = StructType(
        [StructField("doc_id", LongType(), False)] + list(SKETCH_FIELDS.fields)
    )
    out = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .mapInArrow(gen, schema=out_schema)
        .select(
            "doc_id",
            # params fingerprint rides in the column metadata so downstream
            # comparisons can refuse incompatible tables (F6, Sketch.cpp:133-160)
            F.col("sketch").alias("sketch", metadata=_params_meta(params)),
            "n_kmers",
            "card_est",
            "band_key",
            "fp1",
            "fp2",
        )
    )
    return out
