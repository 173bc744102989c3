"""Product quantization ANN (Jégou, Douze, Schmid 2011, "Product
Quantization for Nearest Neighbor Search", TPAMI — public paper): the
memory-scale path for embedding search. The vector's dim is split into
``m`` subspaces; each subspace gets its own ``k``-centroid codebook;
a vector is stored as ``m`` small codes (m bytes at k<=256) instead of
dim floats — 32x compression at dim=64/m=8/float32 — and approximate
distances are m table lookups per (query, vector), no float vector
math on the corpus at query time (ADC, asymmetric distance
computation).

Why this matters at 100 TB: an embedding column at 10^12 docs x 64
floats is 256 TB; its PQ codes at m=8 are 8 TB — the difference
between "the index fits the cluster's RAM/NVMe" and "it doesn't".
FAISS-IVFPQ is the reference design; this is the PQ half re-expressed
for Spark (compose with ``ann.ivf_*`` for the IVF half).

Scale shape:

- TRAIN (``pq_train``): per-subspace Lloyd iterations, ALL subspaces
  in ONE ``mapInPandas`` pass per iteration emitting per-partition
  partial sums — O(partitions x m x k) rows of dsub doubles collected,
  independent of corpus size (the same partials-only combine as
  ``ann.ivf_train``). Deterministic init (the k smallest ids'
  subvectors), so the ``n_iters=0`` quantizer is fully
  oracle-checkable in SQL.
- ENCODE (``pq_encode``): map-only Arrow pass, codebooks in the UDF
  closure; per batch one (batch x k) matmul per subspace. Codes are
  ``array<int>`` (m entries, each < k).
- SEARCH (``pq_search``): queries stay a DataFrame end to end (no
  driver collect — corpus-vs-corpus ANN works); only the broadcast
  codebooks ride the closure, and each Arrow batch of queries builds
  its ADC lookup tables executor-side. One map pass over the ENCODED
  corpus computes LUT-gathered distances and keeps a local top-k per
  (partition, query); the global top-k merges O(partitions x q x k)
  rows through one small window — the corpus itself never shuffles
  and its float vectors are never touched at query time.

Reference scope note: the reference engine (marbl/Mash) quantizes
sequences into bottom-k MinHash sketches — compact fingerprints
compared without touching the original data; PQ is the embedding-space
member of the same design family, from the task brief's
similarity-search axis.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType


def _bounds(dim: int, m: int) -> list[tuple[int, int]]:
    """Contiguous subspace [start, stop) bounds; dim must divide by m."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    return [(j * d, (j + 1) * d) for j in range(m)]


def _stack(vecs: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in vecs])


def _assign_subspace(mat: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """argmin_j ||x - c_j||^2 per row; ties to the LOWEST code (argmin
    returns the first minimum), matching the oracle's ORDER BY dist
    ASC, code ASC. ||x||^2 is row-constant, so comparing
    ||c_j||^2 - 2<x,c_j> is exact up to float assoc — we use the full
    squared distance to match a naive SQL oracle's arithmetic as
    closely as possible."""
    # (n, k): broadcast difference is fine at Arrow batch sizes
    d = ((mat[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def pq_train(vectors: DataFrame, m: int = 8, k: int = 16,
             n_iters: int = 5, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int | None = None,
             sample_mod: int | None = None) -> np.ndarray:
    """Train the (m, k, dim/m) codebook tensor. Init is deterministic
    (subvectors of the ``k`` smallest ids); each Lloyd iteration is ONE
    corpus pass emitting per-partition partial sums for every
    (subspace, code) cell; empty cells keep their previous centroid
    (FAISS behavior). ``sample_mod=s`` trains on the deterministic
    1/s id-hash sample — codebook quality needs a sample, not the
    corpus."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    if dim is None:
        dim = int(vectors.select(F.size(F.col(vec_col)).alias("d")).first()["d"])
    bounds = _bounds(dim, m)
    base = vectors.select(F.col(vec_col).alias("vec"))
    if sample_mod and sample_mod > 1:
        base = vectors.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0
        ).select(F.col(vec_col).alias("vec"))

    init = (
        vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("vec"))
        .orderBy("i").limit(k).collect()
    )
    if len(init) < k:
        raise ValueError(f"need >= {k} vectors to seed the codebooks")
    full = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in init])
    books = np.stack([full[:, a:b] for a, b in bounds])  # (m, k, dsub)

    partial_schema = StructType([
        StructField("sub_id", IntegerType()),
        StructField("code", IntegerType()),
        StructField("count", DoubleType()),
        StructField("sums", ArrayType(DoubleType())),
    ])

    for _ in range(max(0, n_iters)):
        cb = books.copy()

        def partials(batches: Iterator[pd.DataFrame], _cb=cb
                     ) -> Iterator[pd.DataFrame]:
            mm, kk, dsub = _cb.shape
            sums = np.zeros((mm, kk, dsub))
            counts = np.zeros((mm, kk))
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = _stack(pdf["vec"])
                for j, (a, b) in enumerate(bounds):
                    sub = mat[:, a:b]
                    assign = _assign_subspace(sub, _cb[j])
                    np.add.at(sums[j], assign, sub)
                    np.add.at(counts[j], assign, 1.0)
            subs, codes = np.nonzero(counts)
            yield pd.DataFrame({
                "sub_id": subs.astype(np.int32),
                "code": codes.astype(np.int32),
                "count": counts[subs, codes],
                "sums": [sums[s, c] for s, c in zip(subs, codes)],
            })

        parts = base.mapInPandas(partials, schema=partial_schema).collect()
        sums = np.zeros_like(books)
        counts = np.zeros(books.shape[:2])
        for r in parts:
            sums[r["sub_id"], r["code"]] += np.asarray(r["sums"])
            counts[r["sub_id"], r["code"]] += r["count"]
        nz = counts > 0
        books[nz] = sums[nz] / counts[nz][:, None]
    return books


def make_pq_encode_udf(codebooks: np.ndarray):
    """array<int> of m codes per embedding; codebooks ride the closure."""
    cb = np.asarray(codebooks, dtype=np.float64)
    mm, _, dsub = cb.shape

    @pandas_udf(ArrayType(IntegerType()))
    def pq_encode_udf(vecs: pd.Series) -> pd.Series:
        mat = _stack(vecs)
        codes = np.empty((len(mat), mm), dtype=np.int32)
        for j in range(mm):
            codes[:, j] = _assign_subspace(
                mat[:, j * dsub:(j + 1) * dsub], cb[j])
        return pd.Series(list(codes))

    return pq_encode_udf


def pq_encode(vectors: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, codes) — the m-byte-per-vector compressed index relation."""
    udf = make_pq_encode_udf(codebooks)
    return vectors.select(
        F.col(id_col), udf(F.col(vec_col)).alias("codes"))


def pq_adc_reference(query: np.ndarray, codes: np.ndarray,
                     codebooks: np.ndarray) -> np.ndarray:
    """Single-process ADC distances (tests + docs): LUT[j, c] =
    ||q_sub_j - codebook[j, c]||^2; dist(v) = sum_j LUT[j, codes[v, j]]."""
    cb = np.asarray(codebooks, dtype=np.float64)
    mm, _, dsub = cb.shape
    q = np.asarray(query, dtype=np.float64)
    lut = np.stack([
        ((q[j * dsub:(j + 1) * dsub][None, :] - cb[j]) ** 2).sum(axis=1)
        for j in range(mm)
    ])  # (m, k)
    return lut[np.arange(mm)[None, :], codes].sum(axis=1)


# ---------------------------------------------------------------------------
# IVFPQ — coarse quantizer (ann.ivf_*) + residual PQ, composed
# ---------------------------------------------------------------------------
# The FAISS IVFPQ design: assign each vector to its nearest coarse
# centroid, PQ-encode the RESIDUAL (x - centroid) — residuals are far
# more compressible than raw vectors because the coarse quantizer has
# already removed the between-cluster variance — and at query time
# probe only nprobe lists, with a per-(query, list) LUT built from the
# query's residual against that list's centroid.


def _ivf_assign_np(mat: np.ndarray, cent_norm: np.ndarray) -> np.ndarray:
    """Cosine assignment matching ann.make_ivf_assign_udf (normalized
    rows x normalized centroids, argmax, ties to the lower list)."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return ((mat / norms) @ cent_norm.T).argmax(axis=1)


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def ivfpq_train(vectors: DataFrame, n_lists: int = 8, m: int = 4,
                k: int = 16, n_iters: int = 4, coarse_iters: int = 4,
                id_col: str = "vec_id", vec_col: str = "embedding",
                sample_mod: int | None = None
                ) -> tuple[np.ndarray, np.ndarray]:
    """(coarse centroids (n_lists, dim), residual codebooks (m, k,
    dim/m)). The coarse quantizer is ``ann.ivf_train``; the PQ
    codebooks train on residuals via the same partials-only Lloyd —
    the residual projection is a map-only Arrow pass, so training
    stays two corpus passes per iteration total, nothing collected
    beyond O(partitions x m x k) partials."""
    from pyspark.sql.types import DoubleType

    from mashspark.ann import ivf_train

    cent = ivf_train(vectors, n_lists=n_lists, n_iters=coarse_iters,
                     id_col=id_col, vec_col=vec_col,
                     sample_mod=sample_mod)
    cn = _norm_rows(np.asarray(cent, dtype=np.float64))

    @pandas_udf(ArrayType(DoubleType()))
    def residual_udf(vecs: pd.Series) -> pd.Series:
        mat = _stack(vecs)
        assign = _ivf_assign_np(mat, cn)
        return pd.Series(list(mat - cent[assign]))

    resid = vectors.select(
        F.col(id_col), residual_udf(F.col(vec_col)).alias(vec_col))
    books = pq_train(resid, m=m, k=k, n_iters=n_iters, id_col=id_col,
                     vec_col=vec_col)
    return cent, books


def ivfpq_index(vectors: DataFrame, centroids: np.ndarray,
                codebooks: np.ndarray, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """(id, list_id, codes): ONE map-only Arrow pass assigns the coarse
    list and PQ-encodes the residual — the stored index relation is
    8 + 4 + m bytes per vector."""
    from pyspark.sql.types import (IntegerType as _I, LongType as _L,
                                   StructField, StructType)

    cent = np.asarray(centroids, dtype=np.float64)
    cn = _norm_rows(cent)
    cb = np.asarray(codebooks, dtype=np.float64)
    mm, _, dsub = cb.shape

    schema = StructType([
        StructField("id", _L()),
        StructField("list_id", _L()),
        StructField("codes", ArrayType(_I())),
    ])

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _stack(pdf["vec"])
            assign = _ivf_assign_np(mat, cn)
            resid = mat - cent[assign]
            codes = np.empty((len(mat), mm), dtype=np.int32)
            for j in range(mm):
                codes[:, j] = _assign_subspace(
                    resid[:, j * dsub:(j + 1) * dsub], cb[j])
            yield pd.DataFrame({
                "id": pdf["id"].to_numpy(dtype=np.int64),
                "list_id": assign.astype(np.int64),
                "codes": list(codes),
            })

    v = vectors.select(F.col(id_col).alias("id"),
                       F.col(vec_col).alias("vec"))
    return v.mapInPandas(build, schema=schema)


def ivfpq_search(index: DataFrame, queries: DataFrame,
                 centroids: np.ndarray, codebooks: np.ndarray,
                 top_k: int = 5, nprobe: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k over the IVFPQ index: each query probes its
    ``nprobe`` nearest lists (cosine, matching the index assignment)
    and scores ONLY rows in those lists, by ADC against a per-(query,
    list) residual LUT.

    Fully distributed — queries stay a DataFrame end to end (the former
    formulation collected them to the driver and shipped a q×nprobe×m×k
    LUT tensor in the task closure, capping the query side at driver
    memory; corpus-vs-corpus search was impossible):

    1. probe assignment is a map-only Arrow pass over the QUERY relation
       (only the n_lists x dim centroid matrix rides the closure — small
       by construction of a coarse quantizer), emitting skinny
       (query_id, list_id, qvec) probe rows;
    2. probes equi-join the index on ``list_id`` — at scale the index is
       stored bucketed by list_id, so this is the co-located join, and a
       probed list never moves unless some query probes it;
    3. ADC is one Arrow pass over the joined relation: per batch, the
       residual LUT is built ONCE per distinct (query, list) group and
       gathered over that group's codes — executor-side, never on the
       driver;
    4. global top-k is a rank-limited window (Spark pushes the limit
       into the shuffle as WindowGroupLimit), ties to the smaller
       neighbor id.

    Output: (query_id, neighbor_id, adc_dist, rank).
    """
    from pyspark.sql.types import (ArrayType as _A, DoubleType, LongType,
                                   StructField, StructType)

    cent = np.asarray(centroids, dtype=np.float64)
    cn = _norm_rows(cent)
    cb = np.asarray(codebooks, dtype=np.float64)
    mm, kk, dsub = cb.shape
    nprobe = min(nprobe, cent.shape[0])

    probe_schema = StructType([
        StructField("query_id", LongType()),
        StructField("list_id", LongType()),
        StructField("qvec", _A(DoubleType())),
    ])

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            qids = pdf["qid"].to_numpy(dtype=np.int64)
            qmat = _stack(pdf["qvec"])
            sims = _norm_rows(qmat) @ cn.T
            order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame({
                "query_id": np.repeat(qids, nprobe),
                "list_id": order.ravel().astype(np.int64),
                "qvec": [qmat[i] for i in range(len(qids))
                         for _ in range(nprobe)],
            })

    probes = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    ).mapInPandas(probe, schema=probe_schema)

    # shuffle-hash: both sides are skinny (probe rows / m-byte codes);
    # a sort-merge would sort the fat side for nothing and the probe
    # side is unbounded at corpus-vs-corpus scale, so no broadcast
    cand = probes.hint("shuffle_hash").join(index, "list_id")

    out_schema = StructType([
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("adc_dist", DoubleType()),
    ])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        jj = np.arange(mm)[None, :]
        for pdf in batches:
            if not len(pdf):
                continue
            qids = pdf["query_id"].to_numpy(dtype=np.int64)
            lists = pdf["list_id"].to_numpy(dtype=np.int64)
            ids = pdf["id"].to_numpy(dtype=np.int64)
            codes = np.stack([np.asarray(c, dtype=np.int64)
                              for c in pdf["codes"]])
            dists = np.empty(len(pdf), dtype=np.float64)
            # one LUT per distinct (query, list) group in the batch
            order = np.lexsort((lists, qids))
            oq, ol = qids[order], lists[order]
            starts = np.flatnonzero(
                np.r_[True, (oq[1:] != oq[:-1]) | (ol[1:] != ol[:-1])])
            ends = np.r_[starts[1:], len(order)]
            qvecs = pdf["qvec"].to_numpy()
            for s0, e0 in zip(starts, ends):
                rows = order[s0:e0]
                q = np.asarray(qvecs[rows[0]], dtype=np.float64)
                r = q - cent[ol[s0]]
                lut = np.stack([
                    ((r[j * dsub:(j + 1) * dsub][None, :] - cb[j]) ** 2
                     ).sum(axis=1)
                    for j in range(mm)
                ])
                dists[rows] = lut[jj, codes[rows]].sum(axis=1)
            yield pd.DataFrame({
                "query_id": qids, "neighbor_id": ids, "adc_dist": dists,
            })

    local = (
        cand.mapInPandas(score, schema=out_schema)
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def pq_search(vectors: DataFrame, queries: DataFrame,
              codebooks: np.ndarray, top_k: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k neighbors by ADC over PQ codes — the exhaustive
    (IVF-free) scan, as a blocked cross product of two PACKED relations.

    Fully distributed — queries stay a DataFrame end to end (the former
    formulation collected them to the driver and shipped a q x m x k LUT
    tensor in the task closure, capping the query side at driver memory):

    1. the corpus is encoded map-only and PACKED — one row per Arrow
       batch carrying (ids blob, codes blob), no shuffle (a flat PQ scan
       touches every code for every query by definition, so the unit of
       work is "query chunk x code block");
    2. the query relation is packed the same way (id + vector blobs);
    3. packed_queries x packed_blocks is a crossJoin of two TINY
       relations (rows = corpus/batch x queries/batch, each row scoring
       batch x batch pairs vectorized); LUTs are built per joined row,
       executor-side;
    4. each joined row emits only its local top-k per query; the global
       top-k is the same rank-limited window every ANN operator here
       uses (ties to the smaller neighbor id).

    Output: (query_id, neighbor_id, adc_dist, rank), self-matches
    excluded. Exhaustive-scan cost is inherent to flat PQ — use
    ``ivfpq_search`` when probing can bound the scanned fraction.
    """
    from pyspark.sql.types import (BinaryType, DoubleType, IntegerType as _I,
                                   LongType, StructField, StructType)

    cb = np.asarray(codebooks, dtype=np.float64)
    mm, kk, dsub = cb.shape

    block_schema = StructType([
        StructField("ids", BinaryType()),
        StructField("codes", BinaryType()),
        StructField("n", _I()),
    ])

    def pack_codes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _stack(pdf["vec"])
            codes = np.empty((len(mat), mm), dtype=np.int32)
            for j in range(mm):
                codes[:, j] = _assign_subspace(
                    mat[:, j * dsub:(j + 1) * dsub], cb[j])
            yield pd.DataFrame({
                "ids": [pdf["id"].to_numpy(dtype="<i8").tobytes()],
                "codes": [codes.astype("<i4").tobytes()],
                "n": [len(mat)],
            })

    qblock_schema = StructType([
        StructField("qids", BinaryType()),
        StructField("qvecs", BinaryType()),
        StructField("qn", _I()),
    ])

    def pack_queries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            qmat = _stack(pdf["qvec"])
            yield pd.DataFrame({
                "qids": [pdf["qid"].to_numpy(dtype="<i8").tobytes()],
                "qvecs": [qmat.astype("<f8").tobytes()],
                "qn": [len(qmat)],
            })

    blocks = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).mapInPandas(pack_codes, schema=block_schema)
    qblocks = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    ).mapInPandas(pack_queries, schema=qblock_schema)

    out_schema = StructType([
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("adc_dist", DoubleType()),
    ])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        jj = np.arange(mm)[None, :]
        for pdf in batches:
            out_q, out_n, out_d = [], [], []
            for row in pdf.itertuples(index=False):
                ids = np.frombuffer(row.ids, dtype="<i8")
                codes = np.frombuffer(row.codes, dtype="<i4").reshape(
                    int(row.n), mm).astype(np.int64)
                qids = np.frombuffer(row.qids, dtype="<i8")
                qmat = np.frombuffer(row.qvecs, dtype="<f8").reshape(
                    int(row.qn), mm * dsub)
                # (q, m, k) LUTs for this chunk, then (q, n) gather-sum
                luts = np.stack([
                    ((qmat[:, j * dsub:(j + 1) * dsub][:, None, :]
                      - cb[j][None, :, :]) ** 2).sum(axis=2)
                    for j in range(mm)
                ], axis=1)
                dists = luts[:, jj, codes].sum(axis=2)  # (q, n)
                keep = min(top_k + 1, dists.shape[1])  # +1 absorbs self
                for qi in range(len(qids)):
                    d = dists[qi]
                    if keep < len(d):
                        # pool = everything <= the keep-th smallest dist:
                        # PQ codes make exact distance ties common, and a
                        # bare argpartition would keep an ARBITRARY subset
                        # of the tied boundary — the contract (and the
                        # global window) break ties by smaller id, so the
                        # whole tie set must reach the lexsort
                        kth = np.partition(d, keep - 1)[keep - 1]
                        part = np.flatnonzero(d <= kth)
                    else:
                        part = np.arange(len(d))
                    sel = part[np.lexsort((ids[part], d[part]))]
                    sel = sel[ids[sel] != qids[qi]][:top_k]
                    out_q.append(np.full(len(sel), qids[qi], dtype=np.int64))
                    out_n.append(ids[sel])
                    out_d.append(d[sel])
            if out_q:
                yield pd.DataFrame({
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "adc_dist": np.concatenate(out_d),
                })

    local = qblocks.crossJoin(blocks).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
