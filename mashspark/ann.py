"""Embedding similarity search: brute-force cosine top-k (baseline) and an
LSH-bucketed approximate variant (scale path), plus embedding-cosine
near-duplicate pairs (task brief: similarity search + embedding near-dup).

Brute force stays entirely JVM-side: the query set is broadcast, the dot
product is ``aggregate(zip_with(...))`` over array<float> columns (no
Python in the loop), ranking is a window ``row_number``. The scale path
buckets vectors by random-hyperplane signs (SRP-LSH) so only same-bucket
pairs are scored — the bucketing UDF is vectorized numpy over Arrow.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType


def _cos_expr(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / F.greatest(na * nb, F.lit(1e-30))


def knn_bruteforce(vectors: DataFrame, queries: DataFrame, top_k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    queries is assumed small (it is broadcast); vectors can be arbitrarily
    large — the scan streams once, no shuffle until the per-query top-k
    (which AQE coalesces; at scale use the SRP variant below).
    Output: (query_id, neighbor_id, cos_sim, rank), self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            _cos_expr(
                F.col("qvec").cast("array<double>"), F.col("nvec").cast("array<double>")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def make_srp_udf(dim: int, n_bits: int = 16, seed: int = 11):
    """Signed-random-projection bucket id (int64) per embedding."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits)).astype(np.float32)
    weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64)).astype(np.uint64)

    @pandas_udf(LongType())
    def srp_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
        signs = (mat @ planes) > 0
        buckets = (signs.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return pd.Series(buckets.astype(np.int64))

    return srp_udf


def make_srp_multi_udf(dim: int, n_bits: int = 12, n_tables: int = 4,
                       seed: int = 11):
    """OR-construction SRP: array<long> of ``n_tables`` independent bucket
    ids per embedding (table index folded into the id's high bits, so a
    plain explode+equi-join never collides buckets across tables).

    Recall math (vs a single table): a pair at angle θ agrees on one
    n_bits table with p = (1-θ/π)**n_bits; miss probability across t
    independent tables is (1-p)**t. At cos=0.9 (θ≈0.451 rad, p≈0.155 for
    n_bits=12), one table misses 84.5% of true pairs — four tables still
    miss ~51%, so high-recall settings use more/smaller tables (e.g.
    t=8, n_bits=6: p≈0.40, miss≈1.7%). The recall gate test pins this.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits * n_tables)).astype(np.float32)
    weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64)).astype(np.uint64)
    table_tag = (np.arange(n_tables, dtype=np.uint64) << np.uint64(n_bits + 1))

    @pandas_udf(ArrayType(LongType()))
    def srp_multi_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
        signs = (mat @ planes) > 0  # (n, n_bits*n_tables)
        signs = signs.reshape(len(mat), n_tables, n_bits)
        buckets = (signs.astype(np.uint64) * weights[None, None, :]).sum(axis=2)
        buckets = (buckets | table_tag[None, :]).astype(np.int64)
        return pd.Series(list(buckets))

    return srp_multi_udf


def embedding_dup_pairs(vectors: DataFrame, min_cos: float = 0.95,
                        n_bits: int = 12, seed: int = 11, n_tables: int = 1,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        dim: int | None = None) -> DataFrame:
    """Approximate embedding-cosine near-dup pairs via SRP bucketing.

    Only pairs sharing an SRP bucket in at least one of ``n_tables``
    hash tables are scored; the exact cosine filter prunes false
    positives, so precision is always 1.0 and ``n_tables``/``n_bits``
    trade recall against candidate volume (see ``make_srp_multi_udf`` for
    the recall closed form). Output: (id_a, id_b, cos_sim), distinct.
    """
    if dim is None:
        first = vectors.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(first["d"])
    if n_tables <= 1:
        udf = make_srp_udf(dim, n_bits=n_bits, seed=seed)
        bucket_col = udf(F.col(vec_col))
    else:
        udf = make_srp_multi_udf(dim, n_bits=n_bits, n_tables=n_tables, seed=seed)
        bucket_col = F.explode(udf(F.col(vec_col)))
    b = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
        bucket_col.alias("bucket"),
    )
    left = b.select(
        F.col("vid").alias("id_a"), F.col("vec").alias("vec_a"), "bucket"
    )
    right = b.select(
        F.col("vid").alias("id_b"), F.col("vec").alias("vec_b"), "bucket"
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            _cos_expr(
                F.col("vec_a").cast("array<double>"), F.col("vec_b").cast("array<double>")
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_cos)
        .distinct()
    )


def semantic_dedup(vectors: DataFrame, min_cos: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_bits: int = 6, n_tables: int = 8, seed: int = 11,
                   exact: bool = False) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic deduplication",
    2023 — public paper): embedding-cosine near-dup pairs -> connected
    components -> keep the minimum-id representative per semantic group.

    The reference engine has no embedding stage (its dedup primitive is
    the MinHash sketch, ``Sketch.cpp:512-583``); this operator is the
    embedding-space member of the same pairs->components->representatives
    pipeline shape as ``pipeline.dedup_pipeline``.

    Scale shape: candidate pairs come from the SRP OR-construction
    (``embedding_dup_pairs`` — only same-bucket pairs are scored, recall
    closed form in ``make_srp_multi_udf``); components run through
    ``cc.connected_components`` (large/small-star above the driver
    threshold). Nothing is all-pairs unless ``exact=True`` (fixture- and
    oracle-sized inputs only).

    Output: one row per vector belonging to a semantic group of size >= 2
    — (vec_id, rep_id, cluster_size, is_rep). Vectors absent from the
    output are singletons (their own representatives); the dedup decision
    is "drop every row with is_rep = false", applied by left-anti join.
    """
    from mashspark.cc import connected_components

    if exact:
        a = vectors.select(F.col(id_col).alias("id_a"),
                           F.col(vec_col).alias("vec_a"))
        b = vectors.select(F.col(id_col).alias("id_b"),
                           F.col(vec_col).alias("vec_b"))
        pairs = (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos_sim", _cos_expr(
                F.col("vec_a").cast("array<double>"),
                F.col("vec_b").cast("array<double>")))
            .filter(F.col("cos_sim") >= min_cos)
            .select("id_a", "id_b")
        )
    else:
        pairs = embedding_dup_pairs(
            vectors, min_cos=min_cos, n_bits=n_bits, n_tables=n_tables,
            seed=seed, id_col=id_col, vec_col=vec_col,
        ).select("id_a", "id_b")

    labels = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    ).select(F.col("doc_id").alias(id_col), F.col("cluster_id").alias("rep_id"))
    sizes = labels.groupBy("rep_id").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "rep_id")
        .select(id_col, "rep_id", "cluster_size",
                (F.col(id_col) == F.col("rep_id")).alias("is_rep"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------
# FAISS-style IVF-flat re-expressed for Spark: a small coarse quantizer
# (k centroids, trained by spherical Lloyd iterations, each iteration one
# map-only assignment pass + a partials-only combine) partitions the
# corpus into inverted lists; a search probes only the ``nprobe`` lists
# whose centroids are nearest the query, so the scored fraction is
# ~nprobe/n_lists of the corpus instead of all of it. The quantizer is
# tiny by design (n_lists x dim floats) and lives in UDF closures — the
# corpus itself never leaves the executors.


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def _stack_f64(vecs: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in vecs])


def make_ivf_assign_udf(centroids: np.ndarray):
    """list_id (int64) of each embedding's nearest centroid by cosine.

    Ties break to the LOWEST list id (``argmax`` returns the first
    maximum), matching the oracle's ``ORDER BY cos DESC, list_id ASC``.
    Cosine is norm-invariant in the centroid, so the quantizer rows are
    pre-normalized once here and the per-batch work is one matmul.
    """
    cent = _normalize_rows(np.asarray(centroids, dtype=np.float64))

    @pandas_udf(LongType())
    def ivf_assign_udf(vecs: pd.Series) -> pd.Series:
        sims = _normalize_rows(_stack_f64(vecs)) @ cent.T
        return pd.Series(sims.argmax(axis=1).astype(np.int64))

    return ivf_assign_udf


def ivf_train(vectors: DataFrame, n_lists: int = 16, n_iters: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding",
              sample_mod: int | None = None) -> np.ndarray:
    """Train the coarse quantizer: spherical k-means over the corpus.

    Deterministic init — the embeddings of the ``n_lists`` smallest ids
    (SQL-expressible, so the ``n_iters=0`` fixed quantizer is fully
    oracle-checkable). Each Lloyd iteration is ONE pass over the data:
    ``mapInPandas`` assigns every row to its nearest centroid and emits
    only per-partition partial sums (n_partitions x n_lists rows of dim
    doubles), which the driver combines — no row-level shuffle, and the
    collected partials are O(partitions x n_lists x dim), independent of
    corpus size. Empty lists keep their previous centroid (as FAISS
    does). ``sample_mod=m`` trains on the deterministic 1/m id-hash
    sample (quantizer quality needs a sample, not the corpus).
    """
    from pyspark.sql.types import (DoubleType, StructField, StructType,
                                   IntegerType)

    base = vectors.select(F.col(vec_col).alias("vec"))
    if sample_mod and sample_mod > 1:
        base = vectors.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0
        ).select(F.col(vec_col).alias("vec"))

    init = (
        vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("vec"))
        .orderBy("i").limit(n_lists).collect()
    )
    if len(init) < n_lists:
        raise ValueError(f"need >= {n_lists} vectors to seed the quantizer")
    cent = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in init])

    partial_schema = StructType([
        StructField("list_id", IntegerType()),
        StructField("count", DoubleType()),
        StructField("sums", ArrayType(DoubleType())),
    ])

    for _ in range(max(0, n_iters)):
        cn = _normalize_rows(cent)
        k, dim = cn.shape

        def partial_sums(batches, _cn=cn, _k=k, _dim=dim):
            sums = np.zeros((_k, _dim))
            counts = np.zeros(_k)
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = _stack_f64(pdf["vec"])
                assign = (_normalize_rows(mat) @ _cn.T).argmax(axis=1)
                np.add.at(sums, assign, _normalize_rows(mat))
                np.add.at(counts, assign, 1.0)
            nz = np.flatnonzero(counts)
            yield pd.DataFrame({
                "list_id": nz.astype(np.int32),
                "count": counts[nz],
                "sums": [sums[i] for i in nz],
            })

        parts = base.mapInPandas(partial_sums, schema=partial_schema).collect()
        sums = np.zeros((k, dim))
        counts = np.zeros(k)
        for r in parts:
            sums[r["list_id"]] += np.asarray(r["sums"])
            counts[r["list_id"]] += r["count"]
        nz = counts > 0
        cent[nz] = _normalize_rows(sums[nz] / counts[nz, None])
    return cent


def make_ivf_probe_udf(centroids: np.ndarray, nprobe: int):
    """array<long> of the ``nprobe`` list ids nearest each query vector
    (cosine, ties to the lower list id) — the probe set of an IVF search."""
    cent = _normalize_rows(np.asarray(centroids, dtype=np.float64))
    nprobe = min(nprobe, cent.shape[0])

    @pandas_udf(ArrayType(LongType()))
    def ivf_probe_udf(vecs: pd.Series) -> pd.Series:
        sims = _normalize_rows(_stack_f64(vecs)) @ cent.T
        # stable argsort on -sims: descending cosine, ascending list id
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int64)))

    return ivf_probe_udf


def ivf_search(vectors: DataFrame, queries: DataFrame, centroids: np.ndarray,
               top_k: int = 5, nprobe: int = 4, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k cosine neighbors through the IVF index.

    The corpus is assigned to inverted lists with one map-only pass
    (quantizer in the UDF closure); each query probes its ``nprobe``
    nearest lists, and only corpus rows in probed lists are scored —
    an equi-join on ``list_id`` does the pruning, so the exact-scoring
    volume is ~nprobe/n_lists of a brute-force scan. Queries are assumed
    small and are broadcast. Output: (query_id, neighbor_id, rank) with
    self-matches excluded; rank ties break on ascending neighbor id.
    """
    assign = make_ivf_assign_udf(centroids)
    probe = make_ivf_probe_udf(centroids, nprobe)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"),
        assign(F.col(vec_col)).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        F.explode(probe(F.col(vec_col))).alias("list_id"),
    )
    scored = (
        v.join(F.broadcast(q), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            _cos_expr(
                F.col("qvec").cast("array<double>"),
                F.col("nvec").cast("array<double>"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank")
    )
