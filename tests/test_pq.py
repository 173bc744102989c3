"""Product-quantization ANN (mashspark/pq.py): codebook training,
encode exactness, ADC parity with a single-process reference, recall
vs brute force on clustered data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mashspark.pq import (
    _assign_subspace,
    _bounds,
    make_pq_encode_udf,
    pq_adc_reference,
    pq_encode,
    pq_search,
    pq_train,
)

DIM, M, K = 16, 4, 4


def _clustered(n_clusters=6, per_cluster=30, dim=DIM, seed=3):
    """Well-separated Gaussian blobs: ANN methods must do well here."""
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_clusters, dim)) * 4.0
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = cents[c] + rng.standard_normal(dim) * 0.3
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return rows


def _py_train(rows, m=M, k=K, n_iters=3):
    """Independent single-process PQ trainer (same init/update rules)."""
    mat = np.stack([np.asarray(v, dtype=np.float64) for _, v, _ in
                    sorted(rows)])
    bounds = _bounds(mat.shape[1], m)
    books = np.stack([mat[:k, a:b] for a, b in bounds])
    for _ in range(n_iters):
        for j, (a, b) in enumerate(bounds):
            sub = mat[:, a:b]
            assign = _assign_subspace(sub, books[j])
            for c in range(k):
                sel = sub[assign == c]
                if len(sel):
                    books[j, c] = sel.mean(axis=0)
    return books


def test_pq_train_matches_single_process(spark):
    rows = _clustered()
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = pq_train(df, m=M, k=K, n_iters=3)
    want = _py_train(rows, n_iters=3)
    # float32 inputs + per-partition partial sums: tight but not
    # bit-exact tolerance
    assert got.shape == (M, K, DIM // M)
    assert np.allclose(got, want, rtol=1e-6, atol=1e-9)


def test_pq_encode_exact_and_partition_invariant(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    books = pq_train(df, m=M, k=K, n_iters=2)
    mat = np.stack([np.asarray(v, dtype=np.float32).astype(np.float64)
                    for _, v, _ in sorted(rows)])
    bounds = _bounds(DIM, M)
    want = {
        i: tuple(int(_assign_subspace(mat[i:i + 1, a:b], books[j])[0])
                 for j, (a, b) in enumerate(bounds))
        for i, _ in enumerate(sorted(rows))
    }
    for n_parts in (1, 5):
        got = {r["vec_id"]: tuple(r["codes"]) for r in
               pq_encode(df.repartition(n_parts), books).collect()}
        assert got == want
    assert all(0 <= c < K for codes in want.values() for c in codes)


def test_adc_reference_is_true_lut_distance():
    rows = _clustered(n_clusters=2, per_cluster=10)
    mat = np.stack([np.asarray(v, dtype=np.float64) for _, v, _ in rows])
    books = _py_train(rows, n_iters=2)
    bounds = _bounds(DIM, M)
    codes = np.stack([
        np.array([_assign_subspace(mat[i:i + 1, a:b], books[j])[0]
                  for j, (a, b) in enumerate(bounds)])
        for i in range(len(mat))
    ])
    q = mat[0]
    dists = pq_adc_reference(q, codes, books)
    # brute recompute: distance from q's subvectors to each row's
    # ASSIGNED centroids
    for i in range(len(mat)):
        d = sum(
            ((q[a:b] - books[j][codes[i, j]]) ** 2).sum()
            for j, (a, b) in enumerate(bounds)
        )
        assert dists[i] == pytest.approx(d, rel=1e-12)


def test_pq_search_matches_adc_reference(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    books = pq_train(df, m=M, k=K, n_iters=2)
    queries = df.filter(F.col("vec_id") < 3)
    got = pq_search(df.repartition(4), queries, books, top_k=5)
    res = {}
    for r in got.collect():
        res.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["adc_dist"]))
    # single-process expectation
    mat32 = {i: np.asarray(v, dtype=np.float32).astype(np.float64)
             for i, v, _ in rows}
    bounds = _bounds(DIM, M)
    codes = np.stack([
        np.array([_assign_subspace(mat32[i][None, a:b], books[j])[0]
                  for j, (a, b) in enumerate(bounds)])
        for i in sorted(mat32)
    ])
    for qid in (0, 1, 2):
        dists = pq_adc_reference(mat32[qid], codes, books)
        order = sorted((float(d), i) for i, d in enumerate(dists)
                       if i != qid)[:5]
        want = [(rk + 1, nid, d) for rk, (d, nid) in enumerate(order)]
        have = sorted(res[qid])
        assert [(rk, nid) for rk, nid, _ in have] == \
            [(rk, nid) for rk, nid, _ in want], qid
        for (_, _, dg), (_, _, dw) in zip(have, want):
            assert dg == pytest.approx(dw, rel=1e-12)


def test_ivfpq_index_and_search(spark):
    """IVFPQ end-to-end: residual encode consistency and top-k parity
    with a single-process reference over the probed lists."""
    from mashspark.pq import ivfpq_index, ivfpq_search, ivfpq_train
    from mashspark.pq import _ivf_assign_np, _norm_rows

    rows = _clustered(n_clusters=8, per_cluster=12)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cent, books = ivfpq_train(df, n_lists=8, m=M, k=4, n_iters=2,
                              coarse_iters=2)
    idx = ivfpq_index(df, cent, books)
    got = {r["id"]: (r["list_id"], tuple(r["codes"])) for r in idx.collect()}

    mat = np.stack([np.asarray(v, dtype=np.float32).astype(np.float64)
                    for _, v, _ in sorted(rows)])
    cn = _norm_rows(cent)
    assign = _ivf_assign_np(mat, cn)
    resid = mat - cent[assign]
    bounds = _bounds(DIM, M)
    for i, _ in enumerate(sorted(rows)):
        lid, codes = got[i]
        assert lid == assign[i], i
        want = tuple(int(_assign_subspace(resid[i:i + 1, a:b], books[j])[0])
                     for j, (a, b) in enumerate(bounds))
        assert codes == want, i

    # search parity: single-process ADC over the probed lists
    res = ivfpq_search(idx.repartition(3), df.filter(F.col("vec_id") < 2),
                       cent, books, top_k=4, nprobe=2)
    by_q = {}
    for r in res.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["adc_dist"]))
    codes_all = np.stack([np.array(got[i][1]) for i in sorted(got)])
    for qid in (0, 1):
        q = mat[qid]
        sims = _norm_rows(q[None, :]) @ cn.T
        probes = np.argsort(-sims[0], kind="stable")[:2]
        cands = []
        for i in sorted(got):
            lid, _ = got[i]
            if lid in probes and i != qid:
                r = q - cent[lid]
                d = sum(((r[a:b] - books[j][codes_all[i, j]]) ** 2).sum()
                        for j, (a, b) in enumerate(bounds))
                cands.append((float(d), i))
        want = sorted(cands)[:4]
        have = sorted(by_q[qid])
        assert [n for _, n, _ in have] == [n for _, n in want], qid
        for (_, _, dg), (dw, _) in zip(have, want):
            assert dg == pytest.approx(dw, rel=1e-12)


def test_ivfpq_recall_on_clustered_data(spark):
    from mashspark.ann import knn_bruteforce
    from mashspark.pq import ivfpq_index, ivfpq_search, ivfpq_train

    rows = _clustered(n_clusters=20, per_cluster=6)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cent, books = ivfpq_train(df, n_lists=10, m=M, k=8, n_iters=3,
                              coarse_iters=3)
    idx = ivfpq_index(df, cent, books)
    queries = df.filter(F.col("vec_id") % 37 == 0)
    approx = ivfpq_search(idx, queries, cent, books, top_k=5, nprobe=3)
    exact = knn_bruteforce(df, queries, top_k=5)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.8, len(a & e) / len(e)


def test_pq_search_recall_on_clustered_data(spark):
    """recall@5 vs exact brute force. PQ resolves at codebook-cell
    granularity — inside one tight blob every vector shares the same
    codes and ADC cannot rank them (that is the design trade, not a
    bug) — so the blobs are sized to top_k+1: the exact top-5 IS the
    same-cluster set, which cell-level resolution must recover."""
    from mashspark.ann import knn_bruteforce

    rows = _clustered(n_clusters=20, per_cluster=6)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    books = pq_train(df, m=M, k=8, n_iters=4)
    queries = df.filter(F.col("vec_id") % 37 == 0)
    approx = pq_search(df, queries, books, top_k=5)
    exact = knn_bruteforce(df, queries, top_k=5)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.9, recall
    # and every retrieved neighbor is cluster-correct
    label = {i: c for i, _, c in rows}
    assert all(label[q] == label[n] for q, n in a)
