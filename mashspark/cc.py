"""Iterative large-star / small-star connected components over an edge
DataFrame (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014 — the algorithm the north rule names).

The reference has no clustering stage (``mash triangle -E`` just emits the
edge list, ``CommandTriangle.cpp:200-214``); this is our custom physical
strategy #3 (SURVEY.md §4) turning verified duplicate edges into cluster
IDs. Converges in O(log n) rounds on pathological chains; each round is
two groupBy shuffles; per-round ``localCheckpoint`` truncates the lineage
so plans stay bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the
    minimum of its neighborhood (including u itself)."""
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("mn"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high->low; connect every low neighbor (and u) to the
    minimum of the low neighborhood."""
    dir_ = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).filter(F.col("u") != F.col("v"))
    m = dir_.groupBy("u").agg(F.min("v").alias("mn"))
    out = (
        dir_.join(m, "u")
        .select(F.col("v").alias("src"), F.col("mn").alias("dst"))
        .unionAll(m.select(F.col("u").alias("src"), F.col("mn").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return out


def _driver_union_find(spark, rows) -> DataFrame:
    """Small-graph fast path: union-find over an already-collected pandas
    edge frame on the driver. Chosen only below ``driver_threshold``
    edges; the distributed star algorithm is the scale path. Verified dup
    edges are orders of magnitude fewer than docs, so this path also
    matters in production for mid-size runs."""
    import numpy as np

    src = rows["src"].to_numpy(dtype=np.int64)
    dst = rows["dst"].to_numpy(dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    m = len(src)
    a_idx, b_idx = inv[:m], inv[m:]
    for i in range(m):
        ra, rb = find(a_idx[i]), find(b_idx[i])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(len(nodes))], dtype=np.int64)
    # min node id per component as the label
    import pandas as pd

    lab = pd.DataFrame({"root": roots, "node": nodes})
    mins = lab.groupby("root")["node"].transform("min")
    out = pd.DataFrame({"doc_id": nodes, "cluster_id": mins.to_numpy()})
    # explicit schema: an empty pandas frame cannot infer one (a dup-free
    # corpus reaches here with zero edges and must yield zero labels, not
    # a CANNOT_INFER_EMPTY_SCHEMA crash)
    return spark.createDataFrame(out, "doc_id long, cluster_id long")


def connected_components(edges: DataFrame, max_iterations: int = 25,
                         driver_threshold: int = 2_000_000) -> DataFrame:
    """edges(src, dst) -> labels(doc_id, cluster_id).

    cluster_id = the minimum node id of the component. Nodes that appear
    in no edge are absent (callers union singletons back, see
    ``pipeline.assign_clusters``). Convergence check: the small-star
    output is a fixpoint (star edge set stops changing — compared via
    count + checksum, cheap aggregations instead of a full except).

    Hybrid physical strategy: below ``driver_threshold`` edges the label
    assignment collapses to a driver union-find (one job + one collect);
    above it, iterative large-star/small-star runs fully distributed.
    Both produce identical labels (tests assert this).
    """
    cur = edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst")).distinct()
    cur = cur.localCheckpoint(eager=True)

    if driver_threshold > 0:
        # one job answers BOTH "how many edges" and "give me the edges":
        # a limit(threshold+1) collect that comes back with <= threshold
        # rows IS the complete edge set (the limit did not truncate), so
        # the old separate count() job — a second full scan of the edge
        # checkpoint before the collect — is gone (round-6; the driver
        # path is taken by every bench pipeline, 2 jobs -> 1).
        head = cur.limit(driver_threshold + 1).toPandas()
        if len(head) <= driver_threshold:
            return _driver_union_find(cur.sparkSession, head)

    prev_sig = None
    for _ in range(max_iterations):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        sig_row = cur.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected components did not converge in {max_iterations} rounds")

    # fixpoint edges form stars: src (member) -> dst (root = min id)
    labels = cur.select(F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id"))
    roots = cur.select(F.col("dst").alias("doc_id"), F.col("dst").alias("cluster_id")).distinct()
    return labels.unionByName(roots).distinct()
