"""Connected-components: distributed large/small-star vs driver union-find
vs the pure-python oracle must all agree, including on pathological chain
graphs (worst case for naive label propagation)."""

import numpy as np
import pytest

from mashspark.cc import connected_components
from tests.oracle import truth_clusters


def _labels(df):
    return {r.doc_id: r.cluster_id for r in df.collect()}


@pytest.mark.parametrize(
    "edges",
    [
        # two triangles + bridge + isolated pair
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10), (20, 21)],
        # long chain (log-round stress)
        [(i, i + 1) for i in range(0, 60)],
        # star with reversed ids
        [(100, i) for i in range(50, 60)],
        # duplicate + self edges
        [(5, 6), (6, 5), (5, 5), (6, 7)],
    ],
)
def test_cc_paths_agree(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    star = _labels(connected_components(df, driver_threshold=0))
    uf = _labels(connected_components(df, driver_threshold=10**9))
    assert star == uf
    nodes = sorted({x for e in edges for x in e})
    remap = {n: i for i, n in enumerate(nodes)}
    oracle = truth_clusters(len(nodes), [(remap[a], remap[b]) for a, b in edges])
    inv = {i: n for n, i in remap.items()}
    expected = {inv[i]: inv[lab] for i, lab in oracle.items()}
    # self-loop-only nodes are kept by CC as singletons
    assert {k: v for k, v in star.items()} == expected
