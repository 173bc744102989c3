"""Brute-force Mash-semantics oracle for pipeline tests (FIXTURES.md §2):
all-pairs capped-merge Jaccard over numpy sketches + union-find clustering.
Independent of the Spark code path (uses only the numpy core that is itself
golden-tested against the reference)."""

from __future__ import annotations

import numpy as np

from mashspark import compare, minhash
from mashspark.params import SketchParams


def sketch_all(texts, params: SketchParams):
    return [
        minhash.sketch_text_bytes(t.encode("utf-8"), params.k, params.s, params.seed)
        for t in texts
    ]


def truth_pairs(sketches, params: SketchParams, threshold: float):
    """Set of (i, j) i<j with capped-merge jaccard >= threshold."""
    n = len(sketches)
    out = set()
    for i in range(n):
        si = sketches[i]
        if len(si) == 0:
            continue
        for j in range(i + 1, n):
            sj = sketches[j]
            if len(sj) == 0:
                continue
            c, d = compare.capped_merge(si, sj, params.s)
            if d > 0 and c / d >= threshold:
                out.add((i, j))
    return out


class UnionFind:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            self.p[rb] = ra


def truth_clusters(n, pairs):
    """doc -> min-id cluster label."""
    uf = UnionFind(n)
    for a, b in pairs:
        uf.union(a, b)
    # min-id label: find gives arbitrary root; recompute mins
    import collections

    members = collections.defaultdict(list)
    for i in range(n):
        members[uf.find(i)].append(i)
    label = {}
    for root, ms in members.items():
        m = min(ms)
        for i in ms:
            label[i] = m
    return label
