"""Sequence packing (packing.py): exact agreement with a driver-side
cumulative-sum oracle, partitioning invariance (the two-level prefix
sum must not depend on physical layout), and chunk-span arithmetic."""

import numpy as np
from pyspark.sql import functions as F

from mashspark.packing import pack_layout

BUDGET = 10


def _docs(spark, n=40, seed=7):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        k = int(rng.randint(1, 25))
        rows.append((i, " ".join(f"w{j}" for j in range(k))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _numpy_oracle(rows, budget):
    rows = sorted(rows)
    out = {}
    off = 0
    for doc_id, k in rows:
        chunk = off // budget
        span = 0 if k == 0 else (off + k - 1) // budget - chunk + 1
        out[doc_id] = (k, off, chunk, off % budget, span)
        off += k
    return out


def test_pack_layout_matches_cumsum_oracle(spark):
    docs = _docs(spark)
    counts = [(r["doc_id"], len(r["text"].split(" ")))
              for r in docs.collect()]
    want = _numpy_oracle(counts, BUDGET)
    got = pack_layout(docs, BUDGET).collect()
    assert len(got) == len(want)
    for r in got:
        assert want[r["doc_id"]] == (
            r["n_tokens"], r["global_offset"], r["chunk_id"],
            r["chunk_offset"], r["n_chunks_spanned"]), r


def test_pack_layout_partitioning_invariance(spark):
    docs = _docs(spark, n=60)
    a = sorted(map(tuple, pack_layout(docs, BUDGET).collect()))
    b = sorted(map(tuple, pack_layout(docs.repartition(7), BUDGET).collect()))
    c = sorted(map(tuple, pack_layout(
        docs.orderBy(F.desc("doc_id")).coalesce(1), BUDGET).collect()))
    assert a == b == c


def test_pack_layout_stream_is_gapless(spark):
    """Offsets tile the concatenated stream exactly: each doc starts
    where the previous ended, and every budget-sized chunk except the
    last is fully covered."""
    docs = _docs(spark, n=30, seed=3)
    rows = sorted(pack_layout(docs, BUDGET).collect(),
                  key=lambda r: r["global_offset"])
    off = 0
    for r in rows:
        assert r["global_offset"] == off
        off += r["n_tokens"]
    total = off
    last = rows[-1]
    assert last["chunk_id"] == (total - last["n_tokens"]) // BUDGET
    # spans: a doc crossing a boundary reports >1 chunk
    for r in rows:
        if r["n_tokens"] and r["chunk_offset"] + r["n_tokens"] > BUDGET:
            assert r["n_chunks_spanned"] > 1


def test_chunk_members_tile_exactly(spark):
    """Per-chunk slices tile every chunk to exactly `budget` tokens
    (except the final partial chunk), and each doc's slices cover the
    doc gaplessly in order."""
    from mashspark.packing import chunk_members

    docs = _docs(spark, n=35, seed=11)
    layout = pack_layout(docs, BUDGET)
    members = chunk_members(layout, BUDGET).collect()
    total = sum(r["n_tokens"] for r in layout.collect())
    n_chunks = (total + BUDGET - 1) // BUDGET

    per_chunk = {}
    per_doc = {}
    for r in members:
        assert r["slice_len"] > 0
        per_chunk[r["chunk_id"]] = per_chunk.get(r["chunk_id"], 0) + r["slice_len"]
        per_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["slice_start"], r["slice_len"]))
    assert set(per_chunk) == set(range(n_chunks))
    for c, tok in per_chunk.items():
        assert tok == (BUDGET if c < n_chunks - 1 else total - BUDGET * c)
    for doc_id, slices in per_doc.items():
        slices.sort()
        pos = 0
        for _, s, ln in slices:
            assert s == pos
            pos += ln
