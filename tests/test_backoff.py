"""Stupid Backoff scoring (mashspark/backoff.py) vs a pure-Python
reference: per-order hit counts exactly, log scores to float precision."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from mashspark.backoff import ngram_models, stupid_backoff_scores

_TRAIN = [
    "the cat sat on the mat",
    "the cat sat on the hat",
    "the dog sat on the mat",
    "a dog ran after the cat",
    "the cat ran after a mouse",
]
_SCORE = [
    "the cat sat on the mat",        # mostly 3-gram hits
    "the dog ran after the mouse",   # mixed orders
    "purple quantum flamingo",       # all OOV
    "cat the on sat",                # seen words, unseen orders
]


def _toks(t):
    return [w for w in t.lower().split(" ") if w]


def _ref(train, texts, n, alpha=0.4):
    counts = []
    for k in range(1, n + 1):
        c = Counter()
        for t in train:
            ws = _toks(t)
            for i in range(len(ws) - k + 1):
                c[" ".join(ws[i:i + k])] += 1
        counts.append(c)
    n1 = sum(counts[0].values())
    v1 = len(counts[0])
    denom = max(n1 + v1, 1)
    out = {}
    for d, t in enumerate(texts):
        ws = _toks(t)
        hits = {k: 0 for k in range(0, n + 1)}
        logsum = 0.0
        for i in range(len(ws)):
            res = 0
            for k in range(n, 0, -1):
                if i >= k - 1:
                    g = " ".join(ws[i - k + 1:i + 1])
                    if g in counts[k - 1]:
                        res = k
                        if k == 1:
                            s = math.log((counts[0][g] + 1) / denom) \
                                + (n - 1) * math.log(alpha)
                        else:
                            p = " ".join(ws[i - k + 1:i])
                            s = math.log(counts[k - 1][g]
                                         / counts[k - 2][p]) \
                                + (n - k) * math.log(alpha)
                        break
            else:
                s = math.log(1.0 / denom) + (n - 1) * math.log(alpha)
            if res == 0:
                s = math.log(1.0 / denom) + (n - 1) * math.log(alpha)
            hits[res] += 1
            logsum += s
        if ws:
            out[d] = (len(ws), hits, logsum / len(ws))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TRAIN)], "doc_id long, text string")
    score = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_SCORE)], "doc_id long, text string")
    return train.persist(), score.persist()


@pytest.mark.parametrize("n", [1, 2, 3])
def test_matches_reference(spark, frames, n):
    train, score = frames
    models = ngram_models(train, n)
    got = {r.doc_id: r for r in
           stupid_backoff_scores(score, models).collect()}
    want = _ref(_TRAIN, _SCORE, n)
    assert set(got) == set(want)
    for d, (npos, hits, lps) in want.items():
        r = got[d]
        assert r.n_positions == npos
        for k in range(1, n + 1):
            assert r[f"n_hits_{k}"] == hits[k], (d, k)
        assert r.n_oov == hits[0]
        assert r.logscore_per_token == pytest.approx(lps, rel=1e-9)


def test_order_resolution_sanity(spark, frames):
    train, score = frames
    got = {r.doc_id: r for r in
           stupid_backoff_scores(score, ngram_models(train, 3)).collect()}
    # doc 0 is a verbatim training sentence: everything resolves at the
    # highest order available per position (first two positions can
    # only be 1- and 2-grams)
    assert got[0].n_hits_3 == got[0].n_positions - 2
    assert got[0].n_oov == 0
    # doc 2 is fully OOV
    assert got[2].n_oov == got[2].n_positions
    # in-vocab words in unseen order: unigram hits only
    assert got[3].n_hits_1 == got[3].n_positions
    # scores order: verbatim > shuffled > OOV
    assert (got[0].logscore_per_token > got[3].logscore_per_token
            > got[2].logscore_per_token)


def test_empty_docs_produce_no_row(spark, frames):
    train, _ = frames
    empt = spark.createDataFrame([(9, ""), (10, "   ")],
                                 "doc_id long, text string")
    assert stupid_backoff_scores(empt, ngram_models(train, 2)).count() == 0


def test_validates_order(spark, frames):
    train, _ = frames
    with pytest.raises(ValueError):
        ngram_models(train, 0)
    with pytest.raises(ValueError):
        stupid_backoff_scores(train, [])


def test_plan_broadcast_joins_and_partial_rollup(spark, frames):
    """Plan guard: all five count-table joins broadcast (vocabulary
    tables must never sort-merge against the position relation) and the
    per-doc rollup does map-side partial aggregation."""
    import contextlib
    import io

    train, score = frames
    out = stupid_backoff_scores(score, ngram_models(train, 3))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert "SortMergeJoin" not in plan, plan
    assert "partial_count" in plan or "Partial" in plan, plan
