"""b-bit minwise hashing (mashspark/bbit.py): pack layout, JVM SWAR
match counting vs a python reference, estimator calibration."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mashspark.bbit import (
    _check_layout,
    _pack_signature,
    _pattern,
    _salts,
    bbit_dup_pairs,
    bbit_match_pairs,
    bbit_signatures,
)
from mashspark.hashing import _fmix64, hash_shingles_concat


def _py_signature(text, n_perm, b, k, seed):
    buf = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    hashes = hash_shingles_concat(buf, k, seed)
    if len(hashes) == 0:
        return None, np.empty(0, dtype=np.int64)
    salts = _salts(n_perm, seed)
    perm = _fmix64(hashes[:, None] ^ salts[None, :])
    mins = perm.min(axis=0)
    return mins, _pack_signature(mins, b)


def _py_matches(mins_a, mins_b, b):
    mask = np.uint64((1 << b) - 1)
    return int(((mins_a & mask) == (mins_b & mask)).sum())


def test_pack_layout_roundtrip():
    rng = np.random.default_rng(0)
    for b in (1, 2, 4, 8):
        n_perm = 128
        mins = rng.integers(0, 2**64, size=n_perm, dtype=np.uint64)
        words = _pack_signature(mins, b).view(np.uint64)
        per_word = 64 // b
        mask = np.uint64((1 << b) - 1)
        for p in range(n_perm):
            w, j = p // per_word, p % per_word
            field = (words[w] >> np.uint64(j * b)) & mask
            assert field == (mins[p] & mask), (b, p)


def test_layout_and_pattern_guards():
    with pytest.raises(ValueError):
        _check_layout(100, 4)   # 400 bits: not word-aligned
    with pytest.raises(ValueError):
        _check_layout(128, 3)   # b must divide 64
    assert _pattern(4) == 0x1111111111111111
    assert _pattern(1) == -1    # all-ones as signed int64


def test_match_counts_jvm_equals_python(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog " * 4),
        (2, "the quick brown fox jumps over the lazy dog " * 4 + "tail bit"),
        (3, "completely different content with other words entirely " * 4),
        (4, "xy"),  # shorter than k -> empty signature
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n_perm, b, k, seed = 128, 4, 21, 42
    sigs = bbit_signatures(df, n_perm, b, k, seed)
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["n_matches"]
           for r in bbit_match_pairs(sigs, cand, n_perm, b).collect()}
    mins = {i: _py_signature(t, n_perm, b, k, seed)[0] for i, t in docs}
    assert (1, 4) not in got  # unsignable doc drops out
    for (a, c), m in got.items():
        assert m == _py_matches(mins[a], mins[c], b), (a, c)


def test_match_count_is_jvm_only(spark):
    df = spark.createDataFrame(
        [(1, "a" * 50), (2, "b" * 50)], "doc_id long, text string")
    sigs = bbit_signatures(df).localCheckpoint()  # cut the Python scan off the plan
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    plan = bbit_match_pairs(sigs, cand)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan


def test_estimator_calibration_identical_and_disjoint(spark):
    base = "web page body with many shared tokens " * 6
    docs = [(1, base), (2, base),
            (3, "entirely unrelated page full of other material " * 6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = bbit_signatures(df, 256, 4)
    cand = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    est = {(r["id_a"], r["id_b"]): r["jaccard_est"]
           for r in bbit_match_pairs(sigs, cand, 256, 4).collect()}
    assert est[(1, 2)] == 1.0          # identical docs: every field matches
    assert est[(1, 3)] <= 0.10         # disjoint: chance-corrected near 0


def test_estimator_tracks_true_jaccard(spark):
    """Half-overlapping shingle sets: the b-bit estimate must land
    within the P=256 sampling noise of the true shingle Jaccard."""
    a = "alpha beta gamma delta epsilon zeta eta theta " * 3
    bshared = a + "iota kappa lambda mu nu xi omicron pi rho sigma " * 3
    docs = [(1, a), (2, bshared)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k, seed = 21, 42
    # true Jaccard over the murmur shingle sets
    hs = {}
    for i, t in docs:
        buf = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        hs[i] = set(hash_shingles_concat(buf, k, seed).tolist())
    true_j = len(hs[1] & hs[2]) / len(hs[1] | hs[2])
    sigs = bbit_signatures(df, 256, 4, k, seed)
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    est = bbit_match_pairs(sigs, cand, 256, 4).collect()[0]["jaccard_est"]
    assert est == pytest.approx(true_j, abs=0.12)


def test_bbit_dup_pairs_fixture_form(spark):
    base = "shared boilerplate sentence repeated across the family " * 4
    docs = [(1, base), (2, base + " small edit"),
            (3, "noise page " * 20), (4, base)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in
           bbit_dup_pairs(df, min_jaccard=0.5).collect()}
    assert (1, 4) in got and (1, 2) in got and (2, 4) in got
    assert all(3 not in p for p in got)
