"""DSIR importance resampling (mashspark/dsir.py): log-ratio scores
against a numpy brute force, Gumbel-top-k selection properties."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from mashspark.dsir import dsir_select, gumbel_key, ratio_scores
from mashspark.lm import unigram_counts

_TARGET_WORDS = ["theorem", "lemma", "proof", "axiom", "integral",
                 "manifold", "tensor", "operator"]
_SOURCE_WORDS = ["click", "subscribe", "deal", "offer", "free",
                 "winner", "prize", "buy"]


def _mk_text(words, seed, n=30):
    rng = np.random.default_rng(seed)
    return " ".join(rng.choice(words, size=n))


@pytest.fixture(scope="module")
def corpora(spark):
    rows = []
    # training halves
    for i in range(20):
        rows.append((i, "target_train", _mk_text(_TARGET_WORDS, 1000 + i)))
        rows.append((100 + i, "source_train", _mk_text(_SOURCE_WORDS, 2000 + i)))
    # candidates: 20 target-like, 20 source-like
    for i in range(20):
        rows.append((200 + i, "cand_t", _mk_text(_TARGET_WORDS, 3000 + i)))
        rows.append((300 + i, "cand_s", _mk_text(_SOURCE_WORDS, 4000 + i)))
    df = spark.createDataFrame(rows, "doc_id long, role string, text string")
    return df.persist()


def _split(corpora):
    tgt = corpora.filter(F.col("role") == "target_train")
    src = corpora.filter(F.col("role") == "source_train")
    cand = corpora.filter(F.col("role").startswith("cand"))
    return tgt, src, cand


def _brute_scores(tgt_rows, src_rows, cand_rows):
    def toks(t):
        return [w for w in t.lower().split(" ") if w]

    ct = Counter(w for _, t in tgt_rows for w in toks(t))
    cs = Counter(w for _, t in src_rows for w in toks(t))
    dt = max(sum(ct.values()) + len(ct), 1)
    ds = max(sum(cs.values()) + len(cs), 1)
    out = {}
    for i, t in cand_rows:
        ws = toks(t)
        lr = sum(math.log((ct.get(w, 0) + 1) / dt)
                 - math.log((cs.get(w, 0) + 1) / ds) for w in ws)
        out[i] = (len(ws), sum(ct.get(w, 0) for w in ws),
                  sum(cs.get(w, 0) for w in ws), lr)
    return out


def test_ratio_scores_match_bruteforce(spark, corpora):
    tgt, src, cand = _split(corpora)
    scored = ratio_scores(
        cand, unigram_counts(tgt), unigram_counts(src)).collect()
    pairs = {
        r: [(x.doc_id, x.text) for x in corpora.filter(
            F.col("role").rlike(r)).select("doc_id", "text").collect()]
        for r in ["target_train", "source_train", "^cand"]
    }
    want = _brute_scores(pairs["target_train"], pairs["source_train"],
                         pairs["^cand"])
    assert len(scored) == len(want)
    for row in scored:
        n_tok, sum_t, sum_s, lr = want[row.doc_id]
        assert row.n_tokens == n_tok
        assert row.sum_count_target == sum_t
        assert row.sum_count_source == sum_s
        assert row.logratio == pytest.approx(lr, rel=1e-9)
        assert row.logratio_per_token == pytest.approx(lr / n_tok, rel=1e-9)


def test_selection_enriches_target_register(spark, corpora):
    tgt, src, cand = _split(corpora)
    scored = ratio_scores(cand, unigram_counts(tgt), unigram_counts(src))
    picked = dsir_select(scored, 20, mode="exact").collect()
    assert len(picked) == 20
    n_target_like = sum(1 for r in picked if r.doc_id < 300)
    # |logratio| ~ tens of nats vs Gumbel noise ~ O(1): essentially all
    # picks must be target-register docs
    assert n_target_like >= 18


def test_selection_is_deterministic(spark, corpora):
    tgt, src, cand = _split(corpora)
    scored = ratio_scores(cand, unigram_counts(tgt), unigram_counts(src))
    a = {r.doc_id for r in dsir_select(scored, 15, mode="exact").collect()}
    b = {r.doc_id for r in dsir_select(scored, 15, mode="exact").collect()}
    assert a == b
    c = {r.doc_id for r in dsir_select(
        scored, 15, mode="exact", salt="dsir:7").collect()}
    assert c != a  # a different salt is a different draw


def test_threshold_mode_approximates_k(spark, corpora):
    tgt, src, cand = _split(corpora)
    scored = ratio_scores(
        cand, unigram_counts(tgt), unigram_counts(src)).persist()
    got = dsir_select(scored, 20, mode="threshold", exact=True).count()
    assert abs(got - 20) <= 2
    # n_select >= corpus: everything kept
    assert dsir_select(scored, 10_000).count() == scored.count()


def test_empty_source_model_is_finite(spark, corpora):
    tgt, _, cand = _split(corpora)
    empty = unigram_counts(cand.filter(F.lit(False)))
    rows = ratio_scores(cand, unigram_counts(tgt), empty).collect()
    assert rows and all(np.isfinite(r.logratio) for r in rows)


def test_gumbel_key_finite_at_uniform_extremes(spark):
    df = spark.createDataFrame(
        [(0,), (1,), (2**31,)], "doc_id long").select(
        gumbel_key(F.lit(0.0), F.col("doc_id")).alias("g"))
    vals = [r.g for r in df.collect()]
    assert all(np.isfinite(v) for v in vals)


def test_dsir_select_validates_args(spark, corpora):
    tgt, src, cand = _split(corpora)
    scored = ratio_scores(cand, unigram_counts(tgt), unigram_counts(src))
    with pytest.raises(ValueError):
        dsir_select(scored, 0)
    with pytest.raises(ValueError):
        dsir_select(scored, 5, mode="bogus")


def test_threshold_selection_plan_is_sort_free(spark, corpora):
    """Plan guard: threshold-mode selection must be a literal filter
    over the scoring aggregate — no Window, no global Sort, no extra
    Exchange beyond the score rollup's own."""
    import contextlib
    import io

    tgt, src, cand = _split(corpora)
    scored = ratio_scores(cand, unigram_counts(tgt), unigram_counts(src))
    out = dsir_select(scored, 10, exact=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan, plan
    assert "TakeOrdered" not in plan and "Sort " not in plan, plan
    # model joins broadcast; the scoring rollup is the only hash exchange
    assert "SortMergeJoin" not in plan, plan


def test_hashed_ratio_scores_match_bruteforce(spark, corpora):
    """Hashed-feature DSIR (the paper's fixed-dim model) vs a python
    brute force over the same md5 buckets."""
    import hashlib

    from mashspark.dsir import hashed_ngram_counts, hashed_ratio_scores

    dim, n_max = 512, 2

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim

    def feats(text):
        ws = [w for w in text.lower().split(" ") if w]
        out = [bucket(w) for w in ws]
        out += [bucket(f"{a} {b}") for a, b in zip(ws, ws[1:])]
        return out

    tgt, src, cand = _split(corpora)
    got = {r.doc_id: r for r in hashed_ratio_scores(
        cand, hashed_ngram_counts(tgt, dim, n_max),
        hashed_ngram_counts(src, dim, n_max), dim=dim, n_max=n_max
    ).collect()}

    rows = {role: [(x.doc_id, x.text) for x in corpora.filter(
        F.col("role").rlike(role)).select("doc_id", "text").collect()]
        for role in ["target_train", "source_train", "^cand"]}
    ct, cs = Counter(), Counter()
    for _, t in rows["target_train"]:
        ct.update(feats(t))
    for _, t in rows["source_train"]:
        cs.update(feats(t))
    dt = max(sum(ct.values()) + dim, 1)
    ds = max(sum(cs.values()) + dim, 1)
    assert len(got) == len(rows["^cand"])
    for i, t in rows["^cand"]:
        fs = feats(t)
        r = got[i]
        assert r.n_tokens == len(fs)
        assert r.sum_count_target == sum(ct.get(b, 0) for b in fs)
        assert r.sum_count_source == sum(cs.get(b, 0) for b in fs)
        lr = sum(math.log((ct.get(b, 0) + 1) / dt)
                 - math.log((cs.get(b, 0) + 1) / ds) for b in fs)
        assert r.logratio == pytest.approx(lr, rel=1e-9)


def test_hashed_model_is_dim_bounded(spark, corpora):
    from mashspark.dsir import hashed_ngram_counts

    tgt, _, _ = _split(corpora)
    m = hashed_ngram_counts(tgt, dim=64, n_max=2)
    assert m.count() <= 64
    assert m.filter("bucket < 0 OR bucket >= 64").count() == 0
