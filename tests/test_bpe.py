"""Distributed BPE training/encoding (mashspark/bpe.py) vs an
independent pure-Python reference: identical merge sequences (the
deterministic tie-break makes this exact), identical encodings."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from mashspark.bpe import encode_bpe, train_bpe, word_frequencies

_TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a hat and a bat and a rat",
    "the rat sat on the hat",
    "low lower lowest slow slower slowest",
    "low low low lower lower newest newest newest newest",
    "wider wide widest new newer newest",
]


def _ref_train(texts, n_merges, min_frequency=2):
    wf = Counter(w for t in texts for w in t.split())
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wf.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        pair, total = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if total < min_frequency:
            break
        a, b = pair
        merges.append(pair)
        nv = {}
        for syms, c in vocab.items():
            s, res, i = list(syms), [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            nv[tuple(res)] = nv.get(tuple(res), 0) + c
        vocab = nv
    return merges


def _ref_encode(text, merges):
    toks = []
    for w in text.split():
        syms = list(w) + ["</w>"]
        for a, b in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        toks.extend(syms)
    return toks


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id long, text string"
    ).persist()


def test_word_frequencies(spark, docs):
    got = {r.word: r["count"] for r in word_frequencies(docs).collect()}
    want = Counter(w for t in _TEXTS for w in t.split())
    assert got == dict(want)


def test_train_matches_reference_merge_sequence(spark, docs):
    merges = train_bpe(docs, n_merges=24)
    assert merges == _ref_train(_TEXTS, 24)
    assert len(merges) > 10  # the fixture supports a deep merge table
    # merged symbols must reconstruct real substrings (+ the marker)
    corpus = " ".join(_TEXTS)
    for a, b in merges:
        assert (a + b).replace("</w>", "") in corpus


def test_encode_matches_reference_and_is_lossless(spark, docs):
    merges = train_bpe(docs, n_merges=24)
    rows = encode_bpe(docs, merges).collect()
    assert len(rows) == len(_TEXTS)
    for r in rows:
        want = _ref_encode(_TEXTS[r.doc_id], merges)
        assert list(r.bpe_tokens) == want
        assert r.n_bpe_tokens == len(want)
        # decode: stripping markers reconstructs the original text
        decoded = "".join(r.bpe_tokens).replace("</w>", " ").strip()
        assert decoded == _TEXTS[r.doc_id]


def test_encode_compresses(spark, docs):
    """More merges -> fewer tokens; zero merges = chars + markers."""
    n0 = encode_bpe(docs, []).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    chars = sum(len(w) + 1 for t in _TEXTS for w in t.split())
    assert n0 == chars
    merges = train_bpe(docs, n_merges=24)
    n24 = encode_bpe(docs, merges).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert n24 < n0


def test_min_frequency_stops_early(spark, docs):
    """A huge merge budget stops when no pair clears min_frequency."""
    merges = train_bpe(docs, n_merges=10_000, min_frequency=3)
    assert 0 < len(merges) < 10_000
    ref = _ref_train(_TEXTS, 10_000, min_frequency=3)
    assert merges == ref


def test_checkpoint_blocks_released(spark, docs):
    before = {int(k) for k in
              spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}
    train_bpe(docs, n_merges=6)
    after = {int(k) for k in
             spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}
    assert after - before == set()  # no leaked symbol-table blocks


def test_train_validates_args(spark, docs):
    with pytest.raises(ValueError):
        train_bpe(docs, 0)


def test_batched_training_parity_and_round_reduction(spark, docs):
    """Round-4 batching: the merge sequence must stay bit-identical to
    the serial reference while the number of Spark round-trips drops
    well below one-per-merge (the parity-safe prefix rule)."""
    from mashspark.bpe import train_bpe

    merges = train_bpe(docs, n_merges=24)
    assert merges == _ref_train(_TEXTS, 24)
    assert train_bpe.last_rounds < 24, train_bpe.last_rounds

    # single-candidate window degrades to exactly the serial rounds and
    # the same sequence (the fallback path)
    merges1 = train_bpe(docs, n_merges=10, batch_top=1)
    assert merges1 == _ref_train(_TEXTS, 10)


def test_relaxed_batching_round_reduction(spark, docs):
    """strict_parity=False: rounds collapse ~batch-fold; the merge SET
    stays a valid BPE vocabulary (every merged symbol reconstructs a
    corpus substring) of the same size."""
    from mashspark.bpe import train_bpe

    fast = train_bpe(docs, n_merges=20, strict_parity=False)
    assert len(fast) == 20
    assert train_bpe.last_rounds <= 8, train_bpe.last_rounds
    corpus = " ".join(_TEXTS)
    for a, b in fast:
        assert (a + b).replace("</w>", "") in corpus
