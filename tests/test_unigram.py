"""Unigram-LM tokenizer (unigram.py): forward-backward kernel sanity,
distributed-EM parity vs an independent pure-Python trainer, Viterbi
determinism, prune invariants, and the Spark encode pass."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mashspark.unigram import (_MICRO, _normalize_logprobs, encode_unigram,
                               expected_counts_word, seed_substring_counts,
                               select_seed_vocab, train_unigram,
                               viterbi_segment)

CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "a cat and a rat sat",
    "the mat sat flat",
    "rats and cats sat on mats",
] * 3


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# kernel: forward-backward expected counts
# ---------------------------------------------------------------------------


def test_expected_counts_single_segmentation():
    # vocab covers 'ab' only as a+b: expected counts are exact integers
    logp = {"a": math.log(0.5), "b": math.log(0.5)}
    ec = expected_counts_word("ab", logp, 3)
    assert ec == {"a": pytest.approx(1.0), "b": pytest.approx(1.0)}


def test_expected_counts_two_way_split():
    # 'ab' segmentable as [ab] or [a, b]; p(ab)=0.5, p(a)=p(b)=0.25
    # P([ab]) = 0.5, P([a,b]) = 0.0625 -> posterior(ab) = 8/9
    logp = {"a": math.log(0.25), "b": math.log(0.25), "ab": math.log(0.5)}
    ec = expected_counts_word("ab", logp, 2)
    assert ec["ab"] == pytest.approx(8 / 9)
    assert ec["a"] == pytest.approx(1 / 9)
    assert ec["b"] == pytest.approx(1 / 9)


def test_expected_counts_total_mass():
    # expected piece usages per word = sum over segmentations weighted by
    # posterior; every segmentation of 'aaa' uses between 2 and 3 pieces
    logp = _normalize_logprobs({"a": 4 * _MICRO, "aa": 2 * _MICRO})
    ec = expected_counts_word("aaa", logp, 2)
    total = sum(ec.values())
    assert 2.0 < total < 3.0


# ---------------------------------------------------------------------------
# seed vocabulary (relational stage)
# ---------------------------------------------------------------------------


def test_seed_substring_counts_match_local(spark, docs):
    from mashspark.bpe import word_frequencies

    words = word_frequencies(docs)
    got = {r.piece: r.total for r in seed_substring_counts(words, 3).collect()}
    # independent local recount
    expect = Counter()
    wc = Counter(w for t in CORPUS for w in t.split())
    for w, c in wc.items():
        for i in range(len(w)):
            for n in range(1, min(3, len(w) - i) + 1):
                expect[w[i:i + n]] += c
    assert got == dict(expect)


def test_select_seed_keeps_all_single_chars(spark, docs):
    from mashspark.bpe import word_frequencies

    vocab = select_seed_vocab(word_frequencies(docs), seed_size=5,
                              max_piece_len=4)
    chars = {c for t in CORPUS for w in t.split() for c in w}
    assert chars <= set(vocab)


# ---------------------------------------------------------------------------
# training: parity vs an independent single-process reference
# ---------------------------------------------------------------------------


def _reference_train(corpus, vocab_size, max_piece_len=4, seed_size=None,
                     shrink_factor=0.75, em_rounds_per_prune=2):
    """Independent reimplementation of the documented algorithm with
    plain loops (shares only the per-word kernel, which is itself
    pinned by the closed-form tests above)."""
    wc = Counter(w for t in corpus for w in t.split())
    if seed_size is None:
        seed_size = 4 * vocab_size
    sub = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for n in range(1, min(max_piece_len, len(w) - i) + 1):
                sub[w[i:i + n]] += c
    top = sorted(sub.items(), key=lambda pc: (-pc[1], pc[0]))[:seed_size]
    vocab = dict(top)
    for p, c in sub.items():
        if len(p) == 1:
            vocab.setdefault(p, c)
    micro = {p: c * _MICRO for p, c in vocab.items()}

    def e_step(logp):
        acc = {}
        for w, c in wc.items():
            for piece, v in expected_counts_word(w, logp, max_piece_len).items():
                acc[piece] = acc.get(piece, 0) + int(round(v * c * _MICRO))
        return acc

    while True:
        logp = _normalize_logprobs(micro)
        for _ in range(em_rounds_per_prune):
            new = e_step(logp)
            micro = {p: new.get(p, 0) for p in logp}
            logp = _normalize_logprobs(micro)
        n_chars = sum(1 for p in micro if len(p) == 1)
        if len(micro) <= max(vocab_size, n_chars):
            break
        keep_target = max(vocab_size, n_chars, int(len(micro) * shrink_factor))
        multi = sorted(((p, c) for p, c in micro.items() if len(p) > 1),
                       key=lambda pc: (-pc[1], pc[0]))
        kept = dict(multi[: keep_target - n_chars])
        micro = {p: c for p, c in micro.items() if len(p) == 1 or p in kept}
    final = e_step(_normalize_logprobs(micro))
    micro = {p: final.get(p, 0) for p in micro}
    return _normalize_logprobs(micro)


def test_train_matches_reference_exactly(spark, docs):
    got = train_unigram(docs, vocab_size=24, max_piece_len=4)
    expect = _reference_train(CORPUS, vocab_size=24, max_piece_len=4)
    assert set(got) == set(expect)
    # fixed-point E-step aggregation makes the match exact, not approx
    for p in expect:
        assert got[p] == pytest.approx(expect[p], abs=1e-12), p


def test_train_partitioning_invariant(spark, docs):
    a = train_unigram(docs.repartition(1), vocab_size=20, max_piece_len=4)
    b = train_unigram(docs.repartition(7), vocab_size=20, max_piece_len=4)
    assert a == b


def test_trained_vocab_contains_frequent_words(spark, docs):
    logp = train_unigram(docs, vocab_size=24, max_piece_len=4)
    assert "the" in logp and "sat" in logp and "cat" in logp
    n_multi = sum(1 for p in logp if len(p) > 1)
    n_chars = sum(1 for p in logp if len(p) == 1)
    assert n_multi + n_chars == len(logp)
    assert len(logp) <= 24 or n_multi == 0


# ---------------------------------------------------------------------------
# Viterbi + encode
# ---------------------------------------------------------------------------


def test_viterbi_picks_best_and_breaks_ties_long_first():
    logp = {"a": math.log(0.2), "b": math.log(0.2), "ab": math.log(0.3)}
    assert viterbi_segment("ab", logp, 2) == ["ab"]
    # unknown char falls back to single chars without crashing
    assert viterbi_segment("aXb", logp, 2) == ["a", "X", "b"]
    # exact tie: p(cd) == p(c)*p(d) -> prefer the longer piece
    logp2 = {"c": math.log(0.5), "d": math.log(0.5), "cd": math.log(0.25)}
    assert viterbi_segment("cd", logp2, 2) == ["cd"]


def test_encode_roundtrip_and_spark_matches_local(spark, docs):
    logp = train_unigram(docs, vocab_size=24, max_piece_len=4)
    out = encode_unigram(docs, logp, max_piece_len=4).orderBy("doc_id").collect()
    assert len(out) == len(CORPUS)
    for r in out:
        text = CORPUS[r.doc_id]
        # concatenating pieces restores the whitespace-stripped text
        assert "".join(r.pieces) == text.replace(" ", "")
        local = [p for w in text.split()
                 for p in viterbi_segment(w, logp, 4)]
        assert list(r.pieces) == local
        assert r.n_pieces == len(local)


def test_encode_plan_is_map_only(spark, docs):
    logp = {"a": math.log(1.0)}
    plan = (encode_unigram(docs, logp)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan
