"""Interpolated Kneser-Ney bigram LM (mashspark/kneser.py) vs an
independent pure-Python implementation."""

import math
from collections import Counter

import pytest

from mashspark.kneser import score_kn, train_kn

# ---------------------------------------------------------------------------
# independent single-process KN reference
# ---------------------------------------------------------------------------


def _py_bigrams(text):
    ws = [w for w in text.lower().split(" ") if w != ""]
    return list(zip(ws, ws[1:]))


class PyKN:
    def __init__(self, texts):
        self.c_uw = Counter()
        for t in texts:
            self.c_uw.update(_py_bigrams(t))
        self.c_u = Counter()
        self.n_cont = Counter()
        self.n_ctx = Counter()
        vocab = set()
        for (u, w), c in self.c_uw.items():
            self.c_u[u] += c
            self.n_cont[u] += 1
            self.n_ctx[w] += 1
            vocab.update((u, w))
        self.b = len(self.c_uw)
        self.v = len(vocab)
        n1 = sum(1 for c in self.c_uw.values() if c == 1)
        n2 = sum(1 for c in self.c_uw.values() if c == 2)
        self.d = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.5

    def pcont(self, w):
        return (self.n_ctx.get(w, 0) + 1) / (self.b + self.v)

    def prob(self, u, w):
        cu = self.c_u.get(u, 0)
        if cu == 0:
            return self.pcont(w)
        cuw = self.c_uw.get((u, w), 0)
        lam = self.d * self.n_cont[u] / cu
        return max(cuw - self.d, 0.0) / cu + lam * self.pcont(w)

    def score(self, text):
        bgs = _py_bigrams(text)
        if not bgs:
            return None
        n_hit = sum(1 for b in bgs if b in self.c_uw)
        n_ctx = sum(1 for u, _ in bgs if u in self.c_u)
        sum_c = sum(self.c_uw.get(b, 0) for b in bgs)
        lp = sum(math.log(self.prob(u, w)) for u, w in bgs) / len(bgs)
        return (len(bgs), n_hit, n_ctx, sum_c, lp)


# ---------------------------------------------------------------------------
# fixtures: a training register and eval docs hitting every branch
# ---------------------------------------------------------------------------

_TRAIN = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on the rug",
    "the dog ate a bone",
    "fish swim in the sea",
]

_EVAL = [
    (1, "the cat sat on the rug"),        # mostly seen bigrams
    (2, "the fish ate the dog"),          # seen words, some unseen bigrams
    (3, "quantum flux capacitors hum"),   # fully OOV: unseen ctx + words
    (4, "the cat the cat the cat"),       # repeated bigrams (occ > 1)
    (5, "single"),                        # no bigrams -> absent from output
    (6, "sea fish swim"),                 # unseen ctx ('sea' never a ctx... it is)
]


def test_train_kn_model_tables(spark):
    docs = spark.createDataFrame([(t,) for t in _TRAIN], "text string")
    m = train_kn(docs)
    py = PyKN(_TRAIN)
    assert m.b_total == py.b and m.v_size == py.v
    assert m.discount == pytest.approx(py.d)
    got_bi = {(r["u"], r["w"]): r["c_uw"] for r in m.bigrams.collect()}
    assert got_bi == dict(py.c_uw)
    got_ctx = {r["u"]: (r["c_u"], r["n_cont"]) for r in m.contexts.collect()}
    assert got_ctx == {u: (py.c_u[u], py.n_cont[u]) for u in py.c_u}
    got_w = {r["w"]: r["n_ctx"] for r in m.words.collect()}
    assert got_w == dict(py.n_ctx)


def test_score_kn_matches_reference(spark):
    docs = spark.createDataFrame([(t,) for t in _TRAIN], "text string")
    m = train_kn(docs)
    py = PyKN(_TRAIN)
    ev = spark.createDataFrame(_EVAL, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in score_kn(ev, m).collect()}
    assert 5 not in rows  # no bigrams -> no row
    for doc_id, text in _EVAL:
        want = py.score(text)
        if want is None:
            continue
        r = rows[doc_id]
        assert (r["n_bigrams"], r["n_hit_bigrams"], r["n_known_ctx"],
                r["sum_c_uw"]) == want[:4], doc_id
        assert r["logprob_per_bigram"] == pytest.approx(want[4], rel=1e-12)


def test_kn_probabilities_sum_to_at_most_one(spark):
    """For every trained context u, sum_w P(w|u) over the full vocab
    plus the OOV floor mass stays <= 1 + eps — the discount frees
    exactly the mass the continuation term redistributes."""
    py = PyKN(_TRAIN)
    vocab = set(py.n_ctx) | set(py.c_u)
    for u in py.c_u:
        total = sum(py.prob(u, w) for w in vocab)
        # the +1/+V OOV floor adds lambda(u) * V/(B+V) extra mass at
        # most; with B ~ V the bound is 1 + lambda(u)
        lam = py.d * py.n_cont[u] / py.c_u[u]
        assert total <= 1.0 + lam + 1e-9


def test_score_kn_partition_invariant_integers(spark):
    docs = spark.createDataFrame([(t,) for t in _TRAIN], "text string")
    m = train_kn(docs)
    ev = spark.createDataFrame(_EVAL, "doc_id long, text string")
    a = {(r["doc_id"], r["n_bigrams"], r["n_hit_bigrams"], r["sum_c_uw"])
         for r in score_kn(ev.repartition(1), m).collect()}
    b = {(r["doc_id"], r["n_bigrams"], r["n_hit_bigrams"], r["sum_c_uw"])
         for r in score_kn(ev.repartition(7), m).collect()}
    assert a == b


def test_kn_ranks_in_register_above_oov(spark):
    docs = spark.createDataFrame([(t,) for t in _TRAIN], "text string")
    m = train_kn(docs)
    ev = spark.createDataFrame(_EVAL, "doc_id long, text string")
    lp = {r["doc_id"]: r["logprob_per_bigram"] for r in score_kn(ev, m).collect()}
    assert lp[1] > lp[3]  # in-register beats fully-OOV
