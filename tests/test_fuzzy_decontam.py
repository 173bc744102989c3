"""Per-item fuzzy decontamination (decontam.fuzzy_contamination_pairs)
vs a pure-Python n-gram-set brute force."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mashspark.decontam import fuzzy_contamination_pairs

_BENCH = [
    (0, "What is the capital of France? The capital of France is Paris."),
    (1, "Name the largest planet. Jupiter is the largest planet in the"
        " solar system."),
]
_DOCS = [
    # verbatim quote embedded in filler
    (10, "some filler text here. What is the capital of France? The"
         " capital of France is Paris. trailing filler words follow."),
    # near-verbatim: one word edited
    (11, "intro words. Name the biggest planet. Jupiter is the largest"
         " planet in the solar system. outro."),
    # topical overlap, no quoted span
    (12, "Paris is a city in France. Jupiter is a planet. capital"
         " letters are big."),
    # clean
    (13, "completely unrelated content about cooking pasta at home."),
]


def _grams(text, n):
    ws = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def _brute(n, threshold):
    out = {}
    for b_id, b in _BENCH:
        bg = _grams(b, n)
        for d_id, d in _DOCS:
            hit = len(bg & _grams(d, n))
            if hit:
                out[(d_id, b_id)] = (len(bg), hit,
                                     hit >= threshold * len(bg))
    return out


@pytest.mark.parametrize("n,threshold", [(4, 0.5), (6, 0.8), (3, 0.3)])
def test_matches_bruteforce(spark, n, threshold):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(_BENCH, "doc_id long, text string")
    got = {(r.doc_id, r.bench_id): (r.n_item_ngrams, r.n_matched,
                                    r.contaminated)
           for r in fuzzy_contamination_pairs(
               docs, bench, n=n, threshold=threshold).collect()}
    assert got == _brute(n, threshold)


def test_fuzzy_catches_what_exact_ngram_misses(spark):
    """Doc 11 edits one word of bench item 1: at n=6 it still covers
    most of the item's 6-grams (fuzzy flags it) while a verbatim
    13-gram containment-style rule (threshold=1.0 full coverage)
    does not."""
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(_BENCH, "doc_id long, text string")
    fuzzy = {(r.doc_id, r.bench_id)
             for r in fuzzy_contamination_pairs(
                 docs, bench, n=6, threshold=0.5).collect()
             if r.contaminated}
    assert (11, 1) in fuzzy          # near-verbatim caught
    assert (10, 0) in fuzzy          # verbatim caught
    assert (13, 0) not in fuzzy and (13, 1) not in fuzzy
    strict = {(r.doc_id, r.bench_id)
              for r in fuzzy_contamination_pairs(
                  docs, bench, n=6, threshold=1.0).collect()
              if r.contaminated}
    assert (11, 1) not in strict     # full coverage fails on the edit
    assert (10, 0) in strict         # verbatim still passes


def test_distinct_semantics(spark):
    """Repeating the quoted span in the doc must not inflate coverage:
    n-gram sets are distinct per side."""
    bench = spark.createDataFrame(_BENCH[:1], "doc_id long, text string")
    once = spark.createDataFrame(
        [(20, "x. What is the capital of France? y.")],
        "doc_id long, text string")
    twice = spark.createDataFrame(
        [(21, "x. What is the capital of France? What is the capital of"
              " France? y.")],
        "doc_id long, text string")
    a = fuzzy_contamination_pairs(once, bench, n=4).collect()[0]
    b = fuzzy_contamination_pairs(twice, bench, n=4).collect()[0]
    assert a.n_matched == b.n_matched
