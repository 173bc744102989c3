"""Benchmark decontamination (decontam.py): planted-overlap correctness
plus the plan properties that make it scale (no Python UDF, broadcast
membership join, map-side partial aggregation)."""

import contextlib
import io

from pyspark.sql import functions as F

from mashspark.decontam import benchmark_ngram_hashes, contamination_flags

BENCH_SENT = "the quick brown fox jumps over the lazy dog tonight"  # 10 words


def _docs(spark):
    rows = [
        # 0: contains the benchmark sentence verbatim (plus padding)
        (0, "intro words here " + BENCH_SENT + " and some trailing words"),
        # 1: same sentence but punctuated/case-mangled -> normalization
        #    must still catch it
        (1, "Intro! THE quick, brown FOX jumps over the lazy dog TONIGHT?!"),
        # 2: clean doc, same vocabulary but different order
        (2, "dog lazy the over jumps fox brown quick the tonight dog fox " * 3),
        # 3: quotes the sentence twice -> positional hits count twice
        (3, BENCH_SENT + " filler middle words " + BENCH_SENT),
        # 4: too short to form any 10-gram
        (4, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(100, BENCH_SENT), (101, "completely unrelated benchmark prompt "
                                  "about seven distinct other things")],
        "doc_id long, text string")


def test_contamination_planted(spark):
    out = {r["doc_id"]: r for r in
           contamination_flags(_docs(spark), _bench(spark), n=10).collect()}
    assert len(out) == 5
    assert out[0]["contaminated"] and out[0]["n_contaminated"] == 1
    assert out[1]["contaminated"] and out[1]["n_contaminated"] == 1
    assert not out[2]["contaminated"] and out[2]["n_total_ngrams"] > 0
    assert out[3]["contaminated"] and out[3]["n_contaminated"] == 2
    assert not out[4]["contaminated"] and out[4]["n_total_ngrams"] == 0
    # n-gram totals: doc 0 has 3 + 10 + 4 = 17 words -> 8 10-grams
    assert out[0]["n_total_ngrams"] == 8


def test_benchmark_side_is_distinct(spark):
    # the same sentence in two benchmark docs -> one hash set entry
    twice = _bench(spark).unionByName(_bench(spark))
    n1 = benchmark_ngram_hashes(_bench(spark), n=10).count()
    n2 = benchmark_ngram_hashes(twice, n=10).count()
    assert n1 == n2 > 0


def test_contamination_plan_shape(spark):
    df = contamination_flags(_docs(spark), _bench(spark), n=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # pure codegen: no Python evaluation anywhere
    assert "EvalPython" not in plan, plan
    # the benchmark set builds the broadcast side of the membership join
    assert "BroadcastHashJoin" in plan, plan
    # per-doc totals aggregate with map-side partials before the exchange
    assert "partial_count" in plan, plan
