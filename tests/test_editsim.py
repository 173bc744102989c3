"""Edit-distance near-dup verification (mashspark/editsim.py)."""

import pytest
from pyspark.sql import functions as F

from mashspark.editsim import edit_dup_pairs, edit_verify_pairs


def _py_lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # dist 3 to 1
    (3, "the quick brown fox leaps over the lazy dog"),   # dist 4 to 1
    (4, "a completely different sentence about nothing"),
    (5, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (6, ""),
    (7, ""),                                              # exact dup of 6
]


def test_edit_dup_pairs_matches_python(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["edit_dist"]
           for r in edit_dup_pairs(df, max_dist=4).collect()}
    texts = dict(_DOCS)
    want = {}
    for a in texts:
        for b in texts:
            if a < b:
                d = _py_lev(texts[a], texts[b])
                if d <= 4:
                    want[(a, b)] = d
    assert got == want
    assert got[(1, 5)] == 0 and got[(6, 7)] == 0
    assert got[(1, 2)] == 3
    assert (1, 4) not in got


def test_edit_sim_normalization(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    rows = {(r["id_a"], r["id_b"]): r["edit_sim"]
            for r in edit_dup_pairs(df, max_dist=4).collect()}
    # dist 3 over the 43-char strings
    assert rows[(1, 2)] == pytest.approx(1 - 3 / 43, abs=1e-6)
    # two empty strings: defined as similarity 1.0, not 0/0
    assert rows[(6, 7)] == 1.0


def test_edit_verify_pairs_confirms_candidates_only(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["edit_dist"]
           for r in edit_verify_pairs(df, cand, max_dist=4).collect()}
    # (1,4) is a candidate but fails the cap, as does (2,3) (dist 6:
    # jumps->leaps is 3 edits + cat->dog is 3); pairs not in the
    # candidate set never appear even if similar (6,7)
    texts = dict(_DOCS)
    assert _py_lev(texts[2], texts[3]) == 6
    assert set(got) == {(1, 2), (1, 3), (1, 5)}
    for (a, b), d in got.items():
        assert d == _py_lev(texts[a], texts[b])


def test_edit_verify_is_jvm_only(spark):
    """No Python evaluation in the verify plan: the DP runs as the JVM
    levenshtein expression (BatchEvalPython/ArrowEvalPython absent)."""
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    plan = edit_verify_pairs(df, cand, max_dist=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "levenshtein" in plan


def test_edit_verify_composes_with_lsh_candidates(spark):
    """End-to-end: LSH candidates -> edit verify finds the planted
    one-word-edit family without any brute-force pass."""
    from mashspark.webtext import webtext_spark_df

    base = webtext_spark_df(spark, n_base=40, seed=5).select("doc_id", "text")
    # plant a near-exact copy of doc 0 with a tiny edit
    src = base.filter(F.col("doc_id") == 0).select(
        F.lit(100000).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"))
    docs = base.unionByName(src)

    from mashspark.params import LSHParams, SketchParams
    from mashspark.lsh import candidate_pairs
    from mashspark.sketch import sketch_documents

    sk = sketch_documents(docs, SketchParams(k=21, s=200, seed=42),
                          LSHParams())
    cand, _metrics = candidate_pairs(sk)
    cand = cand.select("id_a", "id_b")
    got = edit_verify_pairs(docs, cand, max_dist=5).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(0, 100000)}
    assert got[0]["edit_dist"] == 2
