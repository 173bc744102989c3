"""Corpus profiling (mashspark/profile.py) vs a pandas brute force;
plan guard for the two-level distinct-count shape."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from mashspark.profile import corpus_summary, group_profile
from mashspark.webtext import webtext_spark_df


@pytest.fixture(scope="module")
def seeded(spark):
    base = webtext_spark_df(spark, n_base=40, seed=31).select(
        "doc_id", "url", "text", "lang")
    copies = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "url", "text", "lang")
    return base.unionByName(copies).persist()


def _brute(pdf):
    out = {}
    for lang, grp in pdf.groupby("lang"):
        toks = grp.text.map(lambda t: len([w for w in t.split() if w]))
        out[lang] = dict(
            n_docs=len(grp),
            n_distinct_texts=grp.text.nunique(),
            sum_chars=int(grp.text.str.len().sum()),
            sum_tokens=int(toks.sum()),
            min_tokens=int(toks.min()),
            max_tokens=int(toks.max()),
        )
    return out


def test_group_profile_matches_bruteforce(spark, seeded):
    got = {r.lang: r.asDict() for r in
           group_profile(seeded, keys=["lang"]).collect()}
    want = _brute(seeded.toPandas())
    assert set(got) == set(want)
    for lang, w in want.items():
        g = got[lang]
        for k, v in w.items():
            assert g[k] == v, (lang, k, g[k], v)


def test_dedup_headroom_counts_planted_copies(spark, seeded):
    prof = group_profile(seeded, keys=["lang"]).collect()
    headroom = sum(r.n_docs - r.n_distinct_texts for r in prof)
    n_copies = seeded.filter(F.col("doc_id") >= 1_000_000).count()
    assert headroom == n_copies


def test_corpus_summary(spark, seeded):
    s = corpus_summary(seeded, exact=True)
    assert s["n_docs"] == seeded.count()
    assert s["sum_tokens"] > 0 and s["sum_chars"] > s["sum_tokens"]
    qs = s["token_quantiles"]
    assert qs == sorted(qs)
    # HLL distinct within its ~2% default error of the exact count
    exact = seeded.select("text").distinct().count()
    assert abs(s["n_distinct_texts_approx"] - exact) <= max(3, 0.1 * exact)
    assert "n_distinct_urls_approx" in s


def test_profile_has_no_expand_and_two_level_aggs(spark, seeded):
    df = group_profile(seeded, keys=["lang"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the count(distinct) rewrite would inject Expand over the corpus
    assert "Expand" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan  # 2x partial+final
