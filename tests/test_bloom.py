"""Bloom-filter cross-corpus membership prefilter (mashspark/bloom.py).

Pins the three properties the operator promises:
* no false negatives (every reference member probes true);
* realized false-positive rate near the sized fpp;
* the confirmed result is bit-identical to a plain exact semi-join —
  the Bloom layer changes the plan, never the answer.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from mashspark.bloom import (BloomFilter, bloom_probe_udf, bloom_size,
                             build_bloom, membership_flags)
from mashspark.webtext import webtext_spark_df


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def corpus(spark):
    return webtext_spark_df(spark, n_base=60, seed=11).select(
        "doc_id", "text").persist()


def _split(corpus):
    ref = corpus.filter(F.col("doc_id") % 2 == 0)
    # new side: odd docs (absent) + a re-keyed slice of ref (present)
    overlap = (
        corpus.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 40))
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    new = corpus.filter(F.col("doc_id") % 2 == 1).unionByName(overlap)
    return new, ref


def test_bloom_size_math():
    m, k = bloom_size(1000, 0.01)
    assert 9000 <= m <= 10000  # -n ln(.01)/ln^2(2) = 9585
    assert k == 7
    with pytest.raises(ValueError):
        bloom_size(10, 0.0)


def test_no_false_negatives(spark, corpus):
    fps = corpus.select(F.col("text").alias("_fp")).distinct()
    n = fps.count()
    m, k = bloom_size(n, 0.01)
    bloom = build_bloom(fps, "_fp", m, k)
    assert 0 < bloom.n_set_bits <= min(n * k, m)
    probe = bloom_probe_udf(fps, bloom)
    from mashspark.bloom import bloom_hash_cols

    h1, h2 = bloom_hash_cols(F.col("_fp"))
    misses = fps.withColumn("hit", probe(h1, h2)).filter(~F.col("hit"))
    assert misses.count() == 0


def test_fpp_bounded(spark):
    members = spark.range(2000).select(
        F.concat(F.lit("member:"), F.col("id")).alias("_fp"))
    m, k = bloom_size(2000, 0.01)
    bloom = build_bloom(members, "_fp", m, k)
    assert bloom.est_fpp < 0.05
    outsiders = spark.range(4000).select(
        F.concat(F.lit("outsider:"), F.col("id")).alias("_fp"))
    from mashspark.bloom import bloom_hash_cols

    h1, h2 = bloom_hash_cols(F.col("_fp"))
    probe = bloom_probe_udf(outsiders, bloom)
    fp = outsiders.withColumn("hit", probe(h1, h2)).filter("hit").count()
    # deterministic draw (md5 of fixed strings); generous 5x headroom
    assert fp / 4000 < 0.05


def test_membership_flags_match_exact_semijoin(spark, corpus):
    new, ref = _split(corpus)
    got = membership_flags(new, ref, fpp=0.01)
    exact_true = {
        r.doc_id
        for r in new.join(ref.select("text").distinct(), "text", "left_semi")
        .select("doc_id").collect()
    }
    rows = got.collect()
    assert len(rows) == new.count()
    flagged = {r.doc_id for r in rows if r.in_reference}
    assert flagged == exact_true
    n_planted = new.filter(F.col("doc_id") >= 10_000_000).count()
    assert n_planted > 0 and len(flagged) == n_planted


def test_confirm_false_is_superset_no_false_negatives(spark, corpus):
    new, ref = _split(corpus)
    approx = membership_flags(new, ref, fpp=0.01, confirm=False)
    exact = membership_flags(new, ref, fpp=0.01, confirm=True)
    a = {r.doc_id for r in approx.collect() if r.in_reference}
    e = {r.doc_id for r in exact.collect() if r.in_reference}
    assert e <= a  # probe never misses a member
    assert len(a - e) <= len(e)  # and doesn't drown in false positives


def test_empty_reference_all_false(spark, corpus):
    new, ref = _split(corpus)
    out = membership_flags(new, ref.filter(F.lit(False)), fpp=0.01)
    assert out.filter("in_reference").count() == 0
    assert out.count() == new.count()


def test_confirm_join_sees_only_probe_survivors(spark, corpus):
    """Plan guard: the exact semi-join's probe side must be gated by the
    Bloom filter (an ArrowEvalPython stage feeding a Filter on the probe
    verdict), so at scale the join reads survivors, not the corpus."""
    new, ref = _split(corpus)
    plan = plan_of(membership_flags(new, ref, fpp=0.01))
    assert "LeftSemi" in plan, plan
    assert "ArrowEvalPython" in plan, plan
    # the probe verdict (projected as pythonUDF0 in the formatted plan)
    # must gate a Filter feeding the semi-join
    assert "Condition : pythonUDF" in plan, plan


def test_probe_wraps_word_boundaries():
    """Bit arithmetic sanity off the 64-bit word edges: positions 63/64
    land in different words, position m-1 is addressable."""
    import numpy as np

    words = np.zeros(2, dtype=np.uint64)
    for pos in (0, 63, 64, 127):
        words[pos >> 6] |= np.uint64(1) << np.uint64(pos & 63)
    bf = BloomFilter(m_bits=128, k=1, words=words)
    assert bf.n_set_bits == 4


def test_save_load_roundtrip(spark, corpus, tmp_path):
    import numpy as np

    from mashspark.bloom import load_bloom, save_bloom

    fps = corpus.select(F.col("text").alias("_fp")).distinct()
    m, k = bloom_size(fps.count(), 0.01)
    bloom = build_bloom(fps, "_fp", m, k)
    path = str(tmp_path / "store")
    save_bloom(spark, bloom, path)
    back = load_bloom(spark, path)
    assert back.m_bits == bloom.m_bits and back.k == bloom.k
    assert np.array_equal(back.words, bloom.words)


def test_prebuilt_bloom_skips_build_and_allows_refless_probe(
        spark, corpus, tmp_path):
    from mashspark.bloom import load_bloom, save_bloom

    new, ref = _split(corpus)
    fps = ref.select(F.col("text").alias("_fp")).distinct()
    m, k = bloom_size(fps.count(), 0.01)
    bloom = build_bloom(fps, "_fp", m, k)
    path = str(tmp_path / "store2")
    save_bloom(spark, bloom, path)
    loaded = load_bloom(spark, path)
    # probe-only mode needs no reference corpus at all
    approx = membership_flags(new, None, confirm=False, bloom=loaded)
    a = {r.doc_id for r in approx.collect() if r.in_reference}
    exact = membership_flags(new, ref)
    e = {r.doc_id for r in exact.collect() if r.in_reference}
    assert e <= a
    with pytest.raises(ValueError):
        membership_flags(new, None)  # confirm without a ref is an error
