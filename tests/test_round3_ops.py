"""Round-3 additions: language-ID votes, vectorized binomial tails,
pipeline block release, screen shuffle-free KMV set size."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mashspark.params import PipelineConfig, SketchParams


def test_language_id_votes(spark):
    """Stopword-vote heuristic: clear en/de/fr texts classify correctly,
    stopword-free text falls back to 'und'."""
    from mashspark.textstats import language_id

    rows = [
        (1, "the cat and the dog ran to the house and it is big"),
        (2, "der hund und die katze und das haus ist hier und der baum"),
        (3, "le chat et la maison et les arbres et des fleurs et le chien"),
        (4, "xyzzy plugh quux"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.lang_pred for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_binom_sf_vectorized_matches_scalar():
    """The batched tail (dedup + per-row-offset matrix logsumexp) must
    agree with the scalar reference across the whole parameter space,
    including boundary cases, to well inside the golden tolerance."""
    from mashspark.compare import _binom_sf_scalar, binom_sf

    rng = np.random.default_rng(7)
    xs = rng.integers(-2, 1200, 2000)
    rs = rng.random(2000) * 1.3 - 0.15  # includes r<=0 and r>=1
    ns = np.where(rng.random(2000) < 0.8, 1000, rng.integers(1, 3000, 2000))
    got = binom_sf(xs, rs, ns)
    want = np.array(
        [_binom_sf_scalar(int(x), float(r), int(n)) for x, r, n in zip(xs, rs, ns)]
    )
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
    assert rel.max() < 1e-8


def test_release_frees_all_checkpoint_blocks(spark, tmp_path):
    """DedupResult.release() must unpin EVERY localCheckpoint the pipeline
    created (sketches, tier-1 survivors, pairs, lsh internals) — a plain
    unpersist() on the returned DataFrames is a silent no-op for
    checkpointed RDDs."""
    from mashspark.pipeline import dedup_pipeline
    from mashspark.webtext import webtext_spark_df

    docs = webtext_spark_df(spark, n_base=40, seed=5).select("doc_id", "text")
    before = set(
        int(k) for k in
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    res = dedup_pipeline(
        docs, PipelineConfig(sketch=SketchParams(s=128), jaccard_threshold=0.7)
    )
    res.clusters.count()
    mid = set(
        int(k) for k in
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    assert mid - before, "pipeline should have created checkpoint blocks"
    res.release()
    after = set(
        int(k) for k in
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    assert after <= before, f"leaked persistent RDDs: {sorted(after - before)}"


def test_screen_set_size_matches_shuffled_formulation(spark):
    """The shuffle-free per-partition bottom-s KMV must equal the old
    distinct()-then-sort set size (same bottom-s distinct hashes)."""
    from mashspark.minhash import kmv_set_size
    from mashspark.hashing import decode_signed
    from mashspark.screen import _kmv_set_size_from_hashes, make_all_hashes_udf
    from mashspark.webtext import webtext_spark_df

    sp = SketchParams(k=21, s=64, seed=42)
    docs = webtext_spark_df(spark, n_base=30, seed=11).select("doc_id", "text")
    udf = make_all_hashes_udf(sp.k, sp.seed)
    exploded = docs.select(F.explode(udf(F.col("text"))).alias("hash"))
    got = _kmv_set_size_from_hashes(exploded, sp.s)
    rows = exploded.distinct().orderBy("hash").limit(sp.s).collect()
    vals = decode_signed(np.array([r.hash for r in rows], dtype=np.int64))
    want = kmv_set_size(vals)
    assert got == want


def test_url_normalization_variants(spark):
    """Canonicalization folds fragment / www / default-port / tracking /
    trailing-slash variants together and keeps real differences apart."""
    from mashspark.urls import with_normalized_url

    rows = [
        (0, "https://example.com/p/7/"),
        (1, "https://WWW.Example.COM/p/7#frag"),
        (2, "https://example.com:443/p/7?utm_source=x&utm_campaign=y"),
        (3, "HTTP://example.com:80/p/7"),
        (4, "https://example.com/p/7?b=2&a=1"),
        (5, "https://example.com/p/7?a=1&b=2&fbclid=zzz"),
        (6, "https://example.com/p/8"),
        (7, "http://example.com/p/7"),
        (8, "https://example.com"),
        (9, "https://example.com/"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r.norm_url for r in with_normalized_url(df).collect()}
    # 0,1,2 fold to the canonical https form
    assert got[0] == got[1] == got[2] == "https://example.com/p/7"
    # :80 stripped only under http; scheme difference is preserved
    assert got[3] == got[7] == "http://example.com/p/7"
    assert got[3] != got[0]
    # param order is not semantic; tracking params are dropped
    assert got[4] == got[5] == "https://example.com/p/7?a=1&b=2"
    assert got[4] != got[0]
    # different path stays different; bare host == trailing-slash host
    assert got[6] == "https://example.com/p/8"
    assert got[8] == got[9] == "https://example.com"


def test_url_dedup_keeps_min_id_rep(spark):
    from mashspark.urls import url_dedup, url_dup_groups

    rows = [
        (10, "https://a.com/x?utm_source=1"),
        (11, "https://www.a.com/x"),
        (12, "https://a.com/y"),
        (13, "https://a.com/x/"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r.doc_id for r in url_dedup(df).collect())
    assert kept == [10, 12]
    groups = url_dup_groups(df).collect()
    assert len(groups) == 1
    assert groups[0].n_docs == 3 and groups[0].min_doc_id == 10


def test_extract_text_byte_identical_per_url(spark):
    """input_hint invariant: extracted text is a pure function of the html
    bytes — re-extracting the synthetic corpus's html reproduces its text
    column byte-for-byte at any partitioning."""
    from mashspark.extract import extraction_invariant_violations
    from mashspark.webtext import webtext_spark_df

    docs = webtext_spark_df(spark, n_base=40, seed=9)
    assert extraction_invariant_violations(docs).count() == 0
    assert extraction_invariant_violations(docs.repartition(7)).count() == 0


def test_extract_text_handles_markup(spark):
    from mashspark.extract import extract_text

    rows = [
        (1, b"<html><head><script>var x=1; if (x<2) {}</script>"
            b"<style>a { color: red }</style></head>"
            b"<body><h1>Title</h1>\n<p>hello   <b>world</b></p>"
            b"<!-- hidden --> a &amp;lt; b &amp; c &lt;tag&gt;</body></html>"),
        (2, b"plain text no markup"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {r.doc_id: r.text for r in extract_text(df).collect()}
    # &amp;lt; decodes to the literal text "&lt;" (no double decode)
    assert got[1] == "Title hello world a &lt; b & c <tag>"
    assert got[2] == "plain text no markup"
