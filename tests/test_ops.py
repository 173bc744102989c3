"""Operator-level tests: textstats, simhash, ann, screen (Spark vs
independent python/numpy oracles), multimodal plumbing, webtext generator
determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mashspark.params import LSHParams, SketchParams
from mashspark.webtext import generate_webtext, webtext_spark_df


@pytest.fixture(scope="module")
def docs(spark):
    return webtext_spark_df(spark, n_base=20, seed=3).select(
        "doc_id", "text", "lang"
    ).persist()


def test_webtext_distributed_matches_pandas(spark):
    from mashspark.webtext import webtext_spark_distributed

    pdf = generate_webtext(n_base=15, seed=9)
    ddf = (
        webtext_spark_distributed(spark, n_base=15, seed=9, num_partitions=4)
        .orderBy("doc_id")
        .toPandas()
    )
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    assert list(ddf["doc_id"]) == list(pdf["doc_id"])
    assert list(ddf["text"]) == list(pdf["text"])
    assert list(ddf["url"]) == list(pdf["url"])


def test_token_and_quality_vs_python(spark, docs):
    from mashspark.textstats import quality_features

    got = {r.doc_id: r for r in quality_features(docs).collect()}
    for row in docs.collect():
        t = row.text
        g = got[row.doc_id]
        assert g.n_tokens == len(t.split(" "))
        assert g.n_punct == sum(t.count(c) for c in ".,!?;:")
        assert g.n_chars_obs == len(t)


def test_simhash_hamming_small_for_near_dups(spark):
    """Near-dup variants of the same base should have small Hamming
    distance; unrelated docs large."""
    from mashspark.simhash import simhash_batch

    pdf = generate_webtext(n_base=10, seed=5)
    sigs = simhash_batch(pdf["text"].tolist(), k=8, seed=42)
    base = pdf["base_id"].to_numpy()
    sames, diffs = [], []
    u = np.asarray(sigs, dtype=np.uint64)
    for i in range(len(u)):
        for j in range(i + 1, len(u)):
            h = bin(int(u[i]) ^ int(u[j])).count("1")
            (sames if base[i] == base[j] else diffs).append(h)
    assert np.mean(sames) < 10
    assert np.mean(diffs) > 20
    assert np.mean(sames) + 8 < np.mean(diffs)


def test_screen_finds_planted_containment(spark):
    """A doc embedded verbatim inside other docs must screen with high
    identity."""
    from mashspark.screen import screen
    from mashspark.sketch import sketch_documents

    sp = SketchParams(k=21, s=128)
    needle = "unique boilerplate fragment " * 20
    host_rows = [(100 + i, ("filler words %d " % i) * 50 + needle) for i in range(3)]
    hosts = spark.createDataFrame(host_rows, "doc_id long, text string")
    ref = spark.createDataFrame([(1, needle)], "doc_id long, text string")
    ref_sk = sketch_documents(ref, sp, LSHParams(bands=32))
    out = screen(ref_sk, hosts, sp).collect()
    assert len(out) == 1
    assert out[0].identity > 0.95
    assert out[0].shared == out[0].denom  # fully contained


def test_screen_median_multiplicity(spark):
    from mashspark.screen import screen
    from mashspark.sketch import sketch_documents

    sp = SketchParams(k=21, s=64)
    frag = "zzz unique fragment payload " * 10
    # fragment appears twice in one host and once in another ->
    # most shared hashes have multiplicity 3
    hosts = spark.createDataFrame(
        [(1, frag + " middle filler " + frag), (2, frag)],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame([(7, frag)], "doc_id long, text string")
    ref_sk = sketch_documents(ref, sp, LSHParams(bands=32))
    out = screen(ref_sk, hosts, sp).collect()[0]
    assert out.median_multiplicity >= 2


def test_multimodal_plumbing(spark):
    from mashspark.multimodal import (extract_media_features, media_exact_dups,
                                      synthetic_media)

    media = synthetic_media(spark, n=70, seed=1)
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 70
    assert all(len(r.feature) == 16 for r in rows)
    dups = media_exact_dups(feats).collect()
    # every 7th row is a planted exact dup of its predecessor
    assert sum(r.n_copies for r in dups) >= 18
    # determinism
    rows2 = extract_media_features(media).collect()
    assert {(r.media_id, r.content_hash) for r in rows} == {
        (r.media_id, r.content_hash) for r in rows2
    }


def test_ann_knn_matches_numpy(spark):
    from mashspark.ann import knn_bruteforce

    rng = np.random.default_rng(0)
    mat = rng.standard_normal((60, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    out = knn_bruteforce(df, df.filter(F.col("vec_id") < 5), top_k=3)
    got = {(r.query_id, r.rank): r.neighbor_id for r in out.collect()}
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(5):
        order = [
            j for j in np.argsort(-sims[q], kind="stable") if j != q
        ][:3]
        for rank, j in enumerate(order, start=1):
            assert got[(q, rank)] == j, (q, rank)


def test_info_kmv_matches_core(spark):
    from mashspark.info import sketch_cardinalities
    from mashspark.minhash import kmv_set_size, sketch_text_bytes
    from mashspark.sketch import sketch_documents

    sp = SketchParams(k=21, s=64)
    d = webtext_spark_df(spark, n_base=5, seed=11).select("doc_id", "text")
    sk = sketch_documents(d, sp, LSHParams(bands=32))
    got = {r.doc_id: r.kmv_cardinality for r in sketch_cardinalities(sk).collect()}
    for row in d.collect():
        osk = sketch_text_bytes(row.text.encode(), sp.k, sp.s, sp.seed)
        expect = kmv_set_size(osk) if len(osk) >= sp.s else len(osk)
        assert got[row.doc_id] == expect, row.doc_id
