"""End-to-end dedup pipeline vs the brute-force Mash-semantics oracle
(SURVEY.md §5 item 4): dup-pair recall >= 0.99 (gate; expected 1.0 at these
params), precision == 1.0 (verification is Mash-exact), and exact cluster
agreement with union-find over the oracle edges."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from mashspark.params import LSHParams, PipelineConfig, SketchParams
from mashspark.pipeline import dedup_pipeline
from mashspark.webtext import webtext_spark_df
from tests import oracle

N_BASE = 50
SEED = 42
THRESHOLD = 0.7
# smaller s than production default keeps the brute-force oracle fast while
# exercising identical code paths
PARAMS = SketchParams(k=21, s=256, seed=42)
LSH = LSHParams(bands=32, prefix=64, band_doc_cap=50)  # low cap exercises the salted hot path
CONFIG = PipelineConfig(sketch=PARAMS, lsh=LSH, jaccard_threshold=THRESHOLD)


@pytest.fixture(scope="module")
def webtext(spark):
    df = webtext_spark_df(spark, n_base=N_BASE, seed=SEED)
    pdf = df.select("doc_id", "text").toPandas().sort_values("doc_id")
    return df, pdf


@pytest.fixture(scope="module")
def truth(webtext):
    """Oracle results keyed by real doc_id (generator ids have gaps)."""
    _, pdf = webtext
    ids = pdf["doc_id"].tolist()
    sketches = oracle.sketch_all(pdf["text"].tolist(), PARAMS)
    pairs_pos = oracle.truth_pairs(sketches, PARAMS, THRESHOLD)
    clusters_pos = oracle.truth_clusters(len(pdf), pairs_pos)
    sk_by_id = dict(zip(ids, sketches))
    pairs = {(min(ids[a], ids[b]), max(ids[a], ids[b])) for a, b in pairs_pos}
    clusters = {ids[i]: ids[lab] for i, lab in clusters_pos.items()}
    return sk_by_id, pairs, clusters


@pytest.fixture(scope="module")
def result(spark, webtext):
    df, _ = webtext
    res = dedup_pipeline(df, CONFIG)
    pairs = {
        (r.id_a, r.id_b)
        for r in res.pairs.select("id_a", "id_b").collect()
    }
    exact = {r.doc_id: r.rep_id for r in res.exact_groups.collect()}
    clusters = {r.doc_id: r.cluster_id for r in res.clusters.collect()}
    return res, pairs, exact, clusters


def _expand_detected_pairs(rep_pairs, exact):
    """rep-level verified pairs + exact groups -> doc-level detected pairs."""
    import collections

    members = collections.defaultdict(list)
    for doc, rep in exact.items():
        members[rep].append(doc)
    out = set()
    for a, b in rep_pairs:
        for x in members[a]:
            for y in members[b]:
                out.add((min(x, y), max(x, y)))
    for rep, ms in members.items():
        for x, y in itertools.combinations(sorted(ms), 2):
            out.add((x, y))
    return out


def test_sketches_match_oracle(result, truth, webtext):
    """Spark UDF sketches == numpy oracle sketches, bit for bit."""
    from mashspark.hashing import decode_sketch_bytes

    res, _, _, _ = result
    oracle_sk, _, _ = truth
    got = {
        r.doc_id: decode_sketch_bytes(r.sketch)
        for r in res.sketches.select("doc_id", "sketch").collect()
    }
    assert set(got) == set(oracle_sk)
    for did, osk in oracle_sk.items():
        assert np.array_equal(got[did], osk), f"doc {did}"


def test_dup_pair_recall_and_precision(result, truth):
    _, rep_pairs, exact, _ = result
    _, truth_pairs, _ = truth
    detected = _expand_detected_pairs(rep_pairs, exact)
    assert truth_pairs, "fixture must plant duplicate pairs"
    missed = truth_pairs - detected
    recall = 1 - len(missed) / len(truth_pairs)
    assert recall >= 0.99, f"recall {recall}: missed {sorted(missed)[:10]}"
    false = detected - truth_pairs
    assert not false, f"verification must be exact; false pairs {sorted(false)[:10]}"


def test_cluster_agreement(result, truth):
    _, _, _, clusters = result
    _, _, truth_clusters = truth
    assert clusters == truth_clusters


def test_partitioning_invariance(spark, webtext, result):
    """Same clusters regardless of input partitioning (determinism under
    different task layouts — SURVEY.md §5 item 6)."""
    df, _ = webtext
    _, _, _, clusters = result
    res2 = dedup_pipeline(df.repartition(7, "lang"), CONFIG)
    clusters2 = {r.doc_id: r.cluster_id for r in res2.clusters.collect()}
    assert clusters2 == clusters


def test_lsh_metrics_shape(result):
    res, _, _, _ = result
    row = res.lsh_metrics.collect()[0]
    assert row.n_buckets > 0
    assert row.n_dropped_buckets == 0


def test_sketch_arrow_matches_pandas(spark):
    """Round-6: sketch_documents switched to the mapInArrow generator —
    pin bit-identity against the pandas UDF path across null text, short
    docs (< k), empty docs, and non-default column names."""
    from pyspark.sql import functions as F

    from mashspark.params import LSHParams, SketchParams
    from mashspark.sketch import make_sketch_udf, sketch_documents

    rows = [(1, "the quick brown fox jumps over the lazy dog " * 30),
            (2, None), (3, ""), (4, "tiny"), (5, "x" * 21),
            (6, "the quick brown fox jumps over the lazy dog " * 30),
            (7, "unicode éèê content " * 40)]
    docs = spark.createDataFrame(rows, "my_id long, body string")
    sp, lp = SketchParams(s=64), LSHParams(prefix=32)

    arrow = sketch_documents(docs, sp, lp, id_col="my_id", text_col="body")
    udf = make_sketch_udf(sp, lp)
    pandas = (
        docs.select(F.col("my_id").alias("doc_id"), F.col("body").alias("text"))
        .withColumn("_sk", udf(F.col("text")))
        .select("doc_id", "_sk.sketch", "_sk.n_kmers", "_sk.card_est",
                "_sk.band_key", "_sk.fp1", "_sk.fp2")
    )
    a = {r["doc_id"]: r for r in arrow.collect()}
    p = {r["doc_id"]: r for r in pandas.collect()}
    assert set(a) == set(p)
    for d in a:
        ra, rp = a[d], p[d]
        assert bytes(ra["sketch"]) == bytes(rp["sketch"]), d
        assert ra["n_kmers"] == rp["n_kmers"] and ra["card_est"] == rp["card_est"]
        assert list(ra["band_key"]) == list(rp["band_key"]), d
        assert ra["fp1"] == rp["fp1"] and ra["fp2"] == rp["fp2"]


def test_verify_broadcast_attach_matches_hint_path(spark, tmp_path):
    """Round-6: verify_pairs broadcasts the sketch side when its size
    ESTIMATE is provably small (parquet-backed tables carry real stats;
    checkpointed scans never qualify). Pin output equality between the
    two attach strategies on a parquet-backed table, and that the small
    path actually fires there."""
    import numpy as np
    from pyspark.sql import functions as F

    from mashspark.params import LSHParams, SketchParams
    from mashspark.sketch import sketch_documents
    from mashspark import verify as V

    rng = np.random.default_rng(3)
    words = ["w%03d" % i for i in range(300)]
    rows = []
    for i in range(40):
        base = " ".join(words[j] for j in rng.integers(0, 300, 80))
        rows.append((i, base))
        if i % 3 == 0:
            rows.append((1000 + i, base + " extra tail"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sp, lp = SketchParams(s=128), LSHParams(prefix=64)
    path = str(tmp_path / "sk.parquet")
    sketch_documents(docs, sp, lp).write.parquet(path)
    sk = spark.read.parquet(path).select("doc_id", "sketch", "card_est")
    assert V._sketch_side_small(sk), "parquet-backed small table must qualify"

    ids = sk.select("doc_id")
    pairs = (ids.withColumnRenamed("doc_id", "id_a")
             .crossJoin(ids.withColumnRenamed("doc_id", "id_b"))
             .filter(F.col("id_a") < F.col("id_b")))
    got = V.verify_pairs(pairs, sk, sp, jaccard_threshold=0.5,
                         prefix_filter=None).orderBy("id_a", "id_b").collect()
    # force the hint path for the same inputs
    orig = V._sketch_side_small
    V._sketch_side_small = lambda _sk: False
    try:
        ref = V.verify_pairs(pairs, sk, sp, jaccard_threshold=0.5,
                             prefix_filter=None).orderBy("id_a", "id_b").collect()
    finally:
        V._sketch_side_small = orig
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]
    assert len(got) > 0
