"""Tiered dedup report (pipeline.dedup_tiers): tier precedence,
representative consistency, all four tiers exercised."""

from pyspark.sql import functions as F

from mashspark.params import PipelineConfig, SketchParams
from mashspark.pipeline import dedup_pipeline, dedup_tiers


def _fixture(spark):
    """Docs covering every tier: 0/1 byte-identical; 2 canonical-equal
    to 0 (digits differ); 3 near-dup of 0 (one word edited); 4 unique;
    5/6 byte-identical pair in a different family."""
    long_base = ("the corpus cleaning pipeline runs sketching banding "
                 "verification and clustering stages in order " * 6)
    other = ("entirely different material about nothing in particular "
             "with its own vocabulary and no shared shingles at all " * 6)
    lone = ("a third family of words appears exactly once in this corpus "
            "so nothing can pair with it under any tier whatsoever " * 6)
    rows = [
        (0, long_base + "price 100"),
        (1, long_base + "price 100"),                     # exact dup of 0
        (2, long_base + "price 999"),                     # canonical dup of 0
        (3, long_base.replace("order", "sequence", 1) + "price 100"),  # near
        (4, lone),                                        # unique
        (5, other + "tail"),
        (6, other + "tail"),                              # exact dup of 5
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_tiers_labels_and_reps(spark):
    docs = _fixture(spark)
    cfg = PipelineConfig(sketch=SketchParams(k=21, s=256, seed=42),
                         jaccard_threshold=0.7)
    got = {r["doc_id"]: (r["tier"], r["rep_id"], r["is_rep"])
           for r in dedup_tiers(docs, config=cfg).collect()}
    assert len(got) == 7
    # exact beats canonical beats near (docs 0,1 are byte-identical AND
    # canonical-identical AND same near cluster -> exact)
    assert got[0] == ("exact", 0, True)
    assert got[1] == ("exact", 0, False)
    assert got[2][0] == "canonical" and got[2][1] == 0
    assert got[3][0] == "near" and not got[3][2]
    assert got[4] == ("unique", 4, True)
    assert got[5] == ("exact", 5, True) and got[6] == ("exact", 5, False)


def test_dedup_tiers_reuses_precomputed_clusters(spark):
    docs = _fixture(spark)
    cfg = PipelineConfig(sketch=SketchParams(k=21, s=256, seed=42),
                         jaccard_threshold=0.7)
    res = dedup_pipeline(docs, cfg)
    a = {tuple(r) for r in dedup_tiers(docs, clusters=res.clusters).collect()}
    b = {tuple(r) for r in dedup_tiers(docs, config=cfg).collect()}
    assert a == b
    res.release()


def test_dedup_tiers_removable_set_is_consistent(spark):
    """Dropping non-reps at every tier keeps exactly one doc per
    strictest-tier group."""
    docs = _fixture(spark)
    cfg = PipelineConfig(sketch=SketchParams(k=21, s=256, seed=42),
                         jaccard_threshold=0.7)
    tiers = dedup_tiers(docs, config=cfg)
    kept = tiers.filter(F.col("is_rep")).count()
    dropped = tiers.filter(~F.col("is_rep")).count()
    assert kept + dropped == 7
    # reps are self-representing and every rep_id is a kept doc
    reps = {r["rep_id"] for r in tiers.collect()}
    kept_ids = {r["doc_id"] for r in tiers.filter(F.col("is_rep")).collect()}
    assert reps <= kept_ids
