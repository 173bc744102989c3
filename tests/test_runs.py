"""Snapshot-committed pipeline runs (mashspark.runs): three-tier
resume (bucket -> stage -> run), per-partition lineage in snapshot
summaries, and time travel across crawls."""

import pytest
from pyspark.sql import functions as F

from mashspark import io as mio
from mashspark import runs
from mashspark import snapshots as snap
from mashspark.params import LSHParams, PipelineConfig, SketchParams
from mashspark.webtext import webtext_spark_df

CFG = PipelineConfig(
    sketch=SketchParams(k=21, s=256, seed=42),
    lsh=LSHParams(bands=32, prefix=64),
    jaccard_threshold=0.7,
)


def _docs(spark, n=40, seed=1):
    return webtext_spark_df(spark, n_base=n, seed=seed).select(
        "doc_id", "text")


def test_run_commits_both_tables_with_lineage(spark, tmp_path):
    root = str(tmp_path / "run")
    d = _docs(spark)
    r = runs.dedup_snapshot_run(spark, d, CFG, root, input_tag="crawl1",
                                n_buckets=4)
    assert (r.sketch_version, r.cluster_version) == (1, 1)
    assert not r.resumed_sketches and not r.resumed_clusters
    n = d.count()
    assert r.clusters.count() == n
    # per-partition lineage + sketch metrics ride the sketch summary
    s = snap.snapshot(f"{root}/sketches", 1)["summary"]
    parts = s["partitions"]
    assert len(parts) == 4
    assert sum(p["n_rows"] for p in parts.values()) == n
    assert all("metrics" in p and "wall_sec" in p for p in parts.values())
    c = snap.snapshot(f"{root}/clusters", 1)["summary"]
    assert c["sketch_version"] == 1 and c["n_docs"] == n
    assert "n_dropped_buckets" in c["lsh_metrics"]


def test_rerun_same_tag_is_pure_noop(spark, tmp_path):
    root = str(tmp_path / "run")
    d = _docs(spark)
    runs.dedup_snapshot_run(spark, d, CFG, root, input_tag="c1",
                            n_buckets=4)
    r2 = runs.dedup_snapshot_run(spark, d, CFG, root, input_tag="c1",
                                 n_buckets=4)
    assert r2.resumed_sketches and r2.resumed_clusters
    assert (r2.sketch_version, r2.cluster_version) == (1, 1)
    assert len(snap.snapshots(f"{root}/sketches")) == 1


def test_killed_sketch_stage_resumes_at_last_committed_bucket(
        spark, tmp_path, monkeypatch):
    """Kill the job mid-sketch (transform raises on the third bucket);
    the restart must recompute ONLY the uncommitted buckets and the
    final table must equal a clean single-shot run."""
    root = str(tmp_path / "run")
    d = _docs(spark)
    calls = {"n": 0}
    real = runs.sketch_documents

    def dying(part, *a, **kw):
        calls["n"] += 1
        if calls["n"] >= 3:
            raise RuntimeError("simulated executor loss")
        return real(part, *a, **kw)

    monkeypatch.setattr(runs, "sketch_documents", dying)
    with pytest.raises(RuntimeError, match="simulated"):
        runs.dedup_snapshot_run(spark, d, CFG, root, input_tag="c1",
                                n_buckets=4)
    # two buckets committed before the kill; no snapshot yet
    work_dirs = list((tmp_path / "run" / "_sketch_work").iterdir())
    assert len(work_dirs) == 1
    committed = mio.committed_buckets(str(work_dirs[0]))
    assert len(committed) == 2
    assert snap.current_version(f"{root}/sketches") is None

    monkeypatch.setattr(runs, "sketch_documents", real)
    calls2 = {"n": 0}

    def counting(part, *a, **kw):
        calls2["n"] += 1
        return real(part, *a, **kw)

    monkeypatch.setattr(runs, "sketch_documents", counting)
    r = runs.dedup_snapshot_run(spark, d, CFG, root, input_tag="c1",
                                n_buckets=4)
    assert calls2["n"] == 2, "restart must skip the 2 committed buckets"
    assert r.sketch_version == 1 and not r.resumed_sketches
    # equivalence with a clean run
    clean_root = str(tmp_path / "clean")
    monkeypatch.setattr(runs, "sketch_documents", real)
    rc = runs.dedup_snapshot_run(spark, d, CFG, clean_root,
                                 input_tag="c1", n_buckets=4)
    a = {(x["doc_id"], x["cluster_id"]) for x in r.clusters.collect()}
    b = {(x["doc_id"], x["cluster_id"]) for x in rc.clusters.collect()}
    assert a == b


def test_kill_between_stages_resumes_past_sketching(spark, tmp_path,
                                                    monkeypatch):
    """A job killed AFTER the sketch snapshot committed but before
    clustering must restart directly into clustering — zero sketch-UDF
    calls on the resume path."""
    root = str(tmp_path / "run")
    d = _docs(spark)
    real_cluster = runs.dedup_from_sketches

    def dying(*a, **kw):
        raise RuntimeError("killed before clustering")

    monkeypatch.setattr(runs, "dedup_from_sketches", dying)
    with pytest.raises(RuntimeError, match="killed"):
        runs.dedup_snapshot_run(spark, d, CFG, root, input_tag="c1",
                                n_buckets=4)
    assert snap.current_version(f"{root}/sketches") == 1
    assert snap.current_version(f"{root}/clusters") is None

    monkeypatch.setattr(runs, "dedup_from_sketches", real_cluster)
    calls = {"n": 0}

    def no_sketching(part, *a, **kw):
        calls["n"] += 1
        raise AssertionError("sketch stage must not run on resume")

    monkeypatch.setattr(runs, "sketch_documents", no_sketching)
    r = runs.dedup_snapshot_run(spark, d, CFG, root, input_tag="c1",
                                n_buckets=4)
    assert calls["n"] == 0
    assert r.resumed_sketches and not r.resumed_clusters
    assert r.clusters.count() == d.count()


def test_new_crawl_commits_new_versions_with_time_travel(spark, tmp_path):
    root = str(tmp_path / "run")
    d1 = _docs(spark, n=30, seed=1)
    d2 = d1.unionByName(_docs(spark, n=30, seed=2).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000))
    r1 = runs.dedup_snapshot_run(spark, d1, CFG, root, input_tag="c1",
                                 n_buckets=4)
    r2 = runs.dedup_snapshot_run(spark, d2, CFG, root, input_tag="c2",
                                 n_buckets=4)
    assert (r1.cluster_version, r2.cluster_version) == (1, 2)
    assert not r2.resumed_sketches
    # CURRENT is crawl 2; crawl 1 stays readable via time travel
    assert snap.read_table(
        spark, f"{root}/clusters").count() == d2.count()
    assert snap.read_table(
        spark, f"{root}/clusters", version=1).count() == d1.count()
    s2 = snap.snapshot(f"{root}/clusters", 2)["summary"]
    assert s2["sketch_version"] == 2
