"""Checkpoint/resume (io.py): kill-and-restart semantics — committed
buckets are never recomputed, resumed output equals single-shot output,
and manifests carry lineage + sketch metrics (north rule)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from mashspark import io as mio
from mashspark.params import LSHParams, SketchParams
from mashspark.sketch import sketch_documents
from mashspark.webtext import webtext_spark_df

PARAMS = SketchParams(k=21, s=128)
LSH = LSHParams(bands=32)
FP = "k=21,s=128,seed=42,bands=32"


def _transform(df):
    return sketch_documents(df, PARAMS, LSH).drop("band_key")


@pytest.fixture(scope="module")
def docs(spark):
    return webtext_spark_df(spark, n_base=20, seed=7).select("doc_id", "text")


def test_checkpoint_resume(spark, docs, tmp_path_factory):
    table = str(tmp_path_factory.mktemp("ck") / "sketches")

    calls = {"n": 0}

    def counting_transform(df):
        calls["n"] += 1
        return _transform(df)

    out1 = mio.run_checkpointed(
        spark, docs, table, counting_transform, n_buckets=4,
        params_fingerprint=FP, metrics_fn=mio.sketch_metrics,
    )
    n1 = out1.count()
    assert calls["n"] == 4
    assert n1 == docs.count()

    # simulate a crash after 2 buckets: delete 2 manifests + their data
    done = mio.committed_buckets(table)
    assert set(done) == {0, 1, 2, 3}
    for b in (2, 3):
        os.remove(os.path.join(table, "_manifest", f"bucket-{b}.json"))

    calls["n"] = 0
    out2 = mio.run_checkpointed(
        spark, docs, table, counting_transform, n_buckets=4,
        params_fingerprint=FP, metrics_fn=mio.sketch_metrics,
    )
    assert calls["n"] == 2  # only the uncommitted buckets re-ran
    assert out2.count() == n1

    # param change invalidates all buckets
    calls["n"] = 0
    mio.run_checkpointed(
        spark, docs, table, counting_transform, n_buckets=4,
        params_fingerprint=FP + ";v2", metrics_fn=mio.sketch_metrics,
    )
    assert calls["n"] == 4


def test_manifest_lineage_and_metrics(spark, docs, tmp_path_factory):
    table = str(tmp_path_factory.mktemp("ck2") / "sketches")
    out = mio.run_checkpointed(
        spark, docs, table, _transform, n_buckets=2,
        params_fingerprint=FP, metrics_fn=mio.sketch_metrics,
    )
    total = out.count()
    entries = mio.committed_buckets(table)
    assert set(entries) == {0, 1}
    n_from_manifest = sum(e["n_rows"] for e in entries.values())
    assert n_from_manifest == total
    for e in entries.values():
        assert e["params_fingerprint"] == FP
        assert e["metrics"]["n_docs"] == e["n_rows"]
        assert e["metrics"]["n_sketch_hashes"] > 0
        assert "committed_at" in e and "wall_sec" in e


def test_resumed_equals_single_shot(spark, docs, tmp_path_factory):
    t1 = str(tmp_path_factory.mktemp("ck3") / "a")
    t2 = str(tmp_path_factory.mktemp("ck3") / "b")
    full = mio.run_checkpointed(spark, docs, t1, _transform, n_buckets=3,
                                params_fingerprint=FP)
    # interrupted run: first do only bucket 0 (by pre-committing others,
    # then removing them) — simpler: run all, drop one, re-run
    mio.run_checkpointed(spark, docs, t2, _transform, n_buckets=3,
                         params_fingerprint=FP)
    os.remove(os.path.join(t2, "_manifest", "bucket-1.json"))
    resumed = mio.run_checkpointed(spark, docs, t2, _transform, n_buckets=3,
                                   params_fingerprint=FP)
    a = {(r.doc_id, bytes(r.sketch)) for r in full.collect()}
    b = {(r.doc_id, bytes(r.sketch)) for r in resumed.collect()}
    assert a == b


def test_read_sketches_enforces_params_on_load(spark, docs, tmp_path_factory):
    """S4: loading a sketch table under different params raises, like the
    reference refusing mismatched sketch files (Sketch.cpp:133-160)."""
    table = str(tmp_path_factory.mktemp("s4") / "sketches")
    fp = mio.params_fingerprint(PARAMS)
    mio.run_checkpointed(
        spark, docs, table, _transform, n_buckets=2,
        params_fingerprint=fp, metrics_fn=mio.sketch_metrics,
    )
    # matching params: loads, same rows as the write
    loaded = mio.read_sketches(spark, table, params=PARAMS)
    assert loaded.count() == docs.count()
    # mismatched k: refused at load
    with pytest.raises(ValueError, match="built with params"):
        mio.read_sketches(spark, table, params=SketchParams(k=12, s=128))
    # self-consistency only (no expectation): loads
    assert mio.read_sketches(spark, table).count() == docs.count()
    # empty/missing table: explicit error
    with pytest.raises(FileNotFoundError):
        mio.read_sketches(spark, str(tmp_path_factory.mktemp("s4") / "nope"))


def test_spark_submit_pyfiles_end_to_end(docs, tmp_path_factory):
    """North rule: the job ships via spark-submit --py-files. Build
    dist/mashspark.zip, run tools/submit_dedup.py from a cwd OUTSIDE the
    repo (so only the zip provides the package), check outputs."""
    import subprocess
    import sys
    import json as _json

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import package_pyfiles

    tmp = tmp_path_factory.mktemp("submit")
    zip_path = package_pyfiles.build(str(tmp / "mashspark.zip"))
    in_path = str(tmp / "docs.parquet")
    docs.write.parquet(in_path)
    out_dir = str(tmp / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(repo, "tools", "submit_dedup.py"),
         in_path, out_dir, "--s", "128"],
        capture_output=True, text=True, timeout=1800, cwd=str(tmp), env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    stats = _json.loads(line)
    assert stats["n_docs"] == docs.count()
    # metrics.json is written THROUGH Spark (honors HDFS/S3 output dirs on
    # real clusters), so locally it is a directory with one part file
    mdir = os.path.join(out_dir, "metrics.json")
    assert os.path.isdir(mdir)
    part = [f for f in os.listdir(mdir) if f.startswith("part-")][0]
    with open(os.path.join(mdir, part)) as fh:
        m = _json.loads(fh.read())
    assert m["sketches"]["n_docs"] == docs.count()
    assert any(f.startswith("part-") for f in os.listdir(os.path.join(out_dir, "clusters")))
