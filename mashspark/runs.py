"""Snapshot-committed pipeline runs: the dedup pipeline driven through
the Iceberg-style snapshot log (north rule: "per-partition lineage +
sketch-count metrics written alongside each Iceberg snapshot",
"checkpoint-based resume so a killed job restarts from the last
committed partition").

Two snapshot tables live under the run root:

* ``<root>/sketches`` — the sketch stage's output, committed as ONE
  snapshot per (params, input-tag) run. The bucket work underneath runs
  through ``io.run_checkpointed``, so a job killed mid-sketch resumes
  at the last committed BUCKET; the snapshot's summary embeds the full
  per-bucket manifest (lineage, row count, sketch-count metrics, wall
  time per bucket) — the "metrics alongside each snapshot" contract.
* ``<root>/clusters`` — exact collapse -> LSH -> Mash-exact verify ->
  connected components over the committed sketch snapshot, committed
  with the sketch version it consumed plus the LSH skew metrics and
  cluster counts in its summary.

Resume is three-tiered: a killed job restarts (1) at the last committed
sketch bucket, (2) past sketching entirely if the sketch snapshot for
this run already committed, (3) as a pure no-op if the clusters
snapshot for that sketch version already committed. Each crawl
(``input_tag``) commits fresh snapshot versions; prior crawls stay
readable via time travel until expired.

On a real cluster the snapshot layer maps 1:1 onto Iceberg commits
(``df.writeTo(...).overwritePartitions()`` + snapshot summary
properties) and the bucket store onto partitioned writes — see
``snapshots.py`` / ``io.py`` module docs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from . import io as mio
from . import snapshots as snap
from .params import PipelineConfig
from .pipeline import dedup_from_sketches
from .sketch import sketch_documents


@dataclass
class SnapshotRun:
    sketch_version: int   # version committed (or reused) in <root>/sketches
    cluster_version: int  # version committed (or reused) in <root>/clusters
    clusters: DataFrame   # doc_id, cluster_id at cluster_version
    resumed_sketches: bool  # True if the sketch snapshot was reused
    resumed_clusters: bool  # True if the clusters snapshot was reused


def _run_fingerprint(config: PipelineConfig, input_tag: str) -> str:
    return f"{mio.params_fingerprint(config.sketch)}|tag={input_tag}"


def _reusable_version(table: str, fingerprint: str) -> int | None:
    cur = snap.current_version(table)
    if cur is None:
        return None
    s = snap.snapshot(table, cur)
    if s["summary"].get("run_fingerprint") == fingerprint:
        return cur
    return None


def dedup_snapshot_run(spark: SparkSession, docs: DataFrame,
                       config: PipelineConfig | None, root: str,
                       input_tag: str = "", n_buckets: int = 16,
                       id_col: str = "doc_id", text_col: str = "text",
                       ) -> SnapshotRun:
    """Run the dedup pipeline with snapshot-committed stage outputs and
    three-tier resume (bucket -> stage -> run). ``input_tag`` names the
    input state (e.g. a crawl id): re-running with the SAME tag and
    params resumes/reuses; a new tag commits new snapshot versions on
    both tables, with time travel back to prior crawls."""
    config = config or PipelineConfig()
    fp = _run_fingerprint(config, input_tag)
    sk_table = os.path.join(root, "sketches")
    cl_table = os.path.join(root, "clusters")

    sk_version = _reusable_version(sk_table, fp)
    resumed_sk = sk_version is not None
    if sk_version is None:
        # bucket-resumable sketch stage; the work dir is per-run so a
        # new crawl never anti-joins against a stale manifest. Stable
        # digest, NOT hash(): str hashing is randomized per process and
        # a restarted job must find the SAME work dir to resume buckets
        import hashlib

        work = os.path.join(root, "_sketch_work",
                            hashlib.md5(fp.encode()).hexdigest()[:16])
        sk = mio.run_checkpointed(
            spark, docs, work,
            lambda part: sketch_documents(
                part, config.sketch, config.lsh,
                id_col=id_col, text_col=text_col),
            n_buckets=n_buckets,
            params_fingerprint=fp,
            id_col=id_col,
            metrics_fn=mio.sketch_metrics,
        )
        # per-partition lineage + metrics ride the snapshot summary
        partitions = {
            str(b): {k: e[k] for k in
                     ("n_rows", "input", "wall_sec", "committed_at",
                      "metrics") if k in e}
            for b, e in mio.committed_buckets(work).items()
        }
        sk_version = snap.commit_overwrite(
            spark, sk, sk_table,
            summary={
                "stage": "sketch",
                "run_fingerprint": fp,
                "n_buckets": n_buckets,
                "partitions": partitions,
            })
        # the bucket-parquet work dir only serves bucket-level resume
        # BEFORE the stage snapshot exists; once the sketch table is
        # committed, keeping it pins a full copy of the sketch output
        # per (params, tag) fingerprint indefinitely (ADVICE r5)
        import shutil

        shutil.rmtree(work, ignore_errors=True)
    sketches = snap.read_table(spark, sk_table, version=sk_version)

    cl_version = None
    ccur = snap.current_version(cl_table)
    if ccur is not None:
        s = snap.snapshot(cl_table, ccur)
        if (s["summary"].get("run_fingerprint") == fp
                and s["summary"].get("sketch_version") == sk_version):
            cl_version = ccur
    resumed_cl = cl_version is not None
    if cl_version is None:
        res = dedup_from_sketches(sketches, config)
        lsh_row = res.lsh_metrics.collect()[0].asDict()
        clusters = res.clusters.localCheckpoint(eager=True)
        n_docs = clusters.count()
        n_clusters = clusters.select("cluster_id").distinct().count()
        cl_version = snap.commit_overwrite(
            spark, clusters, cl_table,
            summary={
                "stage": "clusters",
                "run_fingerprint": fp,
                "sketch_version": sk_version,
                "n_docs": n_docs,
                "n_clusters": n_clusters,
                "lsh_metrics": lsh_row,
            })
        res.release()
    return SnapshotRun(
        sketch_version=sk_version,
        cluster_version=cl_version,
        clusters=snap.read_table(spark, cl_table, version=cl_version),
        resumed_sketches=resumed_sk,
        resumed_clusters=resumed_cl,
    )
