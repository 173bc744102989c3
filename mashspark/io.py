"""Checkpointed, resumable table writes with per-partition lineage +
metrics — custom physical strategy #4 (SURVEY.md §4; north rule:
"checkpoint-based resume so a killed job restarts from the last committed
partition", "per-partition lineage + sketch-count metrics written
alongside each snapshot").

No Iceberg runtime is baked into this sandbox, so the snapshot layer is
implemented directly over Parquet with the same commit discipline Iceberg
gives us in production (atomic per-partition commits + a manifest):

* the unit of work is a **partition range** of the stable input key
  (``doc_id`` bucket = ``pmod(xxhash64(doc_id), n_buckets)``);
* each bucket is processed and written independently to
  ``<table>/bucket=<i>/`` (parquet, overwrite-by-partition semantics);
* after a bucket's files are durably written, a manifest entry
  ``<table>/_manifest/bucket-<i>.json`` is committed (rename-free single
  small file = atomic enough on POSIX/S3-with-put) recording lineage
  (input path, params hash, row count, sketch-count metrics, wall time);
* resume = read the manifest dir, anti-join completed buckets, process
  only the remainder. Kill the job at any point and restart: committed
  buckets are never recomputed (idempotent — bucket content is a pure
  function of input split + params).

On a real cluster swap the write for ``df.writeTo(...).overwritePartitions()``
(Iceberg) and keep the same manifest/metrics discipline via snapshot
summary properties.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_dir(table_path: str) -> str:
    return os.path.join(table_path, "_manifest")


def committed_buckets(table_path: str) -> dict[int, dict]:
    """bucket -> manifest entry for all committed buckets."""
    md = _manifest_dir(table_path)
    out = {}
    if os.path.isdir(md):
        for f in os.listdir(md):
            if f.startswith("bucket-") and f.endswith(".json"):
                with open(os.path.join(md, f)) as fh:
                    e = json.load(fh)
                out[int(e["bucket"])] = e
    return out


def run_checkpointed(
    spark: SparkSession,
    docs: DataFrame,
    table_path: str,
    transform,
    n_buckets: int = 16,
    params_fingerprint: str = "",
    id_col: str = "doc_id",
    metrics_fn=None,
) -> DataFrame:
    """Process ``docs`` bucket-by-bucket through ``transform(bucket_df)``,
    committing each bucket with lineage + metrics; skip buckets already
    committed with the same params fingerprint. Returns the full output
    table (read back from parquet).

    transform: DataFrame -> DataFrame (e.g. the sketch stage).
    metrics_fn: optional DataFrame -> dict of extra per-bucket metrics.
    """
    os.makedirs(_manifest_dir(table_path), exist_ok=True)
    done = committed_buckets(table_path)

    bucket_col = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")
    docs_b = docs.withColumn("_bucket", bucket_col)

    for b in range(n_buckets):
        prev = done.get(b)
        if prev is not None and prev.get("params_fingerprint") == params_fingerprint:
            continue
        t0 = time.time()
        part = docs_b.filter(F.col("_bucket") == b).drop("_bucket")
        out = transform(part)
        bucket_path = os.path.join(table_path, f"bucket={b}")
        out.write.mode("overwrite").parquet(bucket_path)
        written = spark.read.parquet(bucket_path)
        n_rows = written.count()
        entry = {
            "bucket": b,
            "n_rows": n_rows,
            "params_fingerprint": params_fingerprint,
            "input": ", ".join(
                str(p) for p in docs.inputFiles()[:8]
            ) or "<in-memory>",
            "wall_sec": round(time.time() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        if metrics_fn is not None:
            entry["metrics"] = metrics_fn(written)
        tmp = os.path.join(_manifest_dir(table_path), f".bucket-{b}.json.tmp")
        final = os.path.join(_manifest_dir(table_path), f"bucket-{b}.json")
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        os.replace(tmp, final)  # atomic commit of the bucket

    return spark.read.parquet(os.path.join(table_path, "bucket=*"))


def sketch_metrics(sketches: DataFrame) -> dict:
    """Per-partition sketch-count metrics for the manifest (north rule)."""
    row = sketches.agg(
        F.count("*").alias("n_docs"),
        (F.sum(F.length("sketch")) / 8).cast("long").alias("n_sketch_hashes"),
        F.sum((F.length("sketch") == 0).cast("long")).alias("n_empty"),
    ).collect()[0]
    return {
        "n_docs": row["n_docs"],
        "n_sketch_hashes": int(row["n_sketch_hashes"] or 0),
        "n_empty_sketches": int(row["n_empty"] or 0),
    }
