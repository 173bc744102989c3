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


def params_fingerprint(params) -> str:
    """Canonical manifest fingerprint of a SketchParams (stable key order)."""
    return json.dumps(params.to_dict(), sort_keys=True)


def read_sketches(spark: SparkSession, table_path: str, params=None,
                  expected_fingerprint: str | None = None) -> DataFrame:
    """Sketch-table scan (S4) with params-sidecar enforcement on load.

    The reference refuses to use sketch files whose k/seed/alphabet don't
    match the run's parameters (``Sketch.cpp:133-160``); here every
    committed bucket's manifest carries the ``params_fingerprint`` it was
    built with, and loading with a different expectation raises instead
    of silently comparing incompatible sketches. Pass ``params`` (a
    SketchParams — fingerprinted canonically) or a raw
    ``expected_fingerprint`` string; with neither, the table must at
    least be self-consistent (all buckets share one fingerprint).
    """
    ents = committed_buckets(table_path)
    if not ents:
        raise FileNotFoundError(f"no committed buckets under {table_path}")
    fps = {e.get("params_fingerprint") for e in ents.values()}
    if len(fps) > 1:
        raise ValueError(
            f"sketch table {table_path} mixes params fingerprints: {sorted(fps)}"
        )
    have = fps.pop()
    want = expected_fingerprint
    if want is None and params is not None:
        want = params_fingerprint(params)
    if want is not None and have != want:
        raise ValueError(
            f"sketch table {table_path} was built with params {have!r}, "
            f"expected {want!r} (mismatched sketch files are refused at "
            "load, as in the reference)"
        )
    # Scan ONLY the committed buckets' explicit paths — never bucket=*:
    # a job killed between out.write (which overwrote bucket=i with
    # new-params rows) and the manifest commit leaves an on-disk bucket
    # whose manifest entry still shows the old fingerprint; a glob scan
    # would pass the check above yet return mixed-params rows. Uncommitted
    # bucket dirs are data-loss-free to ignore (resume recomputes them),
    # but silently reading them is exactly the mismatched-sketch
    # comparison this loader exists to refuse.
    paths = [os.path.join(table_path, f"bucket={b}") for b in sorted(ents)]
    missing = [p for p in paths if not os.path.isdir(p)]
    if missing:
        raise ValueError(
            f"sketch table {table_path} manifest names buckets with no "
            f"data directory: {missing} (corrupt table)"
        )
    return spark.read.parquet(*paths)


def write_dist_tsv(pairs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """TSV result sink (S6): one line per verified pair in the reference's
    ``mash dist`` / ``triangle -E`` edge format —
    ``ref \\t query \\t distance \\t p-value \\t common/denom``
    (``CommandDistance.cpp:286-298``, ``CommandTriangle.cpp:178``).
    Distributed write (one part file per partition); pairs without a
    p_value column get an empty field, as the filter columns are optional.
    """
    cols = set(pairs.columns)
    pv = F.col("p_value").cast("string") if "p_value" in cols else F.lit("")
    out = pairs.select(
        F.col("id_a").cast("string"),
        F.col("id_b").cast("string"),
        F.col("mash_dist").cast("string"),
        pv,
        F.concat_ws("/", F.col("common").cast("string"), F.col("denom").cast("string")),
    )
    out.write.mode(mode).option("sep", "\t").csv(path)


def phylip_triangle(pairs: DataFrame, ids: list | None = None,
                    default_dist: float = 1.0) -> str:
    """Lower-triangular Phylip matrix sink (S8,
    ``CommandTriangle.cpp:125-126,159-198``): first line ``\\t<count>``,
    then row i = name + tab-separated distances to refs 0..i-1.

    Driver-side pivot by design: triangle output is O(n^2) TEXT, a
    final small-N artifact the reference prints to stdout; at corpus scale
    the edge-list sink (``write_dist_tsv``) is the output format. ``ids``
    defaults to the sorted union of pair endpoints; pairs absent from
    ``pairs`` (e.g. filtered) render ``default_dist`` like the reference's
    maximal distance for no-overlap pairs."""
    rows = pairs.select("id_a", "id_b", "mash_dist").collect()
    dist = {}
    for r in rows:
        a, b = r["id_a"], r["id_b"]
        dist[(min(a, b), max(a, b))] = r["mash_dist"]
    if ids is None:
        ids = sorted({x for ab in dist for x in ab})
    lines = [f"\t{len(ids)}"]
    for i, name in enumerate(ids):
        cells = [str(name)]
        for j in range(i):
            key = (min(name, ids[j]), max(name, ids[j]))
            cells.append(repr(dist.get(key, default_dist)))
        lines.append("\t".join(cells))
    return "\n".join(lines) + "\n"


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
