"""spark-submit entry point for the near-duplicate pipeline (north rule:
"the whole job ships via spark-submit --py-files on a multi-executor
cluster").

    spark-submit --py-files dist/mashspark.zip tools/submit_dedup.py \
        <input_parquet> <output_dir> [--k K] [--s S] [--threshold T] \
        [--id-col doc_id] [--text-col text]

The script only uses the SparkSession handed to it by spark-submit (no
master/memory settings here — those belong to the cluster submit line),
so the same file runs unchanged on local[N], YARN, or k8s. Outputs under
<output_dir>: clusters/ (doc_id, cluster_id), pairs/ (verified dup pairs
+ distances, TSV via mashspark.io.write_dist_tsv), metrics.json (LSH skew
counters + sketch metrics — the per-snapshot lineage the north rule
names).
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input_parquet")
    ap.add_argument("output_dir")
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--s", type=int, default=1000)
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from mashspark.io import sketch_metrics, write_dist_tsv
    from mashspark.params import PipelineConfig, SketchParams
    from mashspark.pipeline import dedup_pipeline

    spark = SparkSession.builder.appName("mashspark-dedup").getOrCreate()
    docs = spark.read.parquet(args.input_parquet)
    if args.id_col != "doc_id":
        docs = docs.withColumnRenamed(args.id_col, "doc_id")
    if args.text_col != "text":
        docs = docs.withColumnRenamed(args.text_col, "text")

    cfg = PipelineConfig(
        sketch=SketchParams(k=args.k, s=args.s),
        jaccard_threshold=args.threshold,
    )
    res = dedup_pipeline(docs, cfg)
    res.clusters.write.mode("overwrite").parquet(
        os.path.join(args.output_dir, "clusters"))
    write_dist_tsv(res.pairs, os.path.join(args.output_dir, "pairs"))
    metrics = {
        "lsh": res.lsh_metrics.collect()[0].asDict(),
        "sketches": sketch_metrics(res.sketches),
        "params": cfg.sketch.to_dict(),
        "jaccard_threshold": cfg.jaccard_threshold,
    }
    # write the manifest THROUGH Spark (single-row json), not a driver-
    # local open(): output_dir may be HDFS/S3 on a real cluster, where a
    # plain open() fails or writes to an unrelated local path
    spark.createDataFrame([(json.dumps(metrics),)], "metrics string") \
        .coalesce(1).write.mode("overwrite").text(
            os.path.join(args.output_dir, "metrics.json"))
    print(json.dumps({"n_docs": res.clusters.count(),
                      "n_pairs": res.pairs.count()}))
    spark.stop()


if __name__ == "__main__":
    main()
