"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the two-level
scaling protocol (BASELINE.md): the identical sketch->LSH->verify->CC job
on the same deterministic synthetic-webtext input at local[N] and
local[4N], reporting docs/sec at both and efficiency (T_N/T_4N)/4.

Prints ONE JSON line (the last line of stdout):
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ...,
   "throughput": {...}, "scaling": {...}}

Internal mode (spawned per parallelism level so each level gets a fresh
JVM): ``python bench.py --scale-run <cores> <webtext_parquet>``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BASE = int(os.environ.get("SPARK_GRAFT_BENCH_BASES", "200000"))
MIN_WORDS = int(os.environ.get("SPARK_GRAFT_BENCH_MIN_WORDS", "100"))
MAX_WORDS = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_WORDS", "600"))
# fraction of bases with near-dup variants: real web corpora are dup-sparse
# (verify traffic scales with pair count, so this is a realism AND cost knob)
DUP_PROB = float(os.environ.get("SPARK_GRAFT_BENCH_DUP_PROB", "0.3"))
# N -> 4N scaling pair. Default N=2 (local[2] vs local[8]): this sandbox
# VM delivers linear CPU only up to ~8 busy vCPUs (measured: aggregate
# numpy throughput 1/8/16/32 procs = 0.32/2.5/4.4/6.2 G ops/s, i.e. 8->32
# is capped at 2.45x by the HOST, not by Spark) — see BENCH/BASELINE.md.
# On real hardware with >=32 dedicated cores set SPARK_GRAFT_SCALE_LOW=8.
SCALE_LOW = int(os.environ.get("SPARK_GRAFT_SCALE_LOW", "2"))
WEBTEXT_PATH = os.environ.get(
    "SPARK_GRAFT_BENCH_WEBTEXT", f"/tmp/mashspark_bench_webtext_{N_BASE}"
)


def _config():
    from mashspark.params import LSHParams, PipelineConfig, SketchParams

    return PipelineConfig(
        sketch=SketchParams(k=21, s=1000, seed=42),
        jaccard_threshold=0.7,
    )


def _run_pipeline(spark, docs):
    """The timed job: full dedup pipeline, materialized to cluster counts."""
    from pyspark.sql import functions as F

    from mashspark.pipeline import dedup_pipeline

    res = dedup_pipeline(docs, _config())
    n_docs = res.clusters.count()
    n_clusters = res.clusters.agg(F.countDistinct("cluster_id")).collect()[0][0]
    n_pairs = res.pairs.count()
    res.sketches.unpersist()
    return n_docs, n_clusters, n_pairs


def ensure_webtext(spark, path: str = WEBTEXT_PATH, n_base: int = N_BASE):
    from mashspark.webtext import webtext_spark_distributed

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = webtext_spark_distributed(
            spark, n_base=n_base, num_partitions=CPUS * 4,
            min_words=MIN_WORDS, max_words=MAX_WORDS, dup_prob=DUP_PROB,
        )
        df.select("doc_id", "url", "text", "lang").write.mode("overwrite").parquet(path)
    return path


def scale_run(cores: int, path: str):
    """One measured pipeline run at local[cores]; prints one JSON line."""
    from mashspark.session import get_spark

    os.environ.setdefault("MASHSPARK_DRIVER_MEM", "48g")
    spark = get_spark(cores=cores, shuffle_partitions=cores * 2,
                      app_name=f"bench-scale-{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(path)
    docs.count()  # warm FS cache / file listing outside the timed window
    t0 = time.time()
    n_docs, n_clusters, n_pairs = _run_pipeline(spark, docs)
    wall = time.time() - t0
    print(json.dumps({"cores": cores, "wall_sec": round(wall, 2), "n_docs": n_docs,
                      "n_clusters": n_clusters, "n_pairs": n_pairs,
                      "docs_per_sec": round(n_docs / wall, 1)}))
    spark.stop()


def main():
    from pyspark.sql import functions as F

    from mashspark.session import get_spark

    queries: dict[str, float] = {}
    extra: dict = {}

    os.environ.setdefault("MASHSPARK_DRIVER_MEM", "48g")
    spark = get_spark(cores=CPUS, shuffle_partitions=CPUS * 2, app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # -- generate / locate the deterministic webtext corpus (not timed)
    ensure_webtext(spark)

    # -- q1: sketch throughput on sf documents
    docs_sf = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_sf = docs_sf.count()
    from mashspark.params import LSHParams, SketchParams
    from mashspark.sketch import sketch_documents

    t0 = time.time()
    sk = sketch_documents(docs_sf, SketchParams(), LSHParams())
    sk.select((F.sum(F.length("sketch")) / 8).cast("long")).collect()
    queries["q1_sketch_sf_docs"] = round(time.time() - t0, 2)

    # -- q2: full dedup pipeline on sf documents
    t0 = time.time()
    n_docs, n_clusters, n_pairs = _run_pipeline(spark, docs_sf)
    queries["q2_dedup_sf_docs"] = round(time.time() - t0, 2)
    extra["sf_docs"] = {"n_docs": n_docs, "n_clusters": n_clusters, "n_pairs": n_pairs}

    # -- q3: full dedup pipeline on synthetic webtext at full parallelism
    web = spark.read.parquet(WEBTEXT_PATH)
    t0 = time.time()
    n_docs_w, n_clusters_w, n_pairs_w = _run_pipeline(spark, web)
    queries["q3_dedup_webtext"] = round(time.time() - t0, 2)
    extra["webtext"] = {
        "n_docs": n_docs_w, "n_clusters": n_clusters_w, "n_pairs": n_pairs_w,
    }

    # -- q4: simhash dedup on webtext
    from mashspark.simhash import simhash_documents, simhash_dup_pairs

    t0 = time.time()
    sigs = simhash_documents(web, k=8)
    simhash_dup_pairs(sigs, max_hamming=3).count()
    queries["q4_simhash_webtext"] = round(time.time() - t0, 2)

    # -- q5: containment screen of 20 refs against sf documents
    from mashspark.screen import screen as screen_op

    t0 = time.time()
    refs = docs_sf.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(20)
    refs_sk = sketch_documents(refs, SketchParams(), LSHParams())
    screen_op(refs_sk, docs_sf, SketchParams()).count()
    queries["q5_screen_sf_docs"] = round(time.time() - t0, 2)

    spark.stop()

    # -- scaling: same job, fresh JVM per level
    scaling = {}
    for cores in (SCALE_LOW, SCALE_LOW * 4):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scale-run", str(cores), WEBTEXT_PATH],
            capture_output=True, text=True, timeout=3000,
            cwd=REPO,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        scaling[f"local[{cores}]"] = json.loads(line)
        queries[f"q6_scale_{cores}c"] = scaling[f"local[{cores}]"]["wall_sec"]
    t_low = scaling[f"local[{SCALE_LOW}]"]["wall_sec"]
    t_high = scaling[f"local[{SCALE_LOW*4}]"]["wall_sec"]
    eff = (t_low / t_high) / 4.0
    extra["scaling"] = {
        "low_cores": SCALE_LOW, "high_cores": SCALE_LOW * 4,
        "t_low_sec": t_low, "t_high_sec": t_high,
        "docs_per_sec_low": scaling[f"local[{SCALE_LOW}]"]["docs_per_sec"],
        "docs_per_sec_high": scaling[f"local[{SCALE_LOW*4}]"]["docs_per_sec"],
        "efficiency": round(eff, 3),
        "gate": 0.8,
    }

    total = round(sum(queries.values()), 2)
    result = {
        "metric": "mashspark_dedup_bench_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "throughput": {
            "webtext_docs_per_sec_full": round(
                extra["webtext"]["n_docs"] / queries["q3_dedup_webtext"], 1
            ),
        },
        "scaling": extra["scaling"],
        "detail": {k: v for k, v in extra.items() if k != "scaling"},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scale-run":
        scale_run(int(sys.argv[2]), sys.argv[3])
    else:
        main()
