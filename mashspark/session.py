"""SparkSession factory with scale-aware defaults.

Single-JVM ``local[N]`` in the sandbox; the same settings translate to a
real cluster (AQE on, Arrow on, shuffle partitions sized to parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(cores: int | None = None, shuffle_partitions: int | None = None,
              app_name: str = "mashspark", extra_conf: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    # This sandbox's buffered-writeback path crawls (~26 MB/s vs 429 MB/s
    # O_DIRECT; measured), so shuffle/spill/checkpoint blocks go to tmpfs.
    # On a real cluster leave spark.local.dir to the node-local SSD config.
    local_dir = os.environ.get("MASHSPARK_LOCAL_DIR", "/dev/shm/spark-local")
    try:
        os.makedirs(local_dir, exist_ok=True)
    except OSError:
        local_dir = None
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("MASHSPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fat binary sketch columns: compressed columnar cache costs
        # hundreds of CPU-core-sec trying to encode random bytes
        # (measured via event log) for ~0 size win; store raw
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "4096")
        # fat 8KB binary rows: sort-merge joins sort them (measured: the
        # verify join burned ~2600 CPU-core-sec in SMJ sorts/spills);
        # shuffled-hash joins only hash the skinny side
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
