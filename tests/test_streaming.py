"""Structured Streaming dedup: watermarked exact dedup and the
foreachBatch incremental near-dup engine (cross-batch detection against
the persisted sketch store, resume via stream checkpoint)."""

import datetime as dt
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mashspark.params import PipelineConfig, SketchParams

BASE = (
    "the quick brown fox jumps over the lazy dog while the market report "
    "shows steady growth in online services and public data systems today "
    "with more content about travel health money sport music and video "
    "published every hour by the new world news network for every reader "
)


def _doc(doc_id, text, ts_minute=0):
    return {
        "doc_id": doc_id,
        "text": text,
        "warc_ts": dt.datetime(2024, 1, 1, 12, ts_minute),
    }


def _write_chunk(path, rows):
    # micro-second timestamps: Spark cannot read parquet TIMESTAMP(NANOS)
    pd.DataFrame(rows).to_parquet(
        path, coerce_timestamps="us", allow_truncated_timestamps=True
    )


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    other = (
        "an entirely unrelated second document about gardening tools and "
        "winter recipes with long paragraphs describing soil preparation "
        "seed selection watering schedules and harvest storage methods "
        "for beginners and experts alike in cold northern climates "
    ) * 2
    # chunk 0: two distinct base docs
    _write_chunk(
        d / "chunk0.parquet",
        [_doc(1, BASE + "alpha section one"), _doc(2, other)],
    )
    # chunk 1: near-dup of doc 1, novel doc, exact dup of doc 2
    near = (BASE + "alpha section one").replace("steady", "stable")
    novel = "completely different text " * 20
    _write_chunk(
        d / "chunk1.parquet",
        [
            _doc(10, near, ts_minute=5),
            _doc(11, novel, ts_minute=5),
            _doc(12, other, ts_minute=5),
        ],
    )
    return str(d)


SCHEMA = "doc_id long, text string, warc_ts timestamp"


def test_incremental_dedup_cross_batch(spark, stream_dir, tmp_path):
    from mashspark.streaming import incremental_dedup

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig(sketch=SketchParams(k=21, s=256), jaccard_threshold=0.7)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = incremental_dedup(stream, store, cfg, checkpoint=ckpt)
    q.awaitTermination(600)

    dec = spark.read.parquet(os.path.join(store, "decisions"))
    rows = {r.doc_id: r for r in dec.collect()}
    assert set(rows) == {1, 2, 10, 11, 12}
    assert rows[1].dup_of is None and rows[2].dup_of is None
    assert rows[10].dup_of == 1      # near-dup found ACROSS batches
    assert rows[11].dup_of is None   # novel
    assert rows[12].dup_of == 2      # exact dup across batches
    # the two chunks were processed as separate micro-batches
    assert rows[1].batch_id != rows[10].batch_id

    # store carries every sketch
    sk = spark.read.parquet(os.path.join(store, "sketches"))
    assert sk.count() == 5

    # resume: restart the stream with the same checkpoint — no reprocessing
    q2 = incremental_dedup(stream, store, cfg, checkpoint=ckpt)
    q2.awaitTermination(600)
    assert spark.read.parquet(os.path.join(store, "decisions")).count() == 5


def test_streaming_store_band_bucket_pruning(spark, stream_dir, tmp_path):
    """At 10^12-doc history the per-micro-batch history scan must not be
    a full-store scan: the band store is written PARTITIONED BY
    pmod(band_key, n_band_buckets), and the engine filters it with the
    batch's bucket set, so file pruning happens at planning time."""
    import glob

    from mashspark.streaming import incremental_dedup

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig(sketch=SketchParams(k=21, s=256), jaccard_threshold=0.7)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = incremental_dedup(stream, store, cfg, checkpoint=ckpt)
    q.awaitTermination(600)

    # layout: multiple band-bucket partitions exist on disk
    bucket_dirs = glob.glob(os.path.join(store, "bands", "bucket=*"))
    assert len(bucket_dirs) > 1, bucket_dirs

    # a bucket filter (what process_batch issues for the batch's bucket
    # set) is planned as a partition filter — pruned at file listing, not
    # a post-scan row filter
    bands = spark.read.parquet(os.path.join(store, "bands"))
    one = bands.select("bucket").first().bucket
    pruned = bands.filter(F.col("bucket") == one)
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan and f"bucket" in scan[0], plan
    # and the pruned scan reads fewer files than the store holds
    total_files = sum(
        len(glob.glob(os.path.join(d, "*.parquet"))) for d in bucket_dirs
    )
    one_files = len(
        glob.glob(os.path.join(store, "bands", f"bucket={one}", "*.parquet"))
    )
    assert 0 < one_files < total_files

    # sketch store: partitioned by doc bucket with the same discipline
    assert glob.glob(os.path.join(store, "sketches", "doc_bucket=*"))


def test_stream_windowed_counts_matches_batch(spark, tmp_path):
    """Watermarked tumbling-window rollup over a replayed event stream
    equals the batch groupBy on the same data (complete output mode so
    every window is emitted; late-data drop semantics are Spark's own)."""
    from mashspark.streaming import stream_windowed_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # fixture ts is TIMESTAMP_NTZ; event-time watermarks require TIMESTAMP
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    indir = str(tmp_path / "evstream")
    # two chunks -> two micro-batches
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{indir}/c0")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{indir}/c1")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{indir}/c*")
    )
    out = stream_windowed_counts(stream, ts_col="ts", window="1 hour",
                                 watermark="2 hours")
    q = (
        out.writeStream.format("memory").queryName("win_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(600)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.value_cents)
        for r in spark.sql("select * from win_counts").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.value_cents)
        for r in ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        ).collect()
    }
    assert got == want


def test_stream_exact_dedup(spark, stream_dir):
    from mashspark.streaming import stream_exact_dedup

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    out = stream_exact_dedup(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("exact_dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = spark.sql("select doc_id from exact_dedup_sink").collect()
    ids = sorted(r.doc_id for r in got)
    # doc 12 (exact copy of doc 2's text, later batch) is dropped by the
    # cross-batch streaming state; everything else survives
    assert ids == [1, 2, 10, 11]
