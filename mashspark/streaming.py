"""Structured Streaming dedup: incremental sketching and near-duplicate
detection of a document stream against a persisted sketch store.

The reference is a batch CLI with no streaming surface (SURVEY.md §2.7),
but the production webtext use case is a crawl firehose: new pages arrive
continuously and must be deduplicated against everything already seen.
Spark-first composition:

* ``stream_exact_dedup`` — watermarked ``dropDuplicates`` on a content
  fingerprint: exact dedup entirely inside Spark's streaming state store
  (no custom state), late data bounded by the watermark.
* ``incremental_dedup`` — ``foreachBatch`` micro-batch loop: each batch is
  sketched with the SAME vectorized UDF as the batch pipeline, LSH-joined
  against (a) the persisted sketch store (history) and (b) itself
  (in-batch dups), Mash-exact verified, and appended to the store. The
  store is bucketed parquet (Iceberg-shaped, like io.py); restarts resume
  from the stream checkpoint and the already-appended store — the same
  at-least-once + idempotent-append discipline the batch manifests use.

State sizing at web scale: history is never re-sketched (band keys are
stored, 8 B x <=32/doc), the batch side of the history join is small so
AQE broadcasts it and the history side is scanned map-side with NO
shuffle, and nothing driver-side grows with history size. The history
store is laid out for PARTITION PRUNING:

* ``store/bands`` — the exploded (band_key, doc_id) relation, written
  ``partitionBy(bucket = pmod(band_key, n_band_buckets))``: each
  micro-batch collects its own distinct band-key buckets (a tiny int
  set) and scans ONLY those partitions of the history — a narrow batch
  touches a constant number of buckets regardless of history size;
* ``store/sketches`` — the fat sketch rows, written
  ``partitionBy(doc_bucket = pmod(doc_id, n_doc_buckets))``: fetched
  only for band-matched history ids, again bucket-pruned, so unmatched
  history sketches are never read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import lsh as _lsh
from . import verify as _verify
from .params import PipelineConfig
from .sketch import sketch_documents


def stream_exact_dedup(stream_df: DataFrame, ts_col: str = "warc_ts",
                       text_col: str = "text",
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: first occurrence of each content fingerprint
    within the watermark horizon survives. Pure built-ins (xxhash64 +
    watermarked dropDuplicates) — the state store holds only the 8-byte
    fingerprints, and the watermark bounds state size."""
    return (
        stream_df.withColumn("content_fp", F.xxhash64(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicates(["content_fp"])
    )


def stream_windowed_counts(stream_df: DataFrame, ts_col: str = "ts",
                           window: str = "1 hour",
                           watermark: str = "2 hours",
                           keys: tuple = ("event_type",),
                           value_col: str | None = "value") -> DataFrame:
    """Watermarked tumbling-window rollup of an event stream — the
    streaming analog of the batch ``events_hourly`` contract query
    (count + exact integer cent-sum per window x key).

    Spark-native late-data semantics: the watermark bounds state (a
    window closes once the event-time watermark passes its end; later
    events are dropped), and the windowed groupBy shuffles only
    (window, keys) — partial aggregation map-side, so a hot event type
    pre-reduces inside every input partition before the exchange, same
    skew posture as the batch pipeline's groupBys."""
    agg = [F.count("*").alias("n_events")]
    if value_col is not None:
        agg.append(
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("value_cents")
        )
    out_cols = ["n_events"] + (["value_cents"] if value_col is not None else [])
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), *keys)
        .agg(*agg)
        .select(F.col("win.start").alias("window_start"), *keys, *out_cols)
    )


class IncrementalDeduper:
    """foreachBatch engine: near-dup decisions for each micro-batch against
    a persisted sketch store.

    store_path/sketches: parquet (doc_id, sketch, card_est, band_key,
    fp1, fp2) appended per batch. decisions_path: parquet
    (doc_id, dup_of, batch_id) — one row per incoming doc; dup_of is the
    matched historical/batch doc_id or NULL for novel docs.
    """

    def __init__(self, store_path: str, config: PipelineConfig | None = None,
                 n_band_buckets: int = 64, n_doc_buckets: int = 64):
        self.config = config or PipelineConfig()
        self.store_path = store_path
        self.sketch_path = os.path.join(store_path, "sketches")
        self.bands_path = os.path.join(store_path, "bands")
        self.decisions_path = os.path.join(store_path, "decisions")
        self.n_band_buckets = n_band_buckets
        self.n_doc_buckets = n_doc_buckets

    def _history_bands(self, spark: SparkSession):
        try:
            return spark.read.parquet(self.bands_path)
        except Exception:
            return None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (also callable directly in tests)."""
        cfg = self.config
        spark = batch_df.sparkSession
        # .persist(), NOT localCheckpoint: checkpointing inside a
        # foreachBatch callback breaks the microbatch's file-sink commit
        # (reproduced in test_incremental_dedup_cross_batch), and the
        # columnar-cache GC churn that makes the BATCH pipeline prefer
        # localCheckpoint (pipeline.dedup_pipeline) is a per-trigger
        # micro-batch non-issue here.
        sk = sketch_documents(batch_df, cfg.sketch, cfg.lsh).persist()

        # candidate pairs: in-batch LSH self-join ...
        # checkpoint=False: same foreachBatch constraint as the persist
        # above — candidate_pairs' internal localCheckpoints must not
        # run inside the micro-batch callback
        cand_self, _m = _lsh.candidate_pairs(
            sk, band_doc_cap=cfg.lsh.band_doc_cap,
            hard_bucket_cap=cfg.lsh.hard_bucket_cap, checkpoint=False,
        )
        pair_sources = [cand_self]
        union_sk = sk
        bb = sk.select("doc_id", F.explode("band_key").alias("band_key"))
        hist_bands = self._history_bands(spark)
        if hist_bands is not None:
            # ... plus batch-vs-history band join, PARTITION-PRUNED: the
            # batch's distinct band-key buckets are a tiny int set (<=
            # batch_docs x bands), and the history band store is
            # partitioned by that bucket, so the scan below touches only
            # the buckets this batch can possibly match — constant per
            # narrow batch, independent of history size. (History is
            # never re-sketched; its band keys are stored exploded.)
            batch_buckets = [
                r.b for r in bb.select(
                    F.pmod(F.col("band_key"), F.lit(self.n_band_buckets))
                    .alias("b")).distinct().collect()
            ]
            hb = hist_bands.filter(
                F.col("bucket").isin(batch_buckets)
            ).select("doc_id", "band_key")
            cross = (
                hb.withColumnRenamed("doc_id", "id_a")
                .join(bb.withColumnRenamed("doc_id", "id_b"), "band_key")
                .select(
                    F.least("id_a", "id_b").alias("id_a"),
                    F.greatest("id_a", "id_b").alias("id_b"),
                )
                .filter(F.col("id_a") != F.col("id_b"))
                .distinct()
            )
            # fetch ONLY the band-matched history sketches, again
            # bucket-pruned on the doc_id partitioning of the store
            matched = (
                cross.select(F.col("id_a").alias("doc_id"))
                .unionByName(cross.select(F.col("id_b").alias("doc_id")))
                .join(sk.select("doc_id"), "doc_id", "left_anti")
                .distinct()
            )
            doc_buckets = [
                r.b for r in matched.select(
                    F.pmod(F.col("doc_id"), F.lit(self.n_doc_buckets))
                    .alias("b")).distinct().collect()
            ]
            if doc_buckets:
                hist_sk = (
                    spark.read.parquet(self.sketch_path)
                    .filter(F.col("doc_bucket").isin(doc_buckets))
                    .join(matched, "doc_id", "left_semi")
                )
                union_sk = hist_sk.select(sk.columns).unionByName(sk)
                pair_sources.append(cross)

        cands = pair_sources[0]
        for p in pair_sources[1:]:
            cands = cands.unionByName(p)
        cands = cands.distinct()

        pairs = _verify.verify_pairs(
            cands, union_sk, cfg.sketch,
            jaccard_threshold=cfg.jaccard_threshold,
            prefix_filter=cfg.lsh.prefix,
            # localCheckpoint inside foreachBatch breaks the micro-batch
            # file-sink commit; per-batch tier-1 re-execution is cheap
            materialize_tier1=False,
        )

        # decision: a new doc is a dup of its smallest-id verified partner
        new_ids = sk.select("doc_id")
        dup_of = (
            pairs.select(F.col("id_b").alias("doc_id"), F.col("id_a").alias("partner"))
            .unionByName(
                pairs.select(F.col("id_a").alias("doc_id"), F.col("id_b").alias("partner"))
            )
            .join(new_ids, "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.min("partner").alias("dup_of"))
            # only partners that precede the doc (history or smaller id)
            .filter(F.col("dup_of") < F.col("doc_id"))
        )
        decisions = (
            new_ids.join(dup_of, "doc_id", "left")
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        decisions.write.mode("append").parquet(self.decisions_path)
        sk.withColumn(
            "doc_bucket",
            F.pmod(F.col("doc_id"), F.lit(self.n_doc_buckets)).cast("int"),
        ).write.partitionBy("doc_bucket").mode("append").parquet(self.sketch_path)
        bb.withColumn(
            "bucket",
            F.pmod(F.col("band_key"), F.lit(self.n_band_buckets)).cast("int"),
        ).write.partitionBy("bucket").mode("append").parquet(self.bands_path)
        sk.unpersist()


def incremental_dedup(stream_df: DataFrame, store_path: str,
                      config: PipelineConfig | None = None,
                      checkpoint: str | None = None,
                      trigger_available_now: bool = True):
    """Wire a streaming DataFrame of documents into the incremental
    deduper. Returns the started StreamingQuery."""
    dd = IncrementalDeduper(store_path, config)
    writer = stream_df.writeStream.foreachBatch(dd.process_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
