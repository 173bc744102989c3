"""applyInPandasWithState operators: per-fingerprint exact-dedup
decisions (with event-time TTL eviction) and per-band near-dup
registers, state held in Spark's streaming state store."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mashspark.params import LSHParams, SketchParams
from mashspark.stateful import stateful_band_dedup, stateful_exact_dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the market report "
    "shows steady growth in online services and public data systems today "
    "with more content about travel health money sport music and video "
    "published every hour by the new world news network for every reader "
)
OTHER = (
    "an entirely unrelated second document about gardening tools and "
    "winter recipes with long paragraphs describing soil preparation "
    "seed selection watering schedules and harvest storage methods "
    "for beginners and experts alike in cold northern climates "
) * 2


def _doc(doc_id, text, minute=0, hour=12):
    return {
        "doc_id": doc_id,
        "text": text,
        "warc_ts": dt.datetime(2024, 1, 1, hour, minute),
    }


def _write_chunk(path, rows):
    pd.DataFrame(rows).to_parquet(
        path, coerce_timestamps="us", allow_truncated_timestamps=True
    )


def _run_stream(spark, indir, build, name):
    """One file per trigger, availableNow, collect the memory sink."""
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, warc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{indir}/chunk*.parquet")
    )
    q = (
        build(stream).writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def test_exact_decisions_across_batches(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # batch 0: doc 1 (A), doc 2 (B); batch 1: dup of A (id 10, later ts),
    # novel C (id 11), another dup of A (id 12) — in-batch order must be
    # (ts, id): 10 before 12
    _write_chunk(d / "chunk0.parquet", [_doc(1, BASE), _doc(2, OTHER)])
    _write_chunk(d / "chunk1.parquet", [
        _doc(10, BASE, minute=5),
        _doc(11, "totally novel text " * 30, minute=5),
        _doc(12, BASE, minute=6),
    ])
    out = _run_stream(spark, d, stateful_exact_dedup, "exact_decisions")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 5
    assert not rows[1]["is_dup"] and rows[1]["n_seen_before"] == 0
    assert not rows[2]["is_dup"] and not rows[11]["is_dup"]
    assert rows[10]["is_dup"] and rows[10]["first_doc_id"] == 1
    assert rows[10]["n_seen_before"] == 1
    assert rows[12]["is_dup"] and rows[12]["first_doc_id"] == 1
    assert rows[12]["n_seen_before"] == 2
    # every doc carries the fingerprint of its content
    assert rows[1]["content_fp"] == rows[10]["content_fp"]
    assert rows[1]["content_fp"] != rows[2]["content_fp"]


def test_exact_in_batch_order_is_ts_then_id(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # one batch, same fingerprint, ids out of ts order: id 9 has the
    # EARLIER ts, so it claims the fingerprint despite the larger-id file
    # row order
    _write_chunk(d / "chunk0.parquet", [
        _doc(3, BASE, minute=9),
        _doc(9, BASE, minute=1),
    ])
    out = _run_stream(spark, d, stateful_exact_dedup, "exact_order")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert not rows[9]["is_dup"]
    assert rows[3]["is_dup"] and rows[3]["first_doc_id"] == 9


def test_exact_ttl_evicts_state(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # TTL 30 min, watermark 0s. b0: A at 12:00. b1 advances the watermark
    # to 14:00 (unrelated doc). b2 carries only another unrelated doc —
    # A's group has no data, its timeout (12:30) is behind the 14:00
    # watermark, so the state is evicted. b3: a copy of A -> NOVEL again.
    _write_chunk(d / "chunk0.parquet", [_doc(1, BASE)])
    _write_chunk(d / "chunk1.parquet", [_doc(2, OTHER, hour=14)])
    _write_chunk(d / "chunk2.parquet",
                 [_doc(3, "filler text " * 40, hour=14, minute=1)])
    _write_chunk(d / "chunk3.parquet", [_doc(4, BASE, hour=14, minute=2)])
    out = _run_stream(
        spark, d,
        lambda s: stateful_exact_dedup(s, watermark="0 seconds",
                                       state_ttl_sec=1800),
        "exact_ttl")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert not rows[1]["is_dup"]
    assert not rows[4]["is_dup"], "state for the fingerprint must be evicted"
    assert rows[4]["first_doc_id"] == 4


def test_exact_decisions_under_rocksdb_state_store(spark, tmp_path):
    """Same decisions under the RocksDB state store provider (the
    at-scale configuration: state on local disk, not executor heap)."""
    from mashspark.stateful import ROCKSDB_STATE_CONF

    d = tmp_path / "in"
    d.mkdir()
    _write_chunk(d / "chunk0.parquet", [_doc(1, BASE), _doc(2, OTHER)])
    _write_chunk(d / "chunk1.parquet", [
        _doc(10, BASE, minute=5), _doc(12, BASE, minute=6)])
    old = {k: spark.conf.get(k, None) for k in ROCKSDB_STATE_CONF}
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    try:
        out = _run_stream(spark, d, stateful_exact_dedup, "exact_rocksdb")
    finally:
        for k, v in old.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert not rows[1]["is_dup"] and not rows[2]["is_dup"]
    assert rows[10]["is_dup"] and rows[10]["n_seen_before"] == 1
    assert rows[12]["is_dup"] and rows[12]["n_seen_before"] == 2
    assert rows[12]["first_doc_id"] == 1


@pytest.fixture()
def band_cfg():
    return SketchParams(k=21, s=256, seed=42), LSHParams()


def test_band_dedup_finds_cross_and_in_batch_pairs(spark, tmp_path, band_cfg):
    params, lsh = band_cfg
    d = tmp_path / "in"
    d.mkdir()
    near = (BASE + "alpha section one").replace("steady", "stable")
    # b0: base doc + unrelated; b1: near-dup of doc 1 (cross-batch), an
    # exact copy of doc 10 (in-batch pair vs 10), and a novel doc
    _write_chunk(d / "chunk0.parquet",
                 [_doc(1, BASE + "alpha section one"), _doc(2, OTHER)])
    _write_chunk(d / "chunk1.parquet", [
        _doc(10, near, minute=5),
        _doc(11, near, minute=6),
        _doc(12, "fresh unrelated content " * 30, minute=6),
    ])
    out = _run_stream(
        spark, d,
        lambda s: stateful_band_dedup(s, params, lsh,
                                      jaccard_threshold=0.7),
        "band_pairs")
    pairs = {(r["doc_id"], r["matched_id"])
             for r in out.collect()}
    assert (10, 1) in pairs, "cross-batch near-dup must hit the register"
    assert (11, 10) in pairs, "in-batch pair must see the earlier arrival"
    assert all(a not in (2, 12) and b not in (2, 12) for a, b in pairs)
    # est_jaccard of the exact copy is 1.0
    exact = [r for r in out.collect()
             if (r["doc_id"], r["matched_id"]) == (11, 10)]
    assert all(r["est_jaccard"] == pytest.approx(1.0) for r in exact)
    assert all(r["common"] <= r["denom"] for r in out.collect())


def test_band_register_cap_drops_but_still_verifies(spark, tmp_path,
                                                    band_cfg):
    params, lsh = band_cfg
    d = tmp_path / "in"
    d.mkdir()
    # cap=1: doc 1 claims every register slot; doc 2 (exact copy) is
    # verified against it (pair emitted) but NOT added; doc 3 (copy
    # arriving later) therefore matches doc 1 only, never doc 2.
    _write_chunk(d / "chunk0.parquet", [_doc(1, BASE)])
    _write_chunk(d / "chunk1.parquet", [_doc(2, BASE, minute=5)])
    _write_chunk(d / "chunk2.parquet", [_doc(3, BASE, minute=6)])
    out = _run_stream(
        spark, d,
        lambda s: stateful_band_dedup(s, params, lsh, cap=1,
                                      jaccard_threshold=0.7),
        "band_cap")
    pairs = {(r["doc_id"], r["matched_id"]) for r in out.collect()}
    assert (2, 1) in pairs
    assert (3, 1) in pairs
    assert (3, 2) not in pairs, "capped register must not have added doc 2"


def test_band_dedup_never_emits_self_pairs_on_replay(spark, tmp_path,
                                                     band_cfg):
    """An at-least-once replay (same doc_id delivered twice — the same
    code path a band-key collision across residue classes hits) must
    not verify a doc against its own register entry: doc_id ==
    matched_id rows would read as real matches downstream."""
    params, lsh = band_cfg
    d = tmp_path / "in"
    d.mkdir()
    _write_chunk(d / "chunk0.parquet", [_doc(1, BASE)])
    _write_chunk(d / "chunk1.parquet", [_doc(1, BASE, minute=5),
                                        _doc(2, BASE, minute=6)])
    out = _run_stream(
        spark, d,
        lambda s: stateful_band_dedup(s, params, lsh,
                                      jaccard_threshold=0.7),
        "band_replay")
    rows = out.collect()
    assert all(r["doc_id"] != r["matched_id"] for r in rows), (
        "self-pair emitted on replay")
    pairs = {(r["doc_id"], r["matched_id"]) for r in rows}
    assert (2, 1) in pairs, "real pair must survive the replay filter"


def test_band_dedup_candidates_cover_batch_verified_pairs(spark, tmp_path):
    """Streaming/batch drift gate (the shared-kernel guarantee, asserted
    end-to-end): over a planted webtext corpus, the stateful operator's
    emitted candidate set must COVER every duplicate edge the batch
    pipeline verifies — the streaming analog of the LSH recall gate.
    The stateful threshold runs with margin (0.55 vs batch 0.7) because
    its register holds a 128-hash prefix estimate, not the full-sketch
    Jaccard the batch verifier computes."""
    from mashspark.params import PipelineConfig
    from mashspark.pipeline import dedup_pipeline
    from mashspark.webtext import webtext_spark_df

    params = SketchParams(k=21, s=256, seed=42)
    lsh = LSHParams(bands=32, prefix=64)
    cfg = PipelineConfig(sketch=params, lsh=lsh, jaccard_threshold=0.7)

    # arrival order must equal id order so the register's first-arrival
    # rep matches the batch min-id rep: ts = epoch + doc_id seconds
    docs = (
        webtext_spark_df(spark, n_base=40, seed=3)
        .select(
            "doc_id", "text",
            (F.lit(dt.datetime(2024, 1, 1)).cast("timestamp")
             + F.make_interval(secs=F.col("doc_id").cast("double"))
             ).alias("warc_ts"),
        )
    )
    res = dedup_pipeline(docs, cfg)
    batch_edges = {
        frozenset((r["src"], r["dst"])) for r in res.edges.collect()
    }
    res.release()
    assert batch_edges, "fixture must plant duplicate families"

    d = tmp_path / "in"
    d.mkdir()
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    thirds = len(pdf) // 3
    for i in range(3):
        chunk = pdf.iloc[i * thirds: (i + 1) * thirds if i < 2 else len(pdf)]
        chunk.to_parquet(d / f"chunk{i}.parquet", coerce_timestamps="us",
                         allow_truncated_timestamps=True)
    out = _run_stream(
        spark, d,
        lambda s: stateful_band_dedup(s, params, lsh, cap=256,
                                      jaccard_threshold=0.55),
        "band_parity")
    stream_pairs = {
        frozenset((r["doc_id"], r["matched_id"])) for r in out.collect()
    }
    missed = batch_edges - stream_pairs
    assert not missed, (
        f"stateful candidates missed {len(missed)}/{len(batch_edges)} "
        f"batch-verified duplicate edges: {sorted(tuple(m) for m in list(missed)[:5])}"
    )
