"""Exact-substring duplicate detection — the third dedup family the north
rule names ("MinHash/SimHash/suffix-array substring").

The reference-free suffix-array formulation (sort all suffixes, scan for
long shared prefixes — Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022) is inherently a single-address-space
algorithm; the Spark-first equivalent used here is ANCHOR HASHING, which
finds the same >=L-byte cross-document repeats with a shuffle instead of
a global sort:

* every document is scanned once with the vectorized murmur3 kernel at
  window length L (``hashing.hash_shingles_concat`` — the same kernel the
  MinHash sketcher uses), and windows whose hash satisfies
  ``h & (stride-1) == 0`` are kept as ANCHORS (content-defined
  mod-sampling, expected density 1/stride). Selection depends only on the
  BYTES of the window, so a repeated substring selects identical anchors
  in every occurrence regardless of alignment — a position-grid stride
  would only match occurrences whose offsets agree mod stride. A repeat
  of length R contains an anchor with probability
  1 - (1 - 1/stride)^(R-L+1) (stride 16, R = L+100: ~99.85%); 64-bit
  murmur collisions are filtered by the exact verify below;
* anchors shuffle as (hash, doc_id, pos) — 20 B/row, linear in corpus
  bytes / stride, no quadratic stage. Bucket sizes come from a skew-safe
  groupBy (map-side partial aggregation); mega-buckets (hot boilerplate
  anchors) are dropped via an anti-join against the tiny over-cap key
  set, with the drop count logged like ``lsh.candidate_pairs``' hard cap
  (no silent truncation);
* candidate (doc_a, pos_a, doc_b, pos_b) pairs are verified EXACTLY by
  substring equality on the anchor window (murmur collision filter), then
  merged into maximal spans driver-lessly: adjacent anchor matches on the
  same (doc_a, doc_b, pos_a - pos_b) diagonal are one repeat, so a
  groupBy on the diagonal with min/max positions reconstructs each shared
  span's extent without comparing the texts byte-by-byte again.

Output: one row per (id_a, id_b, diagonal) shared run:
(id_a, id_b, a_start, b_start, match_len_lower_bound) where
match_len_lower_bound = last_anchor - first_anchor + L is exact for
stride-aligned repeats and a lower bound otherwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

from .hashing import encode_signed, hash_shingles_concat

_ANCHOR_FIELDS = StructType(
    [
        StructField("hash", ArrayType(LongType()), False),
        StructField("pos", ArrayType(LongType()), False),
    ]
)


def make_anchor_udf(min_len: int, stride: int, seed: int = 42):
    """text -> struct(hash[], pos[]) of content-defined anchor hashes
    (windows with ``hash & (stride-1) == 0``; stride must be a power of
    two; stride=1 keeps every window).

    One murmur pass per Arrow batch over the concatenated bytes (the k=L
    sliding-window kernel), then a vectorized mask — no per-row Python.
    Positions are BYTE offsets into the utf-8 encoding.
    """
    if stride & (stride - 1):
        raise ValueError("stride must be a power of two")
    mask = np.uint64(stride - 1)

    @pandas_udf(_ANCHOR_FIELDS)
    def anchor_udf(texts: pd.Series) -> pd.DataFrame:
        vals = texts.fillna("").astype(str).tolist()
        bufs = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in vals]
        lens = [len(b) for b in bufs]
        big = np.concatenate(bufs) if bufs else np.empty(0, dtype=np.uint8)
        all_h = hash_shingles_concat(big, min_len, seed)
        hashes, positions = [], []
        off = 0
        for blen in lens:
            if blen < min_len:
                hashes.append(np.empty(0, dtype=np.int64))
                positions.append(np.empty(0, dtype=np.int64))
            else:
                nk = blen - min_len + 1
                seg = all_h[off : off + nk]
                pos = np.flatnonzero((seg & mask) == 0).astype(np.int64)
                hashes.append(encode_signed(seg[pos]))
                positions.append(pos)
            off += blen
        return pd.DataFrame({"hash": hashes, "pos": positions})

    return anchor_udf


def substring_dup_spans(docs: DataFrame, min_len: int = 50, stride: int = 16,
                        seed: int = 42, bucket_cap: int = 200,
                        id_col: str = "doc_id", text_col: str = "text",
                        verify: bool = True):
    """Cross-document exact repeats of length >= min_len (found with
    probability 1 - (1-1/stride)^(R-min_len+1) per repeat of length R —
    certainty at stride=1).

    Returns (spans_df, metrics_df).
    spans_df: (id_a, id_b, a_start, b_start, n_anchors, match_len) with
    id_a < id_b, one row per shared diagonal run; match_len = anchor span
    + min_len, a lower bound on the true repeat length (tight to
    ~2*stride in expectation).
    metrics_df: one row (n_anchor_buckets, n_capped_buckets).

    ``verify=True`` re-checks one anchor window per candidate pair by
    exact substring equality (murmur-collision filter) — a join back to
    the text of only the candidate docs (semi-join pruned), not a second
    full scan.
    """
    udf = make_anchor_udf(min_len, stride, seed)
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    anchors = (
        base.withColumn("_a", udf(F.col("text")))
        .select(
            "doc_id",
            F.explode(F.arrays_zip(F.col("_a.hash"), F.col("_a.pos"))).alias("hp"),
        )
        .select("doc_id", F.col("hp.hash").alias("hash"), F.col("hp.pos").alias("pos"))
    )

    # bucket accounting via groupBy (map-side partial agg — skew-safe, no
    # per-bucket window task); anchors in buckets above ``bucket_cap``
    # are DROPPED with the count logged (no silent truncation): a
    # >cap-way repeated substring is boilerplate, which the MinHash
    # family handles at document granularity — this operator's target is
    # long low-multiplicity repeats. The fat anchor relation only ever
    # joins the tiny over-cap KEY SET (AQE broadcasts it).
    # eager: anchors fans out to the sizes groupBy AND the anti-join;
    # lazy checkpoints race under AQE's concurrent job submission (see
    # lsh.candidate_pairs docstring)
    anchors = anchors.localCheckpoint(eager=True)
    sizes = anchors.groupBy("hash").agg(F.count("*").alias("n"))
    multi = sizes.filter(F.col("n") > 1)
    metrics = multi.agg(
        F.count("*").alias("n_anchor_buckets"),
        F.sum((F.col("n") > bucket_cap).cast("long")).alias("n_capped_buckets"),
    )
    over_cap = sizes.filter(F.col("n") > bucket_cap).select("hash")
    capped = anchors.join(over_cap, "hash", "left_anti").select(
        "doc_id", "hash", "pos"
    )

    left = capped.select(
        F.col("doc_id").alias("id_a"), "hash", F.col("pos").alias("pos_a")
    )
    right = capped.select(
        F.col("doc_id").alias("id_b"), "hash", F.col("pos").alias("pos_b")
    )
    cand = left.join(right, "hash").filter(F.col("id_a") < F.col("id_b"))

    if verify:
        # exact substring equality for ONE window per (pair, diagonal),
        # via SKINNY window relations: extract each distinct (doc, pos)
        # candidate window ONCE in a per-doc projection (the full text
        # column is sliced in the same stage it is joined, so it never
        # attaches to the pair relation), then equi-join the ~min_len-byte
        # slices onto the pairs. The former formulation joined each doc's
        # ENTIRE text onto every candidate pair — a doc in P pairs
        # replicated its full bytes P times through the join; here a doc
        # crosses the window-extraction shuffle once per DISTINCT anchor
        # position and the pair relation only ever carries 25-byte slices.
        need = (
            cand.select(F.col("id_a").alias("doc_id"), F.col("pos_a").alias("pos"))
            .unionByName(
                cand.select(F.col("id_b").alias("doc_id"), F.col("pos_b").alias("pos"))
            )
            .distinct()
        )
        # anchor positions are BYTE offsets (the murmur kernel hashes utf-8
        # bytes), so slice the encoded binary column: correct for
        # multi-byte characters
        wins = need.join(base, "doc_id").select(
            "doc_id", "pos",
            F.substring(
                F.encode("text", "utf-8"), F.col("pos").cast("int") + 1, min_len
            ).alias("win"),
        )
        cand = (
            cand.join(
                wins.select(F.col("doc_id").alias("id_a"),
                            F.col("pos").alias("pos_a"),
                            F.col("win").alias("_wa")),
                ["id_a", "pos_a"],
            )
            .join(
                wins.select(F.col("doc_id").alias("id_b"),
                            F.col("pos").alias("pos_b"),
                            F.col("win").alias("_wb")),
                ["id_b", "pos_b"],
            )
            .filter(F.col("_wa") == F.col("_wb"))
            .drop("_wa", "_wb")
        )

    # merge anchor matches into maximal diagonal runs: same (id_a, id_b,
    # pos_a - pos_b) = same shared span. Content-defined anchors are
    # spaced geometrically (mean = stride), so a gap > 8*stride windows
    # (P ~ (1-1/stride)^(8*stride) ~ 0.03%) splits runs — an occasional
    # split only under-reports match_len, never invents a match
    diag = cand.withColumn("diag", F.col("pos_a") - F.col("pos_b"))
    wd = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    runs = (
        diag.withColumn(
            "brk",
            F.when(
                F.col("pos_a") - F.lag("pos_a", 1).over(wd) > 8 * stride, 1
            ).otherwise(0),
        )
        .withColumn("run_id", F.sum("brk").over(
            wd.rowsBetween(Window.unboundedPreceding, 0)
        ))
        .groupBy("id_a", "id_b", "diag", "run_id")
        .agg(
            F.min("pos_a").alias("a_start"),
            F.min("pos_b").alias("b_start"),
            F.count("*").alias("n_anchors"),
            (F.max("pos_a") - F.min("pos_a") + min_len).alias("match_len"),
        )
        .drop("run_id")
    )
    return runs, metrics


def remove_shared_spans(docs: DataFrame, min_len: int = 50, stride: int = 16,
                        seed: int = 42, id_col: str = "doc_id",
                        text_col: str = "text", **kw) -> DataFrame:
    """The REMOVAL step of exact-substring dedup (Lee et al. 2022 cut the
    duplicated spans out of the training text; the span finder above only
    reports them): every cross-document repeat of length >= min_len is
    cut from all occurrences EXCEPT the one in the smallest doc_id, so
    exactly one copy of each long repeat survives the corpus.

    Scale shape: span discovery is ``substring_dup_spans`` (linear anchor
    shuffle); the cuts group to their victim doc with one
    ``groupBy(doc_id).agg(collect_list(...))`` — per-doc interval counts
    are bounded by the span finder's bucket caps — and splicing is one
    Arrow batch pass over only the AFFECTED docs (untouched docs pass
    through a left join, their text column never enters Python).

    Cut boundaries snap outward to UTF-8 character boundaries (anchor
    positions are byte offsets), so output text is always valid and the
    full span is removed (at most 3 extra bytes per edge).

    Output: (doc_id, text, n_removed_spans, n_removed_bytes).
    """
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    spans, _metrics = substring_dup_spans(
        base, min_len=min_len, stride=stride, seed=seed, **kw)
    # keep the id_a (smaller id) occurrence; cut from id_b
    cuts = spans.select(
        F.col("id_b").alias("doc_id"),
        F.struct(
            F.col("b_start").alias("start"),
            (F.col("b_start") + F.col("match_len")).alias("end"),
        ).alias("iv"),
    ).groupBy("doc_id").agg(F.collect_list("iv").alias("ivs"))

    splice_schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("n_removed_spans", LongType(), False),
        StructField("n_removed_bytes", LongType(), False),
    ])

    def splice(batches):
        for pdf in batches:
            out_text, out_ns, out_nb = [], [], []
            for text, ivs in zip(pdf["text"], pdf["ivs"]):
                buf = np.frombuffer(str(text).encode("utf-8"), dtype=np.uint8)
                n = len(buf)
                # merge overlapping intervals (sweep over sorted starts)
                merged = []
                for iv in sorted((int(i["start"]), int(i["end"])) for i in ivs):
                    s, e = max(0, iv[0]), min(n, iv[1])
                    if merged and s <= merged[-1][1]:
                        merged[-1][1] = max(merged[-1][1], e)
                    else:
                        merged.append([s, e])
                is_boundary = (buf & 0xC0) != 0x80
                keep = np.ones(n, dtype=bool)
                for s, e in merged:
                    while s > 0 and not is_boundary[s]:
                        s -= 1          # snap start back to a char boundary
                    while e < n and not is_boundary[e]:
                        e += 1          # snap end forward to a char boundary
                    keep[s:e] = False
                out_text.append(buf[keep].tobytes().decode("utf-8"))
                out_ns.append(len(merged))
                out_nb.append(int(n - keep.sum()))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "text": out_text,
                "n_removed_spans": out_ns,
                "n_removed_bytes": out_nb,
            })

    affected = (
        base.join(cuts, "doc_id")
        .mapInPandas(splice, splice_schema)
    )
    untouched = (
        base.join(cuts.select("doc_id"), "doc_id", "left_anti")
        .withColumn("n_removed_spans", F.lit(0).cast("long"))
        .withColumn("n_removed_bytes", F.lit(0).cast("long"))
    )
    return untouched.unionByName(affected)


def substring_dup_pairs(docs: DataFrame, min_len: int = 50, stride: int = 16,
                        seed: int = 42, **kw) -> DataFrame:
    """Document-level rollup: (id_a, id_b, n_spans, total_match_len,
    max_match_len) for pairs sharing >= 1 exact repeat."""
    spans, _ = substring_dup_spans(docs, min_len=min_len, stride=stride,
                                   seed=seed, **kw)
    return spans.groupBy("id_a", "id_b").agg(
        F.count("*").alias("n_spans"),
        F.sum("match_len").alias("total_match_len"),
        F.max("match_len").alias("max_match_len"),
    )
