"""Benchmark decontamination: flag documents that contain any word
n-gram from a benchmark/test set (the GPT-3/Pile-style 13-gram overlap
rule — public method; no reference-code analog, this is a training-data
pipeline operator beyond marbl/Mash).

Spark-first shape — everything stays in whole-stage codegen:

* each side's word n-grams are built as a JVM array expression
  (``split`` -> ``transform(sequence(...))`` -> ``concat_ws`` ->
  ``xxhash64``), no Python UDF;
* the benchmark side reduces to a DISTINCT 8-byte hash set — tiny
  relative to the corpus (benchmarks are ~10^6 n-grams vs 10^12 docs),
  so the overlap test is a broadcast semi-/inner-join against it: the
  corpus side streams map-side, and the only shuffle is the final
  per-doc count aggregation (map-side partials, 16 B rows);
* a doc with zero qualifying n-grams (shorter than n words) is clean by
  definition and never leaves the map side.

At 10^12 docs the exploded corpus n-gram relation is large but
transient (generated and semi-joined inside one codegen stage before
the aggregation); nothing is materialized per n-gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngram_hashes(text_col, n: int):
    """Array of xxhash64 values, one per word n-gram of ``text_col``.

    Normalization follows the usual decontamination recipe: lowercase,
    collapse non-alphanumerics to single spaces, then whitespace-split.
    Returns an empty array for docs shorter than n words.
    """
    words = F.split(
        F.trim(F.regexp_replace(F.lower(text_col), r"[^a-z0-9]+", " ")), " ")
    # sequence(0, size-n) enumerates n-gram start offsets; slice is 1-based
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, n))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def benchmark_ngram_hashes(benchmark_docs: DataFrame, n: int = 13,
                           text_col: str = "text") -> DataFrame:
    """-> distinct (ngram_hash) of the benchmark side. Distinct keeps the
    broadcast build side minimal; at typical benchmark sizes this is a
    few MB of 8-byte hashes."""
    return (
        benchmark_docs
        .select(F.explode(_ngram_hashes(F.col(text_col), n)).alias("ngram_hash"))
        .distinct()
    )


def contamination_flags(docs: DataFrame, benchmark_docs: DataFrame,
                        n: int = 13, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_total_ngrams, n_contaminated, contaminated).

    ``contaminated`` = the doc shares at least one word n-gram with the
    benchmark set. ``n_contaminated`` counts the doc's n-gram POSITIONS
    that hit the set (repeats count — a doc quoting one benchmark line
    10 times reports 10), which is the signal decontamination filters
    threshold on.
    """
    bench = benchmark_ngram_hashes(benchmark_docs, n, text_col=text_col)
    # single pass: explode once, mark membership with a broadcast left
    # join, aggregate totals and hits together. The map-side partial agg
    # collapses the exploded relation to one row per (doc, partition)
    # before the exchange, so the shuffle is O(docs), not O(n-grams);
    # short docs survive via explode_outer's null row (count() skips it).
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_ngram_hashes(F.col(text_col), n)).alias("ngram_hash"),
    )
    marked = grams.join(
        F.broadcast(bench.withColumn("_hit", F.lit(1))), "ngram_hash", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("ngram_hash").alias("n_total_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
        )
        .withColumn("contaminated", F.col("n_contaminated") > 0)
    )


def fuzzy_contamination_pairs(
    docs: DataFrame,
    benchmark_docs: DataFrame,
    n: int = 8,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    bench_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-ITEM fuzzy decontamination: -> (doc_id, bench_id,
    n_item_ngrams, n_matched, contaminated) for every (doc, benchmark
    item) pair sharing at least one n-gram; ``contaminated`` = the doc
    covers >= ``threshold`` of the item's DISTINCT n-grams (the
    containment C(item, doc) = |S(item) & S(doc)| / |S(item)| — the
    same asymmetric-containment rule the screen operator applies to
    sketches, here exact over short benchmark items).

    Catches what the exact 13-gram rule misses: a benchmark answer
    quoted with small edits still covers most of the item's shorter
    n-grams. Lowering ``n`` loosens the match; the fraction threshold
    replaces the any-hit rule.

    Scale shape: both sides' n-gram sets are DISTINCT per document
    (``array_distinct`` BEFORE the explode — map-only, so the join
    never sees within-doc repeats); the benchmark side (items are
    ~10^2 n-grams each, benchmarks ~10^6 total) broadcasts; the inner
    join emits only actual hits, so the groupBy(doc, item) aggregates
    O(hits), not O(corpus n-grams). The contamination test is an exact
    integer cross-multiplication (no float boundary).
    """
    # an item shorter than n words has NO n-grams and would silently
    # vanish from the output — the one failure mode this operator must
    # not have (a verbatim quote of it would go unflagged). Loud error;
    # the benchmark side is small, so the check is one cheap count.
    n_short = benchmark_docs.filter(
        F.size(_ngram_hashes(F.col(text_col), n)) == 0).count()
    if n_short:
        raise ValueError(
            f"{n_short} benchmark item(s) have fewer than n={n} words "
            f"and would be silently uncheckable; lower n")
    bench = benchmark_docs.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(F.array_distinct(
            _ngram_hashes(F.col(text_col), n))).alias("ngram_hash"),
    )
    totals = bench.groupBy("bench_id").agg(
        F.count("*").alias("n_item_ngrams"))
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(
            _ngram_hashes(F.col(text_col), n))).alias("ngram_hash"),
    )
    hits = (
        grams.join(F.broadcast(bench), "ngram_hash")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_matched"))
        .join(F.broadcast(totals), "bench_id")
    )
    # integer cross-multiply: n_matched/total >= threshold without a
    # float division at the decision boundary
    scale = 1_000_000
    thr = int(round(threshold * scale))
    return hits.select(
        "doc_id", "bench_id", "n_item_ngrams", "n_matched",
        (F.col("n_matched") * scale >= F.col("n_item_ngrams") * thr)
        .alias("contaminated"),
    )
