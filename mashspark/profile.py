"""One-pass corpus profiling — the webtext analog of the reference's
``mash info`` (``CommandInfo.cpp``: sketch-table header + cardinality
report; here the table is a document corpus, so the report is corpus
composition: volume, dedup headroom, length distribution per stratum).

A curation run starts and ends with this report: it sizes every
downstream decision (dedup expected yield, sampling rates, packing
context counts) and written after a run it is the regression check
that the pipeline did what it claimed.

Scale shape:

- ``group_profile`` is TWO chained map-side-partial aggregations, no
  window, no count(distinct): distinct-text counting goes through
  ``groupBy(group, md5(text))`` first (16 B keys), then rolls up per
  group — Spark's count(distinct) rewrite would add an Expand over the
  corpus instead. Every emitted stat is an exact integer (the
  oracle-checkable contract surface).
- ``corpus_summary`` adds the driver-sized global row: one aggregate
  with t-digest quantiles (``percentile_approx`` — mergeable
  O(accuracy) state, the 10^12-doc path; ``exact=True`` for tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count(col: Column) -> Column:
    """Token count under the SAME definition lm.py trains on (split on
    single spaces, drop empties) — profile-reported token masses must
    agree with what the LM/backoff/DSIR models actually consume, or
    every decision sized from the profile is computed against a
    different tokenization."""
    return F.size(F.filter(F.split(col, " "), lambda x: x != "")) \
        .cast("long")


def group_profile(
    docs: DataFrame,
    keys: list[str] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum exact profile: doc count, distinct-text count (dedup
    headroom = n_docs - n_distinct_texts), char/token mass, token-length
    extremes. All integers, order-independent."""
    keys = list(keys)
    keyed = docs.select(
        *keys,
        F.md5(F.col(text_col)).alias("_fp"),
        F.length(F.col(text_col)).cast("long").alias("_chars"),
        token_count(F.col(text_col)).alias("_toks"),
    )
    # level 1: collapse identical texts per stratum (map-side partials
    # bound the shuffle by distinct (stratum, fp) pairs)
    per_fp = keyed.groupBy(*keys, "_fp").agg(
        F.count("*").alias("n_copies"),
        F.first("_chars").alias("_chars"),
        F.first("_toks").alias("_toks"),
    )
    # level 2: tiny per-stratum rollup
    return per_fp.groupBy(*keys).agg(
        F.sum("n_copies").alias("n_docs"),
        F.count("*").alias("n_distinct_texts"),
        F.sum(F.col("_chars") * F.col("n_copies")).alias("sum_chars"),
        F.sum(F.col("_toks") * F.col("n_copies")).alias("sum_tokens"),
        F.min("_toks").alias("min_tokens"),
        F.max("_toks").alias("max_tokens"),
    )


def corpus_summary(
    docs: DataFrame,
    text_col: str = "text",
    url_col: str | None = "url",
    exact: bool = False,
    accuracy: int = 10000,
) -> dict:
    """Driver-sized global report: volumes, distinct texts/urls, token
    length quantiles. Returns a plain dict (write it as the run
    manifest). One pre-aggregation pass + one global aggregate."""
    toks = token_count(F.col(text_col))
    base = docs.select(
        F.md5(F.col(text_col)).alias("_fp"),
        toks.alias("_toks"),
        F.length(F.col(text_col)).cast("long").alias("_chars"),
        *([F.col(url_col).alias("_url")] if url_col in docs.columns else []),
    )
    probs = [0.25, 0.5, 0.75, 0.95, 0.99]
    col = F.col("_toks").cast("double")
    q = (F.percentile(col, F.lit(probs)) if exact
         else F.percentile_approx(col, F.lit(probs), F.lit(accuracy)))
    aggs = [
        F.count("*").alias("n_docs"),
        F.approx_count_distinct("_fp").alias("n_distinct_texts_approx"),
        F.sum("_toks").alias("sum_tokens"),
        F.sum("_chars").alias("sum_chars"),
        q.alias("token_quantiles"),
    ]
    if url_col in docs.columns:
        aggs.append(F.approx_count_distinct("_url").alias(
            "n_distinct_urls_approx"))
    row = base.agg(*aggs).collect()[0].asDict()
    row["token_quantile_probs"] = probs
    return row
