"""HTML → text extraction, byte-stable per url.

The input table (BASELINE.json ``input_hint``) carries both ``html``
(the raw fetched bytes) and ``text`` (the extracted text); the per-row
invariant is that extraction is a pure deterministic function of the
html bytes — *byte-identical text per url* regardless of which
executor, partition, or rerun produced it. Dedup correctness depends
on this: a sketch is a function of text bytes, so any nondeterminism
in extraction silently breaks cluster reproducibility.

This module provides that function as pure Spark column expressions
(whole-stage codegen, no Python in the hot path):

1. decode utf-8;
2. drop ``<script>``/``<style>`` elements wholesale (their content is
   not page text);
3. drop comments and tags;
4. decode the five standard entities (&amp; last, so ``&amp;lt;`` does
   not double-decode);
5. collapse whitespace runs to single spaces and trim.

Determinism holds trivially: every step is a pure string function.
The invariant test (tests/test_round3_ops.py) re-extracts the
synthetic corpus's html and asserts byte-equality with its ``text``
column for every url at any partitioning.

A real crawl needs a proper DOM parser (boilerplate removal, block
segmentation); that variant belongs in ``mapInPandas`` over the binary
column with the SAME signature, so swapping it in changes no plumbing.
This regex extractor is the deterministic reference implementation the
invariant is stated against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?is): case-insensitive, dot matches newline — script/style elements
# and comments can span lines
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)<[^>]*>"


def extracted_text(html) -> Column:
    """Deterministic text of an ``html`` binary/string column."""
    h = F.col(html) if isinstance(html, str) else html
    s = F.decode(h, "utf-8")
    s = F.regexp_replace(s, _SCRIPT_RE, " ")
    s = F.regexp_replace(s, _STYLE_RE, " ")
    s = F.regexp_replace(s, _COMMENT_RE, " ")
    s = F.regexp_replace(s, _TAG_RE, " ")
    # entity decode; &amp; strictly last
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.regexp_replace(s, r"\s+", " ")
    return F.trim(s)


def extract_text(df: DataFrame, html_col: str = "html",
                 out_col: str = "text") -> DataFrame:
    """Map-only: append (or replace) the extracted-text column."""
    return df.withColumn(out_col, extracted_text(html_col))


def extraction_invariant_violations(df: DataFrame, html_col: str = "html",
                                    text_col: str = "text",
                                    id_col: str = "url") -> DataFrame:
    """Audit op: rows whose stored ``text`` is NOT the deterministic
    extraction of their ``html`` — the per-url byte-identity check the
    input contract demands, runnable as a full-corpus map-only scan
    (count == 0 on a healthy snapshot)."""
    return (
        df.withColumn("_ext", extracted_text(html_col))
        .filter(F.col("_ext") != F.col(text_col))
        .select(id_col, text_col, F.col("_ext").alias("extracted"))
    )
