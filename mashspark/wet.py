"""WET-style container ingestion: Common-Crawl-shaped multi-record
plain-text archives -> a documents DataFrame. (Reference analog: the
FASTA/FASTQ scanners — ``Sketch.cpp`` kseq loop — which are likewise
"many records per file, header line + payload" containers; same job,
web-crawl container instead of sequence container.)

Format (the WET subset this reads/writes):

    WARC/1.0
    WARC-Type: conversion
    WARC-Target-URI: <url>
    WARC-Date: <iso8601>
    Content-Length: <bytes>
    <blank line>
    <extracted text ... possibly many lines>
    <blank line>

Spark-first shape — record splitting happens INSIDE the JVM text
source, not in Python:

- ``spark.read.text`` with a custom ``lineSep`` of the record banner
  (``"WARC/1.0\\n"``) makes every row one full record regardless of how
  many newlines its body has; files split across HDFS blocks the same
  way any line-delimited text does, so a 1 TB archive parallelizes
  without a custom InputFormat;
- header fields and the body are then pure ``regexp_extract`` /
  ``substring`` column expressions (whole-stage codegen, map-only);
- ``doc_id`` is ``xxhash64(url)`` — stable across reruns and cluster
  layouts, the same convention the streaming CLI uses for id-less
  input.

``write_wet`` round-trips a documents DataFrame back into the format
(one file per partition via the text sink) — fixture generation and a
bit-exactness audit, not a production exporter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BANNER = "WARC/1.0\n"


def read_wet(spark: SparkSession, path: str,
             id_from_url: bool = True) -> DataFrame:
    """-> (doc_id, url, date, text) from WET-style archives at ``path``.

    Records whose header lacks a target URI (e.g. the warcinfo
    preamble) are dropped. Trailing record separators produce empty
    rows, likewise dropped.
    """
    rec = spark.read.option("lineSep", _BANNER).text(path)
    url = F.regexp_extract("value", r"WARC-Target-URI:\s*(\S+)", 1)
    date = F.regexp_extract("value", r"WARC-Date:\s*(\S+)", 1)
    # body = everything after the first blank line, minus exactly the
    # ONE newline the record framing appends — a body that itself ends
    # with newlines keeps them (round-trip exactness)
    body = F.regexp_replace(
        F.regexp_extract("value", r"(?s)\n\n(.*)$", 1), r"\n$", "")
    out = (
        rec.select(url.alias("url"), date.alias("date"),
                   body.alias("text"))
        .filter(F.col("url") != "")
    )
    if id_from_url:
        out = out.select(F.xxhash64("url").alias("doc_id"), "url",
                         "date", "text")
    return out


def write_wet(docs: DataFrame, path: str, url_col: str = "url",
              text_col: str = "text", date: str = "2026-01-01T00:00:00Z",
              num_files: int = 1) -> None:
    """Serialize (url, text) rows into the WET subset above — the
    deterministic fixture/round-trip writer. The record is assembled as
    one string column and written through the JVM text sink.

    Raises if any text contains the record banner itself: separator-
    based splitting (like real WET tooling that scans for the banner)
    cannot represent such a body, and a silent mangled round-trip is
    worse than a loud refusal."""
    n_bad = docs.filter(F.col(text_col).contains(_BANNER)).count()
    if n_bad:
        raise ValueError(
            f"{n_bad} document(s) contain the record banner "
            f"{_BANNER!r} in {text_col!r}; this container cannot "
            f"represent them")
    rec = F.concat(
        F.lit("WARC-Type: conversion\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit(f"\nWARC-Date: {date}\nContent-Length: "),
        F.length(F.col(text_col).cast("string")).cast("string"),
        F.lit("\n\n"),
        F.col(text_col),
        F.lit("\n"),
    )
    (docs.select(rec.alias("value"))
     .coalesce(num_files)
     .write.mode("overwrite")
     .option("lineSep", _BANNER)
     .text(path))
