"""WARC container ingestion: Common-Crawl response archives (binary
HTML payloads) -> a pages DataFrame with the brief's input shape
(url, warc_ts, html binary). The raw-crawl sibling of ``wet.py``'s
text-only reader. (Reference analog: the FASTA/FASTQ scanners — the
reference's "many records per file" binary-safe container loop.)

Format (the WARC/1.0 subset this reads/writes):

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: <url>\\r\\n
    WARC-Date: <iso8601>\\r\\n
    Content-Length: <payload bytes>\\r\\n
    \\r\\n
    HTTP/1.1 200 OK\\r\\n...\\r\\n\\r\\n<html bytes>   (the payload)
    \\r\\n\\r\\n

Spark-first shape and its honest limits:

- WET records are plain text, so ``wet.py`` splits them INSIDE the JVM
  text source. WARC payloads are arbitrary bytes (the record banner
  may legitimately occur inside an HTML body), so separator splitting
  is WRONG here — records must be walked by Content-Length. The unit
  of parallelism is therefore the FILE: ``spark.read.format
  ("binaryFile")`` -> one Arrow ``mapInPandas`` pass that walks each
  archive's records byte-exactly. This is the same file-at-a-time
  grain every production WARC reader uses (real Common Crawl archives
  are ~1 GiB gzip members; a crawl segment has 10^4-10^5 of them, so
  a 1000-executor cluster is saturated by file count, not intra-file
  splits).
- Gzip is handled transparently (multi-member streams — the actual
  Common Crawl layout, one gzip member per record — decompress in one
  call), so ``.warc`` and ``.warc.gz`` both read.
- HTTP response headers are stripped from the payload when present
  (payload starts with ``HTTP/``), yielding the HTML bytes themselves;
  chunked transfer encodings are NOT re-assembled (Common Crawl
  archives store identity bodies) — documented, not silently assumed.
- ``doc_id`` is ``xxhash64(url)`` — stable across reruns and cluster
  layouts, the same convention as ``wet.read_wet``.

``write_warc`` is the deterministic fixture/round-trip writer (driver-
side iterator, NOT a production exporter — same scope note as
``wet.write_wet``); it emits a warcinfo preamble plus one response
record per row so the reader's skip/strip paths are exercised.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BANNER = b"WARC/1.0\r\n"
_HDR_END = b"\r\n\r\n"

_SCHEMA = ("url string, warc_ts timestamp, rec_type string, "
           "content_length long, html binary")


def _records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Walk one archive's (headers, payload) records byte-exactly by
    Content-Length — never by searching payloads for the banner."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # multi-member streams supported
    i = 0
    n = len(data)
    while i < n:
        j = data.find(_BANNER, i)
        if j < 0:
            break
        hdr_end = data.find(_HDR_END, j)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[j + len(_BANNER):hdr_end].split(b"\r\n"):
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace"))
        clen_raw = headers.get("content-length")
        try:
            clen = int(clen_raw) if clen_raw is not None else None
        except ValueError:
            clen = None
        if clen is None or clen < 0:
            # A record without a parseable Content-Length has no knowable
            # payload boundary. Resyncing by banner search would violate
            # the module guarantee above (payload bytes containing the
            # banner would be mis-framed as a new record), so the rest of
            # this member is dropped at the malformed record instead.
            break
        body_start = hdr_end + len(_HDR_END)
        yield headers, data[body_start:body_start + clen]
        i = body_start + clen


def _strip_http(payload: bytes) -> bytes:
    """Drop HTTP response headers when the payload carries them."""
    if payload.startswith(b"HTTP/"):
        k = payload.find(_HDR_END)
        if k >= 0:
            return payload[k + len(_HDR_END):]
    return payload


def _parse_archives(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls, tss, types, lens, htmls = [], [], [], [], []
        for content in pdf["content"]:
            for headers, payload in _records(bytes(content)):
                rec_type = headers.get("warc-type", "")
                url = headers.get("warc-target-uri", "")
                if not url:
                    continue  # warcinfo / metadata preamble records
                urls.append(url)
                tss.append(headers.get("warc-date"))
                types.append(rec_type)
                lens.append(len(payload))
                htmls.append(_strip_http(payload)
                             if rec_type == "response" else payload)
        ts = pd.to_datetime(pd.Series(tss, dtype="object"),
                            utc=True, errors="coerce")
        yield pd.DataFrame({
            "url": pd.Series(urls, dtype="object"),
            "warc_ts": ts.dt.tz_convert(None),
            "rec_type": pd.Series(types, dtype="object"),
            "content_length": pd.Series(lens, dtype="int64"),
            "html": pd.Series(htmls, dtype="object"),
        })


def read_warc(spark: SparkSession, path: str,
              id_from_url: bool = True,
              responses_only: bool = True) -> DataFrame:
    """-> (doc_id?, url, warc_ts, rec_type, content_length, html) from
    WARC archives at ``path`` (plain or gzipped). URI-less records
    (warcinfo preambles) are dropped; ``responses_only`` further keeps
    only WARC-Type: response records (the crawl pages)."""
    files = spark.read.format("binaryFile").load(path)
    out = files.select("content").mapInPandas(_parse_archives, _SCHEMA)
    if responses_only:
        out = out.filter(F.col("rec_type") == "response")
    if id_from_url:
        out = out.select(F.xxhash64("url").alias("doc_id"), "url",
                         "warc_ts", "rec_type", "content_length", "html")
    return out


def make_warc_bytes(rows: Iterable[tuple[str, str, bytes]],
                    compress: bool = False) -> bytes:
    """Serialize (url, iso_date, html_bytes) rows into one archive:
    a warcinfo preamble + one HTTP-wrapped response record per row.
    ``compress=True`` gzips each record as its own member — the real
    Common Crawl layout."""
    out = io.BytesIO()

    def emit(rec: bytes) -> None:
        out.write(gzip.compress(rec) if compress else rec)

    info_body = b"software: mashspark\r\n"
    emit(_BANNER
         + b"WARC-Type: warcinfo\r\n"
         + b"Content-Length: %d\r\n" % len(info_body)
         + b"\r\n" + info_body + b"\r\n\r\n")
    for url, date, html in rows:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + html)
        hdr = (_BANNER
               + b"WARC-Type: response\r\n"
               + b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
               + b"WARC-Date: " + date.encode("ascii") + b"\r\n"
               + b"Content-Length: %d\r\n" % len(http)
               + b"\r\n")
        emit(hdr + http + b"\r\n\r\n")
    return out.getvalue()


def write_warc(docs: DataFrame, path: str, url_col: str = "url",
               html_col: str = "html",
               date: str = "2026-01-01T00:00:00Z",
               num_files: int = 1, compress: bool = False) -> None:
    """Fixture/round-trip writer: partition rows round-robin into
    ``num_files`` archives under ``path``. Driver-side iterator by
    design — fixture generation and a bit-exactness audit, not a
    production exporter (a production WARC writer is a crawler's job,
    not an analytics engine's)."""
    os.makedirs(path, exist_ok=True)
    buckets: list[list[tuple[str, str, bytes]]] = [[] for _ in range(num_files)]
    for i, row in enumerate(docs.select(url_col, html_col).toLocalIterator()):
        html = row[html_col]
        buckets[i % num_files].append(
            (row[url_col], date,
             bytes(html) if html is not None else b""))
    ext = "warc.gz" if compress else "warc"
    for i, rows in enumerate(buckets):
        with open(os.path.join(path, f"part-{i:05d}.{ext}"), "wb") as f:
            f.write(make_warc_bytes(rows, compress=compress))
