"""WARC binary container connector (mashspark/warc.py): byte-exact
record walking, gzip members, HTTP-header strip, round-trip parity."""

import datetime
import gzip

import pytest
from pyspark.sql import functions as F

from mashspark.warc import (
    _records,
    _strip_http,
    make_warc_bytes,
    read_warc,
    write_warc,
)

_ROWS = [
    ("https://a.example/page1", "2026-02-03T04:05:06Z",
     b"<html><body>hello page one</body></html>"),
    ("https://b.example/page2", "2026-02-03T04:05:07Z",
     b"<html>WARC/1.0\r\nbanner INSIDE body must survive</html>"),
    ("https://c.example/page3", "2026-02-03T04:05:08Z",
     b"\x00\x01\xfe\xffraw non-utf8 bytes \x80\x81"),
    ("https://d.example/empty", "2026-02-03T04:05:09Z", b""),
]


def test_records_walk_by_content_length_not_banner_search():
    data = make_warc_bytes(_ROWS)
    recs = list(_records(data))
    # warcinfo + 4 responses; the banner embedded in page2's body did
    # NOT split a record because walking is Content-Length-based
    assert len(recs) == 5
    assert recs[0][0]["warc-type"] == "warcinfo"
    bodies = [_strip_http(p) for h, p in recs[1:]]
    assert bodies == [r[2] for r in _ROWS]


def test_gzip_multimember_roundtrip():
    data = make_warc_bytes(_ROWS, compress=True)
    # it really is a multi-member gzip stream, and decompresses whole
    assert data[:2] == b"\x1f\x8b"
    assert gzip.decompress(data) == make_warc_bytes(_ROWS)
    recs = list(_records(data))
    assert len(recs) == 5


def test_read_warc_spark_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(u, h) for u, _, h in _ROWS], "url string, html binary")
    path = str(tmp_path / "archive")
    write_warc(docs, path, date="2026-02-03T04:05:06Z", num_files=2,
               compress=True)
    got = read_warc(spark, path)
    rows = {r["url"]: r for r in got.collect()}
    assert set(rows) == {u for u, _, _ in _ROWS}
    for u, _, h in _ROWS:
        r = rows[u]
        assert bytes(r["html"]) == h, u
        assert r["rec_type"] == "response"
        assert r["warc_ts"] == datetime.datetime(2026, 2, 3, 4, 5, 6)
        assert r["doc_id"] is not None
    # content_length covers the HTTP header wrapper too
    assert all(r["content_length"] > len(dict((u, h) for u, _, h in _ROWS)[u])
               for u, r in rows.items() if u != "https://d.example/empty")


def test_read_warc_drops_warcinfo_and_keeps_responses_only(spark, tmp_path):
    docs = spark.createDataFrame(
        [(u, h) for u, _, h in _ROWS], "url string, html binary")
    path = str(tmp_path / "plain")
    write_warc(docs, path, num_files=1)
    all_recs = read_warc(spark, path, responses_only=False)
    assert all_recs.count() == 4  # warcinfo has no URI -> dropped anyway
    assert read_warc(spark, path).count() == 4


def test_read_warc_feeds_extract_pipeline(spark, tmp_path):
    """The brief's input shape end-to-end: WARC -> (url, warc_ts,
    html binary) -> extract html_to_text -> text column."""
    from mashspark.extract import extracted_text

    docs = spark.createDataFrame(
        [("https://e.example/x",
          b"<html><head><script>var a=1;</script></head>"
          b"<body><p>real text here</p></body></html>")],
        "url string, html binary")
    path = str(tmp_path / "feed")
    write_warc(docs, path)
    pages = read_warc(spark, path).select(
        "url", "warc_ts",
        F.col("html").cast("string").alias("html_str"))
    out = pages.select("url", extracted_text(F.col("html_str")).alias("text"))
    assert out.collect()[0]["text"] == "real text here"


def test_truncated_archive_yields_complete_records_only():
    data = make_warc_bytes(_ROWS)
    # cut mid-payload of the last record: the walker must not emit a
    # phantom row for bytes it cannot frame
    cut = data[: data.rfind(b"raw non-utf8")]
    recs = list(_records(cut))
    assert 3 <= len(recs) <= 4  # warcinfo + first two full responses (+ partial dropped or short)
    bodies = [_strip_http(p) for h, p in recs[1:3]]
    assert bodies == [r[2] for r in _ROWS[:2]]
