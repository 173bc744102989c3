"""WET-style container connector (mashspark/wet.py): round-trip
fidelity, multi-line bodies, preamble handling, JVM-side splitting."""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from mashspark.webtext import webtext_spark_df
from mashspark.wet import read_wet, write_wet


def test_roundtrip_fixture(spark, tmp_path):
    docs = webtext_spark_df(spark, n_base=40, seed=13).select("url", "text")
    path = str(tmp_path / "wet")
    write_wet(docs, path, num_files=3)
    back = read_wet(spark, path)
    assert back.count() == docs.count()
    joined = docs.alias("a").join(back.alias("b"), "url")
    assert joined.count() == docs.count()
    assert joined.filter("a.text <> b.text").count() == 0
    # stable ids: xxhash64(url)
    bad = back.filter(F.col("doc_id") != F.xxhash64("url")).count()
    assert bad == 0


def test_multiline_bodies_and_inner_blank_lines(spark, tmp_path):
    rows = [
        ("http://a.example/1", "first line\nsecond line\n\nafter a blank"),
        ("http://a.example/2", "single"),
        ("http://a.example/3", "ends mid\nline two"),
    ]
    docs = spark.createDataFrame(rows, "url string, text string")
    path = str(tmp_path / "wet2")
    write_wet(docs, path)
    got = {r.url: r.text for r in read_wet(spark, path).collect()}
    assert got == dict(rows)


def test_warcinfo_preamble_and_leading_banner_dropped(spark, tmp_path):
    raw = (
        "WARC/1.0\n"
        "WARC-Type: warcinfo\n"
        "Content-Length: 4\n"
        "\n"
        "info\n"
        "WARC/1.0\n"
        "WARC-Type: conversion\n"
        "WARC-Target-URI: http://x.example/p\n"
        "WARC-Date: 2026-01-01T00:00:00Z\n"
        "Content-Length: 11\n"
        "\n"
        "hello world\n"
    )
    d = tmp_path / "raw"
    d.mkdir()
    (d / "part.wet").write_text(raw)
    rows = read_wet(spark, str(d)).collect()
    assert len(rows) == 1
    assert rows[0].url == "http://x.example/p"
    assert rows[0].text == "hello world"
    assert rows[0].date == "2026-01-01T00:00:00Z"


def test_record_split_is_jvm_side(spark, tmp_path):
    """Plan guard: the whole read is scan + codegen projections — no
    Python stage anywhere in the connector."""
    docs = webtext_spark_df(spark, n_base=5, seed=3).select("url", "text")
    path = str(tmp_path / "wet3")
    write_wet(docs, path)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        read_wet(spark, path).explain("formatted")
    plan = buf.getvalue()
    assert "Python" not in plan and "Arrow" not in plan, plan
    assert "Exchange" not in plan, plan  # map-only
