"""Deterministic synthetic Common-Crawl-style webtext generator
(FIXTURES.md §2) — the full-shape input per BASELINE.json ``input_hint``:
(url, warc_ts, html, text, lang) with planted near-duplicate clusters and
boilerplate-induced hot shingles.

Generation is **per-base deterministic**: every document's bytes are a
pure function of (seed, base_id, variant), so the driver-side pandas path
(tests) and the distributed mapInPandas path (bench, arbitrary
partitioning) produce byte-identical text per url — the per-row invariant
the input_hint demands — and the corpus can be regenerated at any
parallelism without external data.

doc_id layout: ``base_id * (MAX_VARIANTS+1) + variant`` (gaps where a base
has fewer variants). Number of variants per base cycles deterministically
0..MAX_DUPS so the expected cluster structure is known in closed form.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

MAX_DUPS = 5
_STRIDE = MAX_DUPS + 1

_WORDS = [
    "the", "of", "and", "to", "in", "page", "site", "web", "data", "time",
    "news", "home", "user", "post", "link", "read", "more", "about", "this",
    "that", "with", "from", "have", "will", "your", "free", "best", "new",
    "online", "service", "search", "world", "report", "market", "today",
    "system", "public", "price", "share", "value", "story", "article",
    "content", "review", "guide", "travel", "health", "money", "sport",
    "music", "video", "photo", "game", "food", "city", "state", "school",
    "house", "phone", "email", "click", "terms", "policy", "account",
]

_BOILERPLATE = [
    "copyright all rights reserved terms of service privacy policy contact us",
    "subscribe to our newsletter for the latest updates and exclusive offers",
    "this website uses cookies to ensure you get the best experience",
    "share this article on facebook twitter linkedin pinterest email",
    "sign in register home news sports entertainment business technology",
]

_LANGS = ["en", "de", "fr"]
_EPOCH = _dt.datetime(2024, 1, 1)


def _base_rng(seed: int, base_id: int) -> np.random.Generator:
    return np.random.default_rng(np.uint64(seed) * np.uint64(0x9E3779B9) + np.uint64(base_id))


def gen_base_docs(base_id: int, seed: int = 42, min_words: int = 200,
                  max_words: int = 2000, boilerplate_prob: float = 0.5,
                  dup_prob: float = 1.0) -> list[dict]:
    """All documents (base + near-dup variants) of one base cluster.

    dup_prob: probability a base has any near-dup variants at all (1.0 =
    every base draws 0..MAX_DUPS variants; lower values model realistic
    web corpora where most pages are unique)."""
    rng = _base_rng(seed, base_id)
    n_words = int(rng.integers(min_words, max_words + 1))
    widx = rng.integers(0, len(_WORDS), size=n_words)
    n_dup = int(rng.integers(0, MAX_DUPS + 1))
    if rng.random() >= dup_prob:
        n_dup = 0
    rows = []
    for variant in range(n_dup + 1):
        words = [_WORDS[i] for i in widx]
        if variant > 0:
            vrng = np.random.default_rng(
                np.uint64(seed) * np.uint64(0x85EBCA6B)
                + np.uint64(base_id) * np.uint64(_STRIDE)
                + np.uint64(variant)
            )
            rate = float(vrng.uniform(0.005, 0.05))
            n_edit = max(1, int(n_words * rate))
            pos = vrng.integers(0, n_words, size=n_edit)
            sub = vrng.integers(0, len(_WORDS), size=n_edit)
            for p, s in zip(pos, sub):
                words[p] = _WORDS[s]
        else:
            vrng = np.random.default_rng(
                np.uint64(seed) * np.uint64(0x85EBCA6B)
                + np.uint64(base_id) * np.uint64(_STRIDE)
            )
        text = " ".join(words)
        r = vrng.random(2)
        if r[0] < boilerplate_prob:
            bp = _BOILERPLATE[int(vrng.integers(0, len(_BOILERPLATE)))]
            text = bp + " " + text if r[1] < 0.5 else text + " " + bp
        doc_id = base_id * _STRIDE + variant
        rows.append(
            {
                "doc_id": doc_id,
                "url": f"https://site{doc_id % 17}.example/p/{doc_id}",
                "warc_ts": _EPOCH + _dt.timedelta(seconds=doc_id),
                "html": ("<html><body>" + text + "</body></html>").encode("utf-8"),
                "text": text,
                "lang": _LANGS[doc_id % 3],
                "base_id": base_id,
            }
        )
    return rows


def generate_webtext(n_base: int = 100, seed: int = 42, **kw) -> pd.DataFrame:
    """Driver-side pandas path (tests / small fixtures)."""
    rows = []
    for b in range(n_base):
        rows.extend(gen_base_docs(b, seed=seed, **kw))
    return pd.DataFrame(rows)


def webtext_spark_df(spark, n_base: int = 100, seed: int = 42, **kw):
    """Small-scale Spark DataFrame (driver-generated)."""
    return spark.createDataFrame(generate_webtext(n_base=n_base, seed=seed, **kw))


def webtext_spark_distributed(spark, n_base: int, seed: int = 42,
                              num_partitions: int | None = None, **kw):
    """Distributed generator: base ids fan out over executors via
    mapInPandas; byte-identical to the pandas path per doc_id regardless
    of partitioning."""
    from pyspark.sql.types import (BinaryType, LongType, StringType,
                                   StructField, StructType, TimestampType)

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), False),
            StructField("text", StringType(), False),
            StructField("lang", StringType(), False),
            StructField("base_id", LongType(), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for b in pdf["id"]:
                rows.extend(gen_base_docs(int(b), seed=seed, **kw))
            yield pd.DataFrame(rows)[[f.name for f in schema.fields]]

    rng = spark.range(n_base, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema)
