"""Deterministic synthetic Common-Crawl-style webtext generator
(FIXTURES.md §2) — the full-shape input per BASELINE.json ``input_hint``:
(url, warc_ts, html, text, lang) with planted near-duplicate clusters and
boilerplate-induced hot shingles.

Everything is seeded; the same (n_base, seed, ...) always produces
byte-identical text per url (the per-row invariant), so tests, the
brute-force oracle, and the bench harness all agree on ground truth.
Generation is pure numpy on the driver for test scales and exposed as a
mapInPandas generator for bench scales (no external data)."""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

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


def _base_text(rng: np.random.Generator, n_words: int) -> list[str]:
    idx = rng.integers(0, len(_WORDS), size=n_words)
    return [_WORDS[i] for i in idx]


def _mutate(rng: np.random.Generator, words: list[str], rate: float) -> list[str]:
    out = list(words)
    n_edit = max(1, int(len(out) * rate))
    pos = rng.integers(0, len(out), size=n_edit)
    sub = rng.integers(0, len(_WORDS), size=n_edit)
    for p, s in zip(pos, sub):
        out[p] = _WORDS[s]
    return out


def generate_webtext(n_base: int = 100, seed: int = 42, max_dups: int = 5,
                     min_words: int = 200, max_words: int = 2000,
                     boilerplate_prob: float = 0.5) -> pd.DataFrame:
    """Returns a pandas DataFrame (url, warc_ts, html, text, lang, base_id).

    base_id is the planted ground-truth cluster seed (docs derived from the
    same base). NOTE: actual dup clusters are defined by Mash-semantics
    similarity at the configured threshold (FIXTURES.md), which the tests
    compute with the brute-force oracle — base_id is only a generator aid.
    """
    rng = np.random.default_rng(seed)
    rows = []
    doc_i = 0
    langs = ["en", "de", "fr"]
    epoch = _dt.datetime(2024, 1, 1)
    for b in range(n_base):
        n_words = int(rng.integers(min_words, max_words + 1))
        base = _base_text(rng, n_words)
        n_dup = int(rng.integers(0, max_dups + 1))
        variants = [base] + [
            _mutate(rng, base, float(rng.uniform(0.005, 0.05))) for _ in range(n_dup)
        ]
        for words in variants:
            text = " ".join(words)
            if rng.random() < boilerplate_prob:
                bp = _BOILERPLATE[int(rng.integers(0, len(_BOILERPLATE)))]
                text = bp + " " + text if rng.random() < 0.5 else text + " " + bp
            url = f"https://site{doc_i % 17}.example/p/{doc_i}"
            rows.append(
                {
                    "url": url,
                    "warc_ts": epoch + _dt.timedelta(seconds=doc_i),
                    "html": ("<html><body>" + text + "</body></html>").encode("utf-8"),
                    "text": text,
                    "lang": langs[doc_i % 3],
                    "base_id": b,
                }
            )
            doc_i += 1
    return pd.DataFrame(rows)


def webtext_spark_df(spark, n_base: int = 100, seed: int = 42, **kw):
    """Spark DataFrame with a stable doc_id (= generation order)."""
    pdf = generate_webtext(n_base=n_base, seed=seed, **kw)
    pdf = pdf.reset_index().rename(columns={"index": "doc_id"})
    return spark.createDataFrame(pdf)
