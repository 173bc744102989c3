"""Text-analysis operators for training-data pipelines — token counting,
quality scoring, language ID, document fingerprinting, shingle
cardinality. All JVM-side column expressions where possible (whole-stage
codegen); the only Python is the exact-distinct-shingle counter, which is
a vectorized Arrow UDF sharing the murmur core.

These are first-class ``queries()`` operators (task brief: "operations a
large-scale training-data pipeline would need"), each with a DuckDB-SQL
oracle in ``__spark_entry__.oracle_sql`` where expressible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from .hashing import hash_shingles_concat

PUNCT = ".,!?;:"
_STOPWORDS = ["the", "of", "and", "to", "in", "a", "is", "that", "this", "with"]


def token_count(col):
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


# GPT-2-family pre-tokenizer classes, restricted to constructs shared by
# Java regex (Spark) and RE2 (DuckDB oracle): letter runs, digit runs,
# symbol runs. The real GPT-2 split adds contraction suffixes and a
# trailing-space lookahead — RE2 has no lookahead, and for token
# COUNTING the class runs are the load-bearing part (a letters+digits+
# symbols run count tracks BPE token counts within a few percent on
# webtext, which is what a pipeline's length/cost filters consume).
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(col):
    """BPE-ish token count: number of letter/digit/symbol runs. Pure
    codegen (regexp_extract_all + size) — map-only at any scale."""
    n = F.size(F.regexp_extract_all(col, F.lit(BPE_SPLIT_RE), 0))
    # size(null array) is -1; blank text has zero runs
    return F.when(col.isNull(), F.lit(0)).otherwise(n).cast("long")


def punct_count(col):
    """Occurrences of .,!?;: — via translate so the same expression is
    valid in the DuckDB oracle."""
    return (F.length(col) - F.length(F.translate(col, PUNCT, ""))).cast("long")


def digit_ratio(col):
    return (F.length(col) - F.length(F.regexp_replace(col, "[0-9]", ""))) / F.greatest(
        F.length(col), F.lit(1)
    )


def stopword_count(col):
    """Total occurrences of a fixed 10-word English stopword list as
    whole words (language-ID heuristic feature)."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    total = F.lit(0).cast("long")
    for w in _STOPWORDS:
        pat = f" {w} "
        # non-overlapping occurrence count; whole-word via space padding
        total = total + (
            (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit(""))))
            / len(pat)
        ).cast("long")
    return total


def quality_features(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token count, punctuation count, digit
    ratio, stopword density, mean token length."""
    c = F.col(text_col)
    toks = token_count(c)
    return df.select(
        F.col(id_col),
        F.length(c).cast("long").alias("n_chars_obs"),
        toks.alias("n_tokens"),
        punct_count(c).alias("n_punct"),
        F.round(digit_ratio(c), 6).alias("digit_ratio"),
        stopword_count(c).alias("n_stopwords"),
        F.round(
            (F.length(F.regexp_replace(c, r"\s+", "")) / F.greatest(toks, F.lit(1))), 6
        ).alias("mean_token_len"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Tiny stopword-vote language classifier (en/de/fr heuristic).

    Real language ID is a model; this is the n-gram/stopword heuristic tier
    used as a cheap pre-filter in webtext pipelines. Pure column exprs.
    """
    votes = {
        "en": ["the", "and", "of", "to", "is"],
        "de": ["der", "die", "und", "das", "ist"],
        "fr": ["le", "la", "et", "les", "des"],
    }
    c = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    score_cols = []
    for lang, words in votes.items():
        s = F.lit(0).cast("long")
        for w in words:
            pat = f" {w} "
            s = s + (
                (F.length(c) - F.length(F.replace(c, F.lit(pat), F.lit("")))) / len(pat)
            ).cast("long")
        score_cols.append(s.alias(f"score_{lang}"))
    scored = df.select(F.col(id_col), F.col(text_col), *score_cols)
    best = F.greatest(*[F.col(f"score_{l}") for l in votes])
    pred = (
        F.when(best == 0, F.lit("und"))
        .when(F.col("score_en") == best, F.lit("en"))
        .when(F.col("score_de") == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return scored.select(F.col(id_col), pred.alias("lang_pred"))


@pandas_udf(LongType())
def distinct_shingles_udf(texts: pd.Series, k_ser: pd.Series) -> pd.Series:
    """Exact distinct byte-k-gram count per doc (A5 exact variant).

    Vectorized: one murmur pass over the batch's concatenated bytes, then
    per-doc np.unique on 64-bit hashes (collision probability negligible
    and identical to how the sketcher sees shingles)."""
    k = int(k_ser.iloc[0])
    bufs = [np.frombuffer(str(t).encode("utf-8"), dtype=np.uint8) for t in texts.fillna("")]
    lens = [len(b) for b in bufs]
    big = np.concatenate(bufs) if bufs else np.empty(0, dtype=np.uint8)
    all_h = hash_shingles_concat(big, k, 42)
    out = np.zeros(len(bufs), dtype=np.int64)
    off = 0
    for i, blen in enumerate(lens):
        if blen >= k:
            nk = blen - k + 1
            out[i] = len(np.unique(all_h[off : off + nk]))
        off += blen
    return pd.Series(out)


def shingle_cardinality(df: DataFrame, k: int = 21, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    return df.select(
        F.col(id_col),
        distinct_shingles_udf(F.col(text_col), F.lit(k)).alias("n_shingles"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """64-bit document content fingerprint (exact-dedup grouping key).

    ``xxhash64`` — a JVM built-in inside whole-stage codegen — replaces
    the former murmur3 pandas UDF: a content key only needs a collision-
    resistant hash, not the Mash hash, and the built-in is ~100x cheaper
    (no Arrow round-trip, no per-row Python). Anything needing Mash's
    murmur3 semantics goes through ``sketch.py``."""
    return df.select(F.col(id_col), F.xxhash64(F.col(text_col)).alias("fp64"))


def hashing_tf_vectors(docs: DataFrame, dim: int = 256,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Text -> L2-normalized hashing-TF document vector (array<float>):
    the in-engine bridge from the text path to the embedding path
    (ANN / semantic dedup) when no model embeddings exist — the
    HashingVectorizer pattern, entirely JVM-side via MLlib's HashingTF
    (murmur3-32 term bucketing, no vocabulary state, so the map is
    identical on every executor and every corpus — exactly what a
    10^12-doc pipeline needs; no fit step, no driver-held dictionary).

    Output: (id_col, embedding array<float>), zero vectors for empty
    text kept as zeros (cosine guards live in the consumers).
    """
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda x: x != "",
        ).alias("_toks"),
    )
    tf = HashingTF(inputCol="_toks", outputCol="_tf", numFeatures=dim)
    vec = tf.transform(toks).select(
        id_col, vector_to_array(F.col("_tf")).alias("_arr")
    )
    norm = F.sqrt(F.aggregate("_arr", F.lit(0.0), lambda a, x: a + x * x))
    return vec.select(
        F.col(id_col),
        F.transform(
            "_arr",
            lambda x: (x / F.when(norm > 0.0, norm).otherwise(F.lit(1.0)))
            .cast("float"),
        ).alias("embedding"),
    )
