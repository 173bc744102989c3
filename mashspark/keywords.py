"""TF-IDF / BM25 keyword extraction — per-document salient terms over a
web corpus (topic tagging, index keys, clustering features).

Spark-first, three shuffle-lean phases sharing one tokenization:

1. per-doc term frequencies: groupBy(doc_id, token) with map-side
   partial aggregation (the explode never leaves the map task at full
   occurrence volume);
2. document frequencies: groupBy(token) over the DISTINCT (doc, token)
   relation from phase 1 — reuses the pre-aggregated rows, so the df
   shuffle moves per-doc vocabularies, not occurrences;
3. score + top-k per doc: one join (df relation is model-sized, so it
   broadcasts) and a row_number window that Spark executes with
   WindowGroupLimit — map-side partial top-k per doc before the final
   shuffle.

Scoring (standard smoothed variants, all exact closed forms per row):

- tf-idf: ``tf * ln((N + 1) / (df + 1))``
- bm25:   ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avglen))`` with
  ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (Robertson/Sparck Jones)

The ranking (top-k per doc) is the contract surface — rank comparisons
are stable across engines because ties break on the token string, and
the scores themselves are single closed-form expressions (bit-identical
IEEE ops both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def term_freqs(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, token, tf): lowercased whitespace terms, map-side
    partially aggregated before the (doc, token) shuffle."""
    tok = F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token")
    return (
        docs.select(id_col, tok)
        .filter(F.col("token") != "")
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )


def doc_freqs(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(token, df) from the pre-aggregated term-frequency relation."""
    return tf.groupBy("token").agg(
        F.count(id_col).cast("long").alias("df"))


def top_terms(
    docs: DataFrame,
    k: int = 5,
    scheme: str = "tfidf",
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k salient terms per document under ``scheme`` ('tfidf' or
    'bm25'). Returns (doc_id, token, tf, df, score, term_rank)."""
    if scheme not in ("tfidf", "bm25"):
        raise ValueError(f"unknown scheme {scheme!r}")
    tf = term_freqs(docs, text_col, id_col)
    n_docs = docs.select(id_col).distinct().count()
    dfs = doc_freqs(tf, id_col)
    scored = tf.join(F.broadcast(dfs), "token")
    if scheme == "tfidf":
        score = F.col("tf") * F.log(
            (F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
    else:
        doclen = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
        avgdl = float(
            doclen.agg(F.avg("dl")).collect()[0][0] or 1.0)
        scored = scored.join(doclen, id_col)
        idf = F.log(
            1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5))
        score = idf * (F.col("tf") * (k1 + 1.0)) / (
            F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    w = Window.partitionBy(id_col).orderBy(
        score.desc(), F.col("token").asc())
    return (
        scored.withColumn("score", score)
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "token", "tf", "df", "score", "term_rank")
    )
