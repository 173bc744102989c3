"""Unigram language-model scoring — the CCNet-style corpus-quality
signal: train token statistics on a reference corpus, score every
candidate document against them, filter/route on the score. (CCNet uses
a 5-gram KenLM; the unigram variant keeps the identical two-phase
Spark shape — distributed count training, broadcast-or-shuffle scoring
join — with a model that needs no external artifacts.)

Spark-first shape, both phases shuffle-lean:

- TRAIN (``unigram_counts``): explode tokens -> groupBy(token).count.
  Map-side partial aggregation collapses hot tokens ("the" at 10^10
  occurrences) to one partial row per map task before the shuffle, so
  the shuffle moves O(distinct tokens x tasks), not O(tokens).
- SCORE (``score_documents``): per-doc token multiplicities FIRST
  (groupBy(doc_id, token) — again map-side partial), then one join
  against the counts relation, then a per-doc rollup. Pre-aggregating
  by (doc, token) bounds the join's left side by each doc's DISTINCT
  vocabulary, and AQE's skew-join split handles the residual hot-token
  imbalance. For a reference vocabulary that fits an executor
  (typically: millions of tokens), pass ``broadcast_counts=True`` and
  the join is map-only.

Integer outputs (n_tokens, n_invocab, sum_count) are exact and
order-independent — the oracle-checked contract surface. The double
``logprob_per_token`` (add-one smoothing over the trained vocab) is the
model score for real use; its float sum is order-dependent across
engines, so it is pytest-verified against numpy rather than
hash-compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(df: DataFrame, text_col: str, n: int = 1) -> DataFrame:
    """Lowercased whitespace n-gram terms (n=1: tokens, n=2: bigrams
    joined with a space, ...), one row per occurrence. The n-gram
    construction is a JVM array transform over the split — still
    map-only, no Python."""
    ws = F.filter(F.split(F.lower(F.col(text_col)), " "),
                  lambda x: x != "")
    if n == 1:
        terms = ws
    else:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, (i + j + 1).cast("int"))
                       for j in range(n)]),
        )
        # CASE short-circuits per row: sequence() never sees a negative
        # stop for docs shorter than n grams
        terms = F.when(F.size(ws) >= n, grams).otherwise(
            F.array().cast("array<string>"))
    tok = F.explode(terms).alias("token")
    return df.select("*", tok)


def unigram_counts(docs: DataFrame, text_col: str = "text",
                   n: int = 1) -> DataFrame:
    """(token, count) over the training corpus — the model. ``n`` > 1
    trains an n-gram model (same shape: one wide->narrow explode + one
    map-side-partial groupBy; the distinct-term space grows with n, but
    so does the signal — bigrams are the CCNet-ish register signal)."""
    return (
        _tokens(docs.select(text_col), text_col, n)
        .groupBy("token")
        .agg(F.count("*").alias("count"))
    )


def score_documents(
    docs: DataFrame,
    counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_counts: bool = False,
    n: int = 1,
) -> DataFrame:
    """Score ``docs`` against a trained ``counts`` model (pass the same
    ``n`` the model was trained with).

    Per doc: ``n_tokens`` (total term occurrences), ``n_invocab``
    (occurrences whose term the model knows), ``sum_count`` (sum of
    model counts over occurrences — high for common-register text), and
    ``logprob_per_token`` (add-one-smoothed log-likelihood per term;
    OOV terms contribute log(1/(N+V))). Higher logprob = closer to the
    training register; filter or stratify on it.
    """
    model = counts
    if broadcast_counts:
        model = F.broadcast(model)
    totals = counts.agg(
        F.sum("count").alias("n_total"),
        F.count("*").alias("v_size"),
    ).collect()[0]
    n_total, v = int(totals.n_total or 0), int(totals.v_size or 0)
    denom = float(n_total + v)
    per_tok = (
        _tokens(docs.select(id_col, text_col), text_col, n)
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("occ"))
        .join(model, "token", "left")
    )
    smoothed = F.log((F.coalesce(F.col("count"), F.lit(0)) + 1) / denom)
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.sum("occ").alias("n_tokens"),
            F.sum(F.when(F.col("count").isNotNull(), F.col("occ"))
                  .otherwise(0)).alias("n_invocab"),
            F.sum(F.coalesce(F.col("count"), F.lit(0)) * F.col("occ"))
            .alias("sum_count"),
            (F.sum(smoothed * F.col("occ")) / F.sum("occ"))
            .alias("logprob_per_token"),
        )
    )
