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


def perplexity_buckets(
    scored: DataFrame,
    score_col: str = "logprob_per_token",
    n_buckets: int = 3,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """CCNet-style corpus routing: split the scored corpus into
    ``n_buckets`` quality tiers by the LM score (CCNet partitions each
    language into head/middle/tail perplexity terciles and trains on
    the head). Returns ``scored`` plus an int ``bucket`` column —
    0 = head (highest score / lowest perplexity), ``n_buckets-1`` =
    tail; a NULL score lands in the tail.

    Scale shape (the reason this is NOT ``ntile()``): a global window
    rank would single-partition the whole corpus through one task. We
    instead compute the n-1 quantile cutoffs with ONE tiny aggregate
    (``percentile_approx`` t-digest by default — O(accuracy) state per
    partial, mergeable, the 10^12-doc path; ``exact=True`` switches to
    exact ``percentile`` for small/test corpora), collect the n-1
    doubles to the driver, and assign buckets as a map-only literal
    comparison chain — no shuffle, no window, embarrassingly parallel.

    Degenerate inputs are well-defined: if all scores are equal every
    cutoff equals that score and every doc lands in bucket 0.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    col = F.col(score_col).cast("double")
    if exact:
        agg = F.percentile(col, F.lit(probs))
    else:
        agg = F.percentile_approx(col, F.lit(probs), F.lit(accuracy))
    cuts = scored.agg(agg.alias("cuts")).collect()[0]["cuts"]
    if cuts is None or any(c is None for c in cuts):
        # empty input: no cutoffs; everything (nothing) is tail
        return scored.withColumn(
            "bucket", F.lit(n_buckets - 1).cast("int"))
    # cuts ascending: cuts[j] = quantile((j+1)/n). First-match-wins
    # when-chain from the highest cutoff down: score >= q((n-1)/n) ->
    # bucket 0, ..., below q(1/n) (or NULL) -> bucket n-1.
    expr = F.when(col >= F.lit(float(cuts[-1])), F.lit(0))
    for rank, c in enumerate(reversed(cuts[:-1]), start=1):
        expr = expr.when(col >= F.lit(float(c)), F.lit(rank))
    expr = expr.otherwise(F.lit(n_buckets - 1))
    return scored.withColumn("bucket", expr.cast("int"))


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
