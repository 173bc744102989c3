"""Stupid Backoff n-gram LM scoring (Brants et al. 2007, "Large
Language Models in Machine Translation" — the web-scale scoring rule
built for exactly this setting: trillions of tokens, no discounting
statistics, mergeable counts only). Public method; extends lm.py's
unigram/bigram scoring toward CCNet's higher-order quality signal.

Scoring rule, order n with backoff factor alpha (0.4 in the paper):

    S(w_i | w_{i-k+1..i-1}) = count(k-gram) / count(prefix)   if seen,
    else alpha * S at order k-1; at the unigram floor the score is
    add-one smoothed ((c+1)/(N+V)) so OOV positions stay finite in
    log space (the paper leaves the floor unspecified).

Spark-first shape:

- models are plain (token, count) relations per order (reuse
  ``lm.unigram_counts(n=k)``) — mergeable counts, no normalization
  step, which is WHY Brants et al. designed the rule this way;
- scoring explodes token POSITIONS once, builds each order's gram and
  prefix strings as JVM array slices (no Python), left-joins the
  n gram tables + (n-1) prefix tables (all broadcastable — vocabulary
  tables, not corpus tables), resolves the highest seen order with one
  CASE cascade, and rolls up per doc with map-side partials. The
  position relation is corpus-sized but transient: generated, joined,
  and aggregated inside one stage, nothing materialized per position.

Contract surface: the per-order hit counts (exact integers — which
order resolved each position). The float log-score is pytest-verified
against numpy (float sums are engine-order-dependent).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ngram_models(train_docs: DataFrame, n: int,
                 text_col: str = "text") -> list[DataFrame]:
    """[counts order 1, ..., counts order n] via lm.unigram_counts."""
    from .lm import unigram_counts

    if not 1 <= n <= 5:
        raise ValueError(f"order must be in 1..5, got {n}")
    return [unigram_counts(train_docs, text_col, n=k)
            for k in range(1, n + 1)]


def stupid_backoff_scores(
    docs: DataFrame,
    models: list[DataFrame],
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_counts: bool = True,
) -> DataFrame:
    """-> (doc_id, n_positions, n_hits_<n>.., n_hits_1, n_oov,
    logscore_per_token).

    ``n_hits_k`` counts positions resolved at order k (the k-gram ending
    there was seen in training and no higher order was); ``n_oov``
    counts unigram misses. Docs with zero tokens produce no row (same
    convention as lm.score_documents).
    """
    n = len(models)
    if n < 1:
        raise ValueError("need at least the unigram model")
    row = models[0].agg(F.sum("count").alias("N"),
                        F.count("*").alias("V")).collect()[0]
    n1, v1 = int(row.N or 0), int(row.V or 0)
    uni_denom = float(max(n1 + v1, 1))
    uni_n = float(max(n1, 1))

    ws = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    idx = F.when(
        F.size(ws) > 0, F.sequence(F.lit(0), F.size(ws) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pos = docs.select(
        F.col(id_col).alias("doc_id"), ws.alias("ws"),
        F.explode(idx).alias("i"),
    )
    # gram_k = the k words ending at i (null when i < k-1);
    # pfx_k = its k-1-word prefix. slice() is 1-based.
    cols = [F.col("doc_id")]
    for k in range(1, n + 1):
        gram = F.array_join(
            F.slice(F.col("ws"), F.col("i") - (k - 1) + 1, k), " ")
        cols.append(
            F.when(F.col("i") >= k - 1, gram).alias(f"gram_{k}"))
        if k >= 2:
            pfx = F.array_join(
                F.slice(F.col("ws"), F.col("i") - (k - 1) + 1, k - 1), " ")
            cols.append(
                F.when(F.col("i") >= k - 1, pfx).alias(f"pfx_{k}"))
    pos = pos.select(*cols)

    def _model(k: int, key: str, cnt: str) -> DataFrame:
        m = models[k - 1].select(F.col("token").alias(key),
                                 F.col("count").alias(cnt))
        return F.broadcast(m) if broadcast_counts else m

    for k in range(1, n + 1):
        pos = pos.join(_model(k, f"gram_{k}", f"c_{k}"), f"gram_{k}", "left")
    for k in range(2, n + 1):
        pos = pos.join(_model(k - 1, f"pfx_{k}", f"cp_{k}"), f"pfx_{k}", "left")

    # resolve the highest seen order; CASE short-circuits top-down
    resolved = F.lit(0)
    score = F.lit(math.log(1.0 / uni_denom) + (n - 1) * math.log(alpha))
    for k in range(1, n + 1):
        seen = F.col(f"c_{k}").isNotNull()
        if k == 1:
            s = F.log((F.col("c_1") + 1) / F.lit(uni_denom)) \
                + F.lit((n - 1) * math.log(alpha))
        else:
            # prefix count is non-null whenever the gram is (training
            # counts come from the same corpus), but coalesce keeps the
            # expression total for caller-supplied foreign models
            s = F.log(F.col(f"c_{k}") /
                      F.coalesce(F.col(f"cp_{k}"), F.col(f"c_{k}"))) \
                + F.lit((n - k) * math.log(alpha))
        resolved = F.when(seen, F.lit(k)).otherwise(resolved)
        score = F.when(seen, s).otherwise(score)
    # note uni_n is deliberately unused in the floor: the add-one
    # (c+1)/(N+V) form keeps seen and unseen unigrams on one scale
    del uni_n

    pos = pos.select("doc_id", resolved.alias("res"), score.alias("s"))
    aggs = [F.count("*").alias("n_positions")]
    for k in range(n, 0, -1):
        aggs.append(F.sum((F.col("res") == k).cast("long"))
                    .alias(f"n_hits_{k}"))
    aggs.append(F.sum((F.col("res") == 0).cast("long")).alias("n_oov"))
    aggs.append((F.sum("s") / F.count("*")).alias("logscore_per_token"))
    return pos.groupBy("doc_id").agg(*aggs)
