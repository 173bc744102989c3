"""DSIR-style importance resampling: select training documents whose
n-gram distribution looks like a TARGET corpus rather than the raw
SOURCE pool (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023 — public method; no reference-code
analog, this is a training-data pipeline operator beyond marbl/Mash).

Two stages, both shuffle-lean:

1. SCORE (``ratio_scores``): per-doc importance = log p_target(doc) -
   log p_source(doc) under two add-one-smoothed n-gram unigram LMs
   (trained with ``lm.unigram_counts``). One tokenize pass, one
   per-(doc, token) map-side-partial groupBy, two model joins (broadcast
   when the vocabularies fit — millions of terms — else shuffled with
   AQE skew split), one per-doc rollup. The exact integer masses
   (n_tokens, sum_count_target, sum_count_source) ride along as the
   oracle-checkable contract surface; the float log-ratio is the model
   score for real use.

2. SELECT (``dsir_select``): Gumbel top-k — add hash-derived Gumbel
   noise g = -log(-log(u)) to each score and keep the k largest, which
   draws a WITHOUT-replacement sample distributed as softmax(score)
   (the Gumbel-top-k trick; Vieira 2014). The uniform u comes from
   ``sampling.hash_uniform`` (md5-based), so the draw is reproducible
   under repartitioning, resume, and append — ``rand()`` is none of
   those. Two execution modes:

   * ``mode="threshold"`` (default, the 10^12-doc path): one tiny
     ``percentile_approx`` aggregate finds the (1 - k/N) cutoff of the
     perturbed key, then a map-only filter keeps ~k docs — no global
     sort, no driver collect. ``exact=True`` switches to exact
     ``percentile`` for small/test corpora.
   * ``mode="exact"``: ``orderBy(key desc).limit(k)`` — Spark's
     TakeOrderedAndProject (per-partition top-k, driver merge of k
     rows per partition); exactly k rows, right when k is driver-sized
     (up to ~10^6), wrong when k itself is huge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import _tokens
from .sampling import _SCALE, hash_uniform


def _model_totals(counts: DataFrame) -> tuple[int, int]:
    row = counts.agg(
        F.sum("count").alias("n"), F.count("*").alias("v")).collect()[0]
    return int(row.n or 0), int(row.v or 0)


def ratio_scores(
    docs: DataFrame,
    target_counts: DataFrame,
    source_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    broadcast_counts: bool = True,
) -> DataFrame:
    """-> (doc_id, n_tokens, sum_count_target, sum_count_source,
    logratio, logratio_per_token).

    ``logratio`` = sum over the doc's term positions of
    log((c_t+1)/(N_t+V_t)) - log((c_s+1)/(N_s+V_s)) — positive when the
    doc reads like the target register. Integer columns are exact and
    order-independent (the hash-compare contract); the float log sums
    are pytest territory. Both models must be trained with the same
    ``n`` passed here.
    """
    tgt = target_counts.select(
        "token", F.col("count").alias("cnt_t"))
    src = source_counts.select(
        "token", F.col("count").alias("cnt_s"))
    if broadcast_counts:
        tgt, src = F.broadcast(tgt), F.broadcast(src)
    nt, vt = _model_totals(target_counts)
    ns, vs = _model_totals(source_counts)
    # an empty model scores every term as the same OOV constant
    # (denominator clamped to 1) instead of dividing by zero
    denom_t = float(max(nt + vt, 1))
    denom_s = float(max(ns + vs, 1))
    per_tok = (
        _tokens(docs.select(id_col, text_col), text_col, n)
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("occ"))
        .join(tgt, "token", "left")
        .join(src, "token", "left")
    )
    lr = (
        F.log((F.coalesce(F.col("cnt_t"), F.lit(0)) + 1) / denom_t)
        - F.log((F.coalesce(F.col("cnt_s"), F.lit(0)) + 1) / denom_s)
    )
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.sum("occ").alias("n_tokens"),
            F.sum(F.coalesce(F.col("cnt_t"), F.lit(0)) * F.col("occ"))
            .alias("sum_count_target"),
            F.sum(F.coalesce(F.col("cnt_s"), F.lit(0)) * F.col("occ"))
            .alias("sum_count_source"),
            F.sum(lr * F.col("occ")).alias("logratio"),
            (F.sum(lr * F.col("occ")) / F.sum("occ"))
            .alias("logratio_per_token"),
        )
    )


def hashed_bucket(token_col: Column, dim: int) -> Column:
    """md5-prefix bucket in [0, dim) — the paper's hashed n-gram
    feature map, on the repo's engine-portable md5 convention (DuckDB
    computes the identical bucket, so hashed scores stay
    oracle-checkable)."""
    h = F.conv(F.substring(F.md5(token_col), 1, 8), 16, 10).cast("long")
    return h % F.lit(int(dim)).cast("long")


def hashed_ngram_counts(
    docs: DataFrame,
    dim: int = 10_000,
    n_max: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(bucket, count) over unigrams..n_max-grams hashed into ``dim``
    buckets — DSIR's actual feature model: FIXED memory regardless of
    vocabulary (10^4 longs, trivially broadcastable), trained with one
    map-side-partial groupBy per order."""
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    parts = []
    for k in range(1, n_max + 1):
        toks = _tokens(docs.select(text_col), text_col, k)
        parts.append(toks.select(
            hashed_bucket(F.col("token"), dim).alias("bucket")))
    allb = parts[0]
    for p in parts[1:]:
        allb = allb.unionByName(p)
    return allb.groupBy("bucket").agg(F.count("*").alias("count"))


def hashed_ratio_scores(
    docs: DataFrame,
    target_counts: DataFrame,
    source_counts: DataFrame,
    dim: int = 10_000,
    n_max: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ratio_scores over the hashed feature space: same output columns,
    but the models are dim-sized bucket tables from
    ``hashed_ngram_counts`` (always broadcastable — the 10^12-doc
    model-size-independent path). Add-one smoothing runs over the dim
    buckets instead of the open vocabulary."""
    tgt = F.broadcast(target_counts.select(
        "bucket", F.col("count").alias("cnt_t")))
    src = F.broadcast(source_counts.select(
        "bucket", F.col("count").alias("cnt_s")))
    nt = int(target_counts.agg(F.sum("count")).collect()[0][0] or 0)
    ns = int(source_counts.agg(F.sum("count")).collect()[0][0] or 0)
    denom_t = float(max(nt + dim, 1))
    denom_s = float(max(ns + dim, 1))
    parts = []
    for k in range(1, n_max + 1):
        toks = _tokens(docs.select(id_col, text_col), text_col, k)
        parts.append(toks.select(
            id_col, hashed_bucket(F.col("token"), dim).alias("bucket")))
    allb = parts[0]
    for p in parts[1:]:
        allb = allb.unionByName(p)
    per = (
        allb.groupBy(id_col, "bucket").agg(F.count("*").alias("occ"))
        .join(tgt, "bucket", "left")
        .join(src, "bucket", "left")
    )
    lr = (
        F.log((F.coalesce(F.col("cnt_t"), F.lit(0)) + 1) / denom_t)
        - F.log((F.coalesce(F.col("cnt_s"), F.lit(0)) + 1) / denom_s)
    )
    return (
        per.groupBy(id_col)
        .agg(
            F.sum("occ").alias("n_tokens"),
            F.sum(F.coalesce(F.col("cnt_t"), F.lit(0)) * F.col("occ"))
            .alias("sum_count_target"),
            F.sum(F.coalesce(F.col("cnt_s"), F.lit(0)) * F.col("occ"))
            .alias("sum_count_source"),
            F.sum(lr * F.col("occ")).alias("logratio"),
            (F.sum(lr * F.col("occ")) / F.sum("occ"))
            .alias("logratio_per_token"),
        )
    )


def gumbel_key(score_col: Column, id_col: Column,
               salt: str = "dsir:42") -> Column:
    """score + Gumbel(0,1) noise derived from the stable md5 uniform:
    u = (hash+0.5)/2^32 is in (0,1) exclusive, so -log(-log(u)) is
    always finite. Deterministic per (id, salt)."""
    u = (hash_uniform(id_col, salt).cast("double") + F.lit(0.5)) / F.lit(
        float(_SCALE))
    return score_col + (-F.log(-F.log(u)))


def dsir_select(
    scored: DataFrame,
    n_select: int,
    score_col: str = "logratio",
    id_col: str = "doc_id",
    salt: str = "dsir:42",
    mode: str = "threshold",
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Keep ~``n_select`` docs by Gumbel-top-k over ``score_col``.

    See the module docstring for the mode trade-off. Returns ``scored``
    filtered, plus the perturbed ``gumbel_key`` column (callers sort or
    re-threshold on it downstream).
    """
    if n_select <= 0:
        raise ValueError(f"n_select must be positive, got {n_select}")
    key = gumbel_key(F.col(score_col).cast("double"), F.col(id_col), salt)
    out = scored.withColumn("gumbel_key", key)
    if mode == "exact":
        return out.orderBy(F.desc("gumbel_key"), F.asc(id_col)).limit(n_select)
    if mode != "threshold":
        raise ValueError(f"unknown mode {mode!r}")
    # ONE pass computes both the size and every candidate cutoff (the
    # scoring DAG upstream is expensive; a separate count() would
    # recompute it). The exact (1 - k/N) quantile needs N first, so
    # pre-compute cutoffs on a grid of selectivities and pick the
    # tightest one >= the requested k — percentile state is shared
    # across all grid points in the same aggregate.
    col = F.col("gumbel_key")
    grid = [i / 1000 for i in range(1, 1000)]
    agg = (F.percentile(col, F.lit(grid)) if exact
           else F.percentile_approx(col, F.lit(grid), F.lit(accuracy)))
    row = out.agg(F.count("*").alias("n"), agg.alias("cuts")).collect()[0]
    total = int(row["n"])
    if n_select >= total or row["cuts"] is None:
        return out
    q = 1.0 - n_select / total
    if q <= grid[0]:
        # requested keep-fraction finer than the grid: keep everything
        # rather than under-keep
        return out
    # grid[j] is the q_j = (j+1)/1000 quantile; take the largest grid
    # point <= q (keeps AT LEAST n_select, never fewer)
    j = min(max(int(q * 1000) - 1, 0), len(grid) - 1)
    while j > 0 and grid[j] > q:
        j -= 1
    cutoff = row["cuts"][j]
    if cutoff is None:
        return out
    return out.filter(col >= F.lit(float(cutoff)))
