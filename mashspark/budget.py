"""Token-budget corpus selection: keep the best-scoring documents whose
cumulative token count fits a global budget (the public "select top
quality until N tokens" step of DataComp-LM / FineWeb-style curation; a
training-data operator beyond marbl/Mash — the reference's analog of a
global ordered cut is `mash dist`'s best-k table, CommandDist.cpp).

Semantics: order documents by (score DESC, doc_id ASC — deterministic
tie-break), take the longest prefix whose running token total is
<= ``budget``. A document whose inclusion would cross the budget is
EXCLUDED (never truncated): the rule is exactly

    keep doc  <=>  sum(tokens of all docs ranked at-or-before it) <= budget

which any reimplementation (the DuckDB oracle's window cumsum, a resumed
job) reproduces bit-for-bit — no float boundaries, no partial documents.

Scale shape (10^12 docs): a global ordered cumulative sum — the same
two-level distributed prefix sum as ``packing.pack_layout``, just keyed
by the quality order instead of doc_id order:

1. (doc_id, score, n_tokens) is a map-only projection (~24 B/row — the
   ONLY bytes that ever shuffle; text stays at the scan);
2. ``repartitionByRange(score DESC, doc_id)`` gives each partition a
   contiguous rank range, so partition ids ARE the coarse order;
3. local cumsums run as an intra-partition window;
4. per-partition totals (one row each) prefix-sum on the driver and
   broadcast back.

Nothing sorts globally and no single task sees more than one
partition's rows. The final filter is a map-only comparison; partitions
whose broadcast prefix already exceeds the budget are all-false and
short-circuit at the comparison (their scan still runs — at a fixed
budget over a growing corpus, push a coarse score pre-filter upstream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def whitespace_token_count(col: Column) -> Column:
    """The module-standard token count: split on single spaces, drop
    empties — the SAME convention textstats/lm/profile use, so budgets
    are denominated in the tokens the models actually consume."""
    return F.size(F.filter(F.split(col, " "), lambda x: x != "")) \
        .cast("long")


def select_within_budget(
    docs: DataFrame,
    budget: int,
    score_col: str = "score",
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
) -> DataFrame:
    """-> (doc_id, score, n_tokens, cum_tokens) for every KEPT doc —
    the highest-``score_col`` documents whose running token total stays
    <= ``budget`` (ties broken by ascending ``id_col``). ``cum_tokens``
    is the running total INCLUDING the doc itself, so the output is its
    own audit trail (max(cum_tokens) <= budget by construction).

    Tokens default to the whitespace convention; pass
    ``token_count_col`` to budget on a precomputed count (e.g. BPE).
    Zero- and null-token docs cost nothing and are kept whenever their
    rank position is reached (they never cross a budget).
    """
    budget = int(budget)
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    toks = (F.col(token_count_col).cast("long") if token_count_col
            else whitespace_token_count(F.col(text_col)))
    skinny = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(score_col).alias("score"),
        F.coalesce(toks, F.lit(0)).alias("n_tokens"),
    )

    spark = docs.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # contiguous (score DESC, doc_id) rank ranges per partition: the one
    # skinny shuffle; partition id order == global quality order
    ranged = skinny.repartitionByRange(
        n_parts, F.col("score").desc(), F.col("doc_id").asc(),
    ).withColumn("_pid", F.spark_partition_id())

    w = Window.partitionBy("_pid").orderBy(
        F.col("score").desc(), F.col("doc_id").asc(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = ranged.withColumn("_local_cum", F.sum("n_tokens").over(w))

    # pin ONE materialization: _pid is only meaningful within it, and
    # `local` is consumed twice (totals + the final filter). Same
    # discipline as packing.pack_layout.
    local = local.localCheckpoint(eager=True)
    totals = {
        r["_pid"]: r["t"]
        for r in local.groupBy("_pid").agg(
            F.sum("n_tokens").alias("t")).collect()
    }
    prefix, acc = {}, 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    prefix_df = spark.createDataFrame(
        [(int(p), int(off)) for p, off in prefix.items()],
        "_pid int, _prefix long")

    return (
        local.join(F.broadcast(prefix_df), "_pid")
        .withColumn("cum_tokens", F.col("_prefix") + F.col("_local_cum"))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "score", "n_tokens", "cum_tokens")
    )
