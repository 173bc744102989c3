"""Sequence packing: the concat-and-chunk layout used to build
fixed-size training contexts from variable-length documents (public
GPT-style pipeline step; no reference analog — a training-data operator
beyond marbl/Mash).

Semantics: documents are concatenated in deterministic ``doc_id`` order
into one virtual token stream, which is cut into ``budget``-token
chunks; a document may straddle a chunk boundary. The operator emits
the LAYOUT — each doc's global token offset and chunk span — which is
what a downstream chunk materializer (or an offline sharder) consumes.

Scale shape (10^12 docs): a global ordered cumulative sum is the only
sequential dependency, and it distributes as the classic two-level
prefix sum:

1. token counts are a map-only projection;
2. one skinny shuffle (20 B rows) range-partitions by ``doc_id`` so
   partition i holds a contiguous id range;
3. per-partition local cumsums run as a window inside each partition;
4. per-partition TOTALS (one row per partition) come to the driver,
   their prefix sum is broadcast back, and
   ``global_offset = partition_prefix + local_cumsum_before``.

Nothing global ever sorts or single-threads: the driver handles
O(partitions) rows, every other stage is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_layout(docs: DataFrame, budget: int, id_col: str = "doc_id",
                text_col: str = "text",
                token_count_col: str | None = None) -> DataFrame:
    """-> (doc_id, n_tokens, global_offset, chunk_id, chunk_offset,
    n_chunks_spanned).

    ``global_offset`` = tokens preceding this doc in the concatenated
    stream (doc_id order); ``chunk_id`` = global_offset // budget;
    ``chunk_offset`` = position within that chunk; ``n_chunks_spanned`` =
    how many budget-sized chunks the doc touches (0-token docs span 0).

    Tokens default to the whitespace convention (``size(split(text,
    ' '))``, matching textstats token counts); pass ``token_count_col``
    to pack on a precomputed count (e.g. BPE) instead.
    """
    if token_count_col is not None:
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(token_count_col).cast("long").alias("n_tokens"),
        )
    else:
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        )

    spark = docs.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # contiguous doc_id ranges per partition: the ONE skinny shuffle
    ranged = toks.repartitionByRange(n_parts, "doc_id").withColumn(
        "_pid", F.spark_partition_id())

    # local cumsum inside each range partition (window partitions ==
    # physical partitions, so no further exchange of consequence)
    w = Window.partitionBy("_pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1)
    local = ranged.withColumn(
        "_local_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))

    # per-partition totals -> driver prefix sum (O(partitions) rows) ->
    # broadcast back. localCheckpoint pins one consistent partitioning:
    # _pid is only meaningful within the materialization it was computed
    # in, and `local` is consumed twice (totals + the final join).
    local = local.localCheckpoint(eager=True)
    totals = {
        r["_pid"]: r["t"]
        for r in local.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect()
    }
    prefix, acc = {}, 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    prefix_df = spark.createDataFrame(
        [(int(p), int(off)) for p, off in prefix.items()],
        "_pid int, _prefix long")

    out = (
        local.join(F.broadcast(prefix_df), "_pid")
        .withColumn("global_offset", F.col("_prefix") + F.col("_local_before"))
        # integer `div`, not double `/`: offsets in a 10^12-doc stream
        # exceed double's exact-integer range
        .withColumn("chunk_id", F.expr(f"global_offset div {int(budget)}"))
        .withColumn("chunk_offset", F.col("global_offset") % budget)
        .withColumn(
            "n_chunks_spanned",
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
                F.expr(f"(global_offset + n_tokens - 1) div {int(budget)}")
                - F.col("chunk_id") + 1
            ),
        )
        .select("doc_id", "n_tokens", "global_offset", "chunk_id",
                "chunk_offset", "n_chunks_spanned")
    )
    return out


def chunk_members(layout: DataFrame, budget: int) -> DataFrame:
    """Explode a ``pack_layout`` result into per-chunk membership:
    (chunk_id, doc_id, slice_start, slice_len) — for every chunk a doc
    touches, which token range of the doc lands in it. A chunk
    materializer groups this by ``chunk_id`` and concatenates slices; a
    shard writer range-partitions on it. Map-only explode (spans are
    almost always 1-2 chunks), no shuffle here; zero-token docs appear
    in no chunk by definition."""
    b = int(budget)
    spanned = layout.filter(F.col("n_tokens") > 0).select(
        "doc_id", "global_offset", "n_tokens",
        F.explode(
            F.sequence(F.col("chunk_id"),
                       F.col("chunk_id") + F.col("n_chunks_spanned") - 1)
        ).alias("chunk_id"),
    )
    start = F.greatest(F.lit(0).cast("long"),
                       F.col("chunk_id") * b - F.col("global_offset"))
    end = F.least(F.col("n_tokens"),
                  (F.col("chunk_id") + 1) * b - F.col("global_offset"))
    return spanned.select(
        "chunk_id", "doc_id",
        start.alias("slice_start"),
        (end - start).alias("slice_len"),
    )
