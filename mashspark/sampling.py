"""Deterministic sampling / dataset-split operators for training-data
curation.

A 100 TB curation pipeline needs REPRODUCIBLE sampling: re-running the
job (or running it on a different cluster layout) must assign every
document to the same split / sample, and adding documents must never
reshuffle existing assignments. ``df.sample()`` gives neither (it is
seeded per-partition, so any repartition changes the draw). The standard
fix — used here — is hash-based assignment: a stable per-row uniform
``u(doc) in [0,1)`` derived from ``md5(salt || doc_id)``, compared
against split boundaries / rates. Every operator below is a pure column
expression over that uniform:

- map-only, whole-stage-codegen, zero shuffle for split + sample (the
  filter pushes to the parquet scan's output, nothing is materialized);
- deterministic under repartitioning, resume, and incremental append;
- oracle-checkable: DuckDB computes the identical md5-prefix integer via
  ``CAST('0x' || substr(md5(..),1,8) AS BIGINT)``.

``group_topk_sample`` (k docs per group, hash order) is the one shuffle
in this module; it rides ``row_number() OVER (PARTITION BY group)``,
which Spark >= 3.5 executes with WindowGroupLimit: each map task keeps
only its local top-k per group BEFORE the shuffle, so a 10^9-doc group
moves k rows, not 10^9 (skew-proof without salting).

The 32-bit md5 prefix gives ~2^-32 rate granularity — at 10^12 docs a
0.05 split lands within +-4e-5 of nominal (binomial sd), and boundary
collisions (ties at a threshold) are impossible because thresholds are
computed in exact integer space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32: the md5-prefix uniform's denominator (8 hex chars)
_SCALE = 1 << 32


def hash_uniform(id_col: Column, salt: str) -> Column:
    """Stable uniform integer in [0, 2^32) from ``md5(salt || ':' || id)``.

    Integer, not double: split thresholds are compared in exact integer
    space so Spark and any reimplementation (DuckDB oracle, a resumed
    job, a different cluster) agree bit-for-bit with no float rounding
    at the boundaries.
    """
    h = F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def split_assign(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split:42",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash order (train/val/test).

    ``fractions`` maps split name -> fraction; they must sum to <= 1.0
    (any remainder is assigned to the LAST split, so {train:.9, val:.05,
    test:.05} is exact). Assignment is a single CASE WHEN over the
    hash-uniform — map-only, no shuffle, stable under append/repartition.
    """
    total = sum(fractions.values())
    if not 0 < total <= 1.0 + 1e-9:
        raise ValueError(f"fractions must sum to (0, 1], got {total}")
    u = hash_uniform(F.col(id_col), salt)
    names = list(fractions)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        bound = int(cum * _SCALE)
        cond = u < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "sample:42",
) -> DataFrame:
    """Deterministic per-stratum downsampling (e.g. language rebalancing:
    keep 100% of low-resource langs, 10% of english).

    ``rates`` maps stratum value -> keep-rate in [0,1]; strata not listed
    keep ``default_rate``. One hash-uniform filter, map-only — the rate
    lookup is a CASE WHEN chain (rates dicts are small: langs, sources),
    so the filter stays inside whole-stage codegen and pushes past
    column pruning to the scan.
    """
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} out of [0,1]: {r}")
    u = hash_uniform(F.col(id_col), salt)
    expr = None
    for value, rate in rates.items():
        cond = F.col(strata_col) == F.lit(value)
        bound = F.lit(int(rate * _SCALE))
        expr = F.when(cond, bound) if expr is None else expr.when(cond, bound)
    default = F.lit(int(default_rate * _SCALE))
    bound = default if expr is None else expr.otherwise(default)
    return df.filter(u < bound)


def group_topk_sample(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "topk:42",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """k documents per group, chosen by hash order (a deterministic
    uniform sample without replacement within each group).

    The hash order makes this a true random sample per group (not
    "first k by id"), yet reproducible. Executed as row_number over
    (group, hash) — Spark's WindowGroupLimit keeps only the local top-k
    per group on the map side before the shuffle, so hot groups (a
    domain with 10^9 pages) move k rows per input partition, not their
    full volume; ties are impossible at fixed ``id_col`` uniqueness
    because the hash order is tie-broken by id.
    """
    from pyspark.sql.window import Window

    u = hash_uniform(F.col(id_col), salt)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    temperature: float = 1.0,
) -> DataFrame:
    """Epoch-mixing plan: given target mixture ``weights`` per source and
    a sampling ``temperature`` (w^(1/T) renormalized — T>1 flattens the
    mixture toward uniform, the multilingual-training trick), emit per-
    stratum (n_docs, weight, target_fraction, epochs_per_doc): how many
    repeats/samples of each stratum one epoch of the mixed dataset needs.

    Pure aggregate + arithmetic (one groupBy on a low-cardinality key);
    the plan is driver-sized and feeds ``stratified_sample`` rates or a
    repeat-expansion downstream.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    tw = {k: w ** (1.0 / temperature) for k, w in weights.items()}
    z = sum(tw.values()) or 1.0
    frac = {k: w / z for k, w in tw.items()}
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n_docs"))
    pairs = [(k, float(weights[k]), float(frac[k])) for k in weights]
    plan = counts.sparkSession.createDataFrame(
        pairs, f"{strata_col} string, weight double, target_frac double")
    total = counts.agg(F.sum("n_docs")).collect()[0][0] or 1
    return (
        counts.join(plan, strata_col, "inner")
        .select(
            strata_col,
            "n_docs",
            "weight",
            "target_frac",
            # docs one mixed epoch draws from this stratum / docs it has:
            # >1 means the stratum repeats within an epoch. No rounding:
            # the same IEEE ops on the same inputs are bit-identical in
            # any reimplementation (oracle parity), while round()
            # semantics differ across engines.
            (F.col("target_frac") * F.lit(float(total)) / F.col("n_docs"))
            .alias("epochs_per_doc"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    groups: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    rep_col: str = "rep_id",
    salt: str = "split:42",
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test split that can never leak a duplicate across
    splits: assignment hashes the duplicate-GROUP representative, not
    the document, so every member of a group lands in the same split.

    A per-doc hash split over a deduplicated-but-not-collapsed corpus
    (or one deduplicated with any recall < 1) puts near-copies of the
    same page in train AND test — the classic benchmark-contamination
    failure. Feeding this the (doc_id, rep_id) relation from
    ``normalize.canonical_dup_groups`` (or LSH cluster ids from
    ``pipeline.dedup_pipeline``) closes that hole by construction.

    ``groups`` maps ``id_col`` -> ``rep_col``; docs absent from
    ``groups`` are their own singleton group (rep = own id), so a
    partial grouping degrades gracefully to the per-doc split rather
    than dropping rows. Shape: the split itself is the same map-only
    CASE WHEN as ``split_assign`` evaluated on the rep; the only
    shuffle is one equi-join of (doc_id, rep_id) onto the corpus —
    8 B keys, AQE-skew splittable, broadcastable when the grouping
    covers only a small dup subset.
    """
    assigned = split_assign(
        groups.select(F.col(id_col), F.col(rep_col)),
        fractions, id_col=rep_col, salt=salt, out_col="_grp_split",
    ).select(id_col, "_grp_split")
    # singleton fallback is a pure column expr (split of the own id) —
    # costs nothing, keeps the plan at exactly one join
    own = split_assign(df, fractions, id_col=id_col, salt=salt,
                       out_col="_own_split")
    return (
        own.join(assigned, id_col, "left")
        .withColumn(out_col,
                    F.coalesce(F.col("_grp_split"), F.col("_own_split")))
        .drop("_grp_split", "_own_split")
    )


def epoch_shuffle_key(id_col: Column, epoch: int, salt: str = "epoch") -> Column:
    """Stable per-epoch shuffle key: changing ``epoch`` produces an
    independent permutation, same epoch always replays the same order."""
    return hash_uniform(id_col, f"{salt}:{epoch}")


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    num_partitions: int | None = None,
    id_col: str = "doc_id",
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic global shuffle for one training epoch: rows land in
    ``num_partitions`` range buckets of the per-epoch hash key and are
    sorted by it within each bucket, so a sequential read of the written
    partitions replays one fixed pseudo-random permutation of the corpus.

    This is the write-layout operator a training pipeline runs per epoch
    (or once, with readers striding): repartitionByRange on the hash key
    gives balanced output files (the key is uniform, so range bounds from
    Spark's sampling are near-exact), and the within-partition sort is a
    local sort — no global ordering bottleneck. Re-running with the same
    epoch reproduces the layout; epoch+1 is an independent permutation.
    """
    key = epoch_shuffle_key(F.col(id_col), epoch, salt)
    out = df.withColumn("_shuffle_key", key)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "_shuffle_key")
    else:
        out = out.repartitionByRange("_shuffle_key")
    return out.sortWithinPartitions("_shuffle_key").drop("_shuffle_key")
