"""LSH candidate generation: band explode, bucket self-join, skew handling.

Replaces the reference's all-pairs enumerator (``CommandDistance.cpp:195-237``
blocks of <=4096 pairs per thread) with a banded join so only plausible
pairs reach the Mash-exact verify pass. Band keys are computed in the
sketch UDF (``sketch.compute_band_keys``).

Skew strategy (north rule: explicit salting/repartitioning for
boilerplate-heavy hot buckets):

1. **Exact-duplicate pre-collapse** happens upstream (``pipeline.py``):
   docs with identical sketches never reach the band join, which removes
   the dominant web-scale skew source (mirrored/templated pages).
2. Buckets with <= band_doc_cap docs: plain self-join; AQE skew-join
   splitting handles residual imbalance.
3. Buckets with band_doc_cap < n <= hard_bucket_cap: **star candidates**
   — each member pairs with the bucket's min doc_id only (linear, not
   O(n^2); see the hot-path comment in ``candidate_pairs`` for why this
   preserves both cluster connectivity and pair recall).
4. Buckets with n > hard_bucket_cap: dropped, with the drop count and the
   number of affected docs returned as metrics (no silent caps) — docs in
   such buckets still pair through their other, colder bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_bands(sketches: DataFrame) -> DataFrame:
    """(doc_id, band_key[]) -> (doc_id, band_key). The residue class is
    already folded into each key, so one int64 is the full bucket id."""
    return sketches.select("doc_id", F.explode("band_key").alias("band_key"))


def lsh_recall(jaccard: float, prefix: int, bands: int) -> float:
    """Closed-form candidate recall of residue-class banding at a given
    true Jaccard: a band matches iff the two docs' sketch members in that
    residue class are identical, which at union-sketch overlap
    f = 2j/(1+j) happens with probability ~ f**(u/bands) for u = prefix
    (each band holds u/bands union elements in expectation); the pair is
    a candidate if ANY band matches. See ``params.LSHParams`` for why
    residue-class banding (not positional bands / extra permutations)."""
    if jaccard <= 0.0:
        return 0.0
    if jaccard >= 1.0:
        return 1.0
    f = 2.0 * jaccard / (1.0 + jaccard)
    per_band = f ** (prefix / bands)
    return 1.0 - (1.0 - per_band) ** bands


def tune_lsh_params(threshold: float, s: int = 1000,
                    target_recall: float = 0.999,
                    background_jaccard: float = 0.1):
    """Solve for the cheapest (prefix, bands) meeting ``target_recall``
    at the dedup threshold — the knob a 100 TB operator actually turns.

    Cost model: the LSH stage's shuffle volume is ``bands`` exploded
    rows/doc and its false-candidate volume is driven by the recall the
    scheme leaks at sub-threshold similarity, so among configs meeting
    the target at ``threshold`` we pick the minimum ``bands``, breaking
    ties toward the LARGER prefix (more union elements per band = sharper
    per-band rejection of background pairs). Search space: power-of-two
    prefixes <= s and power-of-two band counts <= prefix (the residue
    mask ``h & (bands-1)`` requires a power of two).

    Returns (params.LSHParams, diagnostics dict with the predicted recall
    at the threshold and at ``background_jaccard``).
    """
    from .params import LSHParams

    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    best = None
    prefixes = [p for p in (32, 64, 128, 256, 512, 1024, 2048, 4096) if p <= s]
    if not prefixes:
        raise ValueError(f"sketch size {s} too small to band")
    for prefix in prefixes:
        for bands in (8, 16, 32, 64, 128, 256):
            if bands > prefix:
                continue
            r = lsh_recall(threshold, prefix, bands)
            if r < target_recall:
                continue
            leak = lsh_recall(background_jaccard, prefix, bands)
            key = (bands, -prefix, leak)
            if best is None or key < best[0]:
                best = (key, prefix, bands, r, leak)
    if best is None:
        raise ValueError(
            f"no (prefix<={s}, bands<=256) config reaches recall "
            f"{target_recall} at jaccard {threshold}; lower the target or "
            f"increase the sketch size")
    _, prefix, bands, recall, leak = best
    return (
        LSHParams(bands=bands, prefix=prefix),
        {"predicted_recall": recall,
         "background_leak": leak,
         "exploded_rows_per_doc": bands},
    )


def candidate_pairs(sketches: DataFrame, band_doc_cap: int = 1000,
                    hard_bucket_cap: int = 100_000, eager: bool = False,
                    checkpoint: bool = True):
    """Distinct candidate (id_a, id_b) pairs, id_a < id_b, plus skew metrics.

    Returns (pairs_df, metrics_df). metrics_df: one row —
    (n_buckets, n_hot_buckets, n_dropped_buckets, n_dropped_docs — the
    last counts band ENTRIES in dropped buckets, an upper bound on
    affected docs).

    ``eager``/``checkpoint`` are RETAINED FOR API COMPATIBILITY but are
    no-ops since round 6: earlier rounds eagerly localCheckpointed the
    band relation and the bucket-size table to stop concurrent AQE
    exchange-materialization jobs racing on a lazy checkpoint's lock
    (a measured 17 s zero-CPU stall). Round-6 re-measure: with no
    checkpoint there is no lock to race on, every consumer (sizes
    groupBy, hot/cold anti+semi branches, the self-join's two sides)
    sits in the ONE downstream plan where ReuseExchange shares the
    band-key exchange, and the band explode itself is cheap JVM column
    work hanging off the caller's materialized sketch relation — while
    each eager checkpoint serialized a full extra scan job per run.
    Interleaved fresh-JVM A/B on the pinned scale job, identical
    candidate counts: 8 cores 11.8-14.5 s -> 10.6-13.0 s (and the
    earlier sizes-checkpoint removal measured 14.9-16.2 -> 11.1-12.8);
    2 cores 39.7-45.9 -> 35.0-38.9. Callers that collect ``metrics``
    later re-run the cheap explode+groupBy — rare and off the hot path.
    """
    del eager, checkpoint  # no-ops since round 6 (see docstring)
    bands = explode_bands(sketches)

    # bucket sizes via groupBy, NOT a window: groupBy does map-side
    # partial aggregation (a hot boilerplate bucket is pre-reduced inside
    # every input partition before the exchange), while a window over
    # partitionBy(band_key) funnels the WHOLE mega-bucket into one
    # unsplittable task at web scale. The size table is only consulted as
    # two SMALL key sets (hot keys, pruned singleton keys are implicit:
    # singleton buckets simply produce no self-join output), so the fat
    # band relation is never joined against an O(buckets) table.
    sizes = (
        bands.groupBy("band_key")
        .agg(F.count("*").alias("bucket_n"))
    )
    multi = sizes.filter(F.col("bucket_n") > 1)

    # coalesce every sum: on a corpus with no multi-doc buckets `multi`
    # is empty and bare F.sum yields NULL, not 0 — operator code doing
    # `row["n_dropped_docs"] > 0` would crash on None. n_dropped_docs
    # counts band ENTRIES in dropped buckets (a doc in k dropped buckets
    # contributes k) — the upper bound on affected docs, stated as such.
    metrics = multi.agg(
        F.count("*").alias("n_buckets"),
        F.coalesce(
            F.sum((F.col("bucket_n") > band_doc_cap).cast("long")),
            F.lit(0).cast("long")).alias("n_hot_buckets"),
        F.coalesce(
            F.sum((F.col("bucket_n") > hard_bucket_cap).cast("long")),
            F.lit(0).cast("long")).alias("n_dropped_buckets"),
        F.coalesce(
            F.sum(F.when(F.col("bucket_n") > hard_bucket_cap,
                         F.col("bucket_n")).otherwise(0)),
            F.lit(0).cast("long")).alias("n_dropped_docs"),
    )

    # hot/dropped key sets are tiny (boilerplate phenomena — a handful of
    # keys even at web scale); AQE broadcasts them, so tagging the band
    # relation costs no extra shuffle and no unsplittable stage
    hot_keys = sizes.filter(F.col("bucket_n") > band_doc_cap).select(
        "band_key", "bucket_n"
    )
    cold = bands.join(hot_keys.select("band_key"), "band_key", "left_anti")
    hot = bands.join(
        hot_keys.filter(F.col("bucket_n") <= hard_bucket_cap), "band_key", "left_semi"
    )

    # --- cold path: plain self-join per bucket (AQE splits residual skew).
    # SHUFFLE_HASH hint on the self-join: both sides are the O(corpus)
    # band relation, so a broadcast is never the right plan — but at
    # bench scale the relation slips under autoBroadcastJoinThreshold
    # and AQE picks BroadcastHashJoin, whose HashedRelation build is
    # SERIAL DRIVER time (measured: a 4.5 s zero-task gap at 224k docs,
    # the single largest serial cost in the timed scaling job; it taxes
    # a short high-parallelism leg ~3x harder than the long low leg).
    # The hint keeps the join shuffled-and-parallel at every scale.
    left = cold.withColumnRenamed("doc_id", "id_a")
    right = cold.withColumnRenamed("doc_id", "id_b")
    cold_pairs = left.hint("shuffle_hash").join(right, ["band_key"]).filter(
        F.col("id_a") < F.col("id_b")
    )

    # --- hot path: STAR candidates (linear in bucket size).
    # A hot bucket is either (a) boilerplate-dominated — thousands of docs
    # sharing only a template fragment; all-pairs enumeration is O(n^2)
    # junk that exact verification would reject anyway — or (b) a genuine
    # near-dup mega-family, where all-pairs is equally infeasible at any
    # scale and cluster connectivity only needs a spanning set. Either
    # way, connecting every member to the bucket's minimum doc_id gives a
    # LINEAR candidate set that (b)-case verification turns into a
    # connected star, while (a)-case pairs die in verification at linear
    # cost. True pairs inside hot buckets additionally co-occur in their
    # colder content bands, so pair-level recall survives (asserted by the
    # recall gate test). Salting is applied to the star hub join itself:
    # the hub side is tiny and broadcast, so no task holds a whole bucket.
    hubs = hot.groupBy("band_key").agg(F.min("doc_id").alias("hub"))
    hot_pairs = (
        hot.join(hubs, "band_key")  # AQE broadcasts when hubs is small
        .filter(F.col("doc_id") != F.col("hub"))
        .select(
            "band_key",
            F.least("doc_id", "hub").alias("id_a"),
            F.greatest("doc_id", "hub").alias("id_b"),
        )
    )

    pairs = (
        cold_pairs.select("id_a", "id_b")
        .unionByName(hot_pairs.select("id_a", "id_b"))
        .distinct()
    )
    return pairs, metrics
