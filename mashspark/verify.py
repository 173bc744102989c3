"""Mash-exact pair verification: capped-merge Jaccard + distance + p-value
as Spark column operations.

Replaces the reference's all-pairs worker (``CommandDistance.cpp:306-425``)
downstream of LSH candidate generation: the merge/cap/top-up semantics are
kept bit-for-bit (see ``compare.capped_merge``), then distance and the
cheap filters run as JVM column expressions (whole-stage codegen), and the
expensive binomial p-value is only computed for pairs that survive
(reference computes distance filter before p-value too:
``CommandDistance.cpp:409-417``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                               StructType)

from .compare import binom_sf, capped_merge_sorted_batch
from .hashing import signed_sketch_bytes
from .params import SketchParams, params_from_schema

_MERGE_FIELDS = StructType(
    [StructField("common", IntegerType(), False), StructField("denom", IntegerType(), False)]
)


def make_verify_udf(sketch_size: int):
    """(sketch_a, sketch_b) -> struct(common, denom).

    sketch columns are binary blobs of sign-flip-encoded little-endian
    int64s (ascending unsigned); np.frombuffer gives a zero-copy view.
    """

    @pandas_udf(_MERGE_FIELDS)
    def verify_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
        # sketch_size is min(s_a, s_b) of the PARAMETER s
        # (CommandDistance.cpp:313-315); both sides share one config here
        # (enforced by SketchParams.check_compatible). Short docs
        # (len < s) exhaust the merge early and top up, as in the
        # reference. One vectorized 2-D merge over the whole Arrow batch
        # (signed-encoded views are zero-copy and order-preserving).
        arrs_a = [signed_sketch_bytes(buf) for buf in a]
        arrs_b = [signed_sketch_bytes(buf) for buf in b]
        common, denom = capped_merge_sorted_batch(arrs_a, arrs_b, sketch_size)
        return pd.DataFrame({"common": common, "denom": denom})

    # The merge IS deterministic; the flag only forbids Catalyst from
    # duplicating the call. Without it, a downstream filter on a derived
    # column (jaccard >= t) is planned as Filter BETWEEN two ArrowEval
    # copies of the same UDF — every pair was merged twice (measured:
    # two ArrowEvalPython nodes over identical inputs in the verify plan,
    # doubling the dominant python cost of the q3 pipeline).
    return verify_udf.asNondeterministic()


def make_contain_udf():
    """(sketch_ref, sketch_query) -> struct(common, used) per
    ``containSketches`` (CommandContain.cpp:231-263)."""
    fields = StructType(
        [StructField("common", IntegerType(), False),
         StructField("used", IntegerType(), False)]
    )

    @pandas_udf(fields)
    def contain_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
        # Same batch vectorization as verify_udf. Per contain_sketches:
        # used = min(min(|ref|,|query|), |{q : q <= max(ref)}|) — computed
        # on signed-encoded views (order-preserving) — and common = the
        # shared count over ref vs query[:used], which is exactly the
        # batch merge with an uncapped sketch size.
        refs = [signed_sketch_bytes(buf) for buf in a]
        qrys = [signed_sketch_bytes(buf) for buf in b]
        n = len(refs)
        used = np.zeros(n, dtype=np.int32)
        trimmed = []
        for i in range(n):
            r, q = refs[i], qrys[i]
            if len(r) == 0 or len(q) == 0:
                trimmed.append(q[:0])
                continue
            u = min(min(len(r), len(q)),
                    int(np.searchsorted(q, r[-1], side="right")))
            used[i] = u
            trimmed.append(q[:u])
        common, _denom = capped_merge_sorted_batch(refs, trimmed, 1 << 30)
        return pd.DataFrame({"common": common, "used": used})

    # single-eval guard: see make_verify_udf
    return contain_udf.asNondeterministic()


def contain_pairs(cands: DataFrame, sketches: DataFrame,
                  params: SketchParams) -> DataFrame:
    """Containment mode (J6): for each candidate pair, the containment
    score of the id_b sketch (query) in the id_a sketch (ref) — the
    "page contains boilerplate template" op. Columns:
    (id_a, id_b, common, used, containment, error) with
    containment = common/used (0 when used = 0) and error = 1/sqrt(used)
    (``CommandContain.cpp:258-262``). Join strategy mirrors
    ``verify_pairs``: skinny pair table joins the fat sketch table once
    per side."""
    embedded = params_from_schema(sketches)
    if embedded is not None:
        params.check_compatible(embedded)
    sk = sketches.select("doc_id", "sketch", F.lit(0).alias("card_est"))
    small = _sketch_side_small(sk)
    if small:
        cands = cands.repartition(int(sk.sparkSession.conf.get(
            "spark.sql.shuffle.partitions")))
    df = _attach(cands, sk, "id_a", "a", F.col("sketch"), small=small)
    df = _attach(df, sk, "id_b", "b", F.col("sketch"), small=small)
    cu = make_contain_udf()
    df = df.withColumn("_c", cu(F.col("sketch_a"), F.col("sketch_b")))
    return df.select(
        "id_a", "id_b",
        F.col("_c.common").alias("common"),
        F.col("_c.used").alias("used"),
        F.when(F.col("_c.used") > 0, F.col("_c.common") / F.col("_c.used"))
        .otherwise(F.lit(0.0)).alias("containment"),
        F.when(F.col("_c.used") > 0, 1.0 / F.sqrt(F.col("_c.used")))
        .otherwise(F.lit(1.0)).alias("error"),
    )


def make_pvalue_udf(kmer_space: float, sketch_size: int):
    """Binomial-tail p-value (CommandDistance.cpp:427-448) as a pandas UDF
    over (common, len_a, len_b); lengths are the distinct-shingle estimates
    (reads-mode semantics, ``Sketch.cpp:1272-1282``)."""

    @pandas_udf(DoubleType())
    def pvalue_udf(common: pd.Series, len_a: pd.Series, len_b: pd.Series) -> pd.Series:
        c = common.to_numpy(dtype=np.int64)
        la = np.maximum(len_a.to_numpy(dtype=np.float64), 1.0)
        lb = np.maximum(len_b.to_numpy(dtype=np.float64), 1.0)
        px = 1.0 / (1.0 + kmer_space / la)
        py = 1.0 / (1.0 + kmer_space / lb)
        r = px * py / (px + py - px * py)
        out = binom_sf(c - 1, r, np.full_like(c, sketch_size))
        out[c == 0] = 1.0
        return pd.Series(out)

    # single-eval guard (a max_pvalue filter would otherwise re-run the
    # tail computation): see make_verify_udf
    return pvalue_udf.asNondeterministic()


def _sketch_side_small(sk: DataFrame) -> bool:
    """True when the optimizer's size estimate for the sketch relation
    is confidently under the broadcast threshold. Checkpointed RDD scans
    have no stats (estimate = defaultSizeInBytes, effectively infinite),
    so the big-pipeline path always returns False; parquet-backed or
    freshly-derived small tables (a 20-ref screen db, a few-hundred-doc
    ground-truth subset) return True."""
    try:
        est = int(sk._jdf.queryExecution().optimizedPlan().stats()
                  .sizeInBytes())  # py4j converts the scala BigInt to int
        thr = int(sk.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"))
        return 0 < thr and 0 <= est < thr
    except Exception:  # stats introspection is best-effort only
        return False


def _attach(cands: DataFrame, sk: DataFrame, id_col: str, suffix: str,
            payload_col, small: bool = False) -> DataFrame:
    side = sk.select(
        F.col("doc_id").alias(id_col),
        payload_col.alias(f"sketch_{suffix}"),
        F.col("card_est").alias(f"card_{suffix}"),
    )
    if small:
        # provably-small sketch side (see _sketch_side_small): broadcast
        # it so the fat ATTACHED intermediate is never exchanged — the
        # two sequential shuffle-hash attaches otherwise move
        # |pairs| x 8 KB rows through the id_b exchange (measured on the
        # q7 ground-truth stage, 125k exhaustive pairs over a 492-doc
        # table: 2.2-3.1 s -> 1.5-2.1 s, identical output). Callers
        # repartition the skinny pair relation first so the merge UDF
        # still runs at full slot parallelism (a crossJoin/filter output
        # otherwise inherits the tiny left side's partitioning — the
        # round-2 4-wide-UDF pathology this hint originally fixed).
        return cands.join(F.broadcast(side), id_col)
    # shuffle_hash, build side = the skinny pair relation: without the
    # hint AQE broadcasts the (fat, semi-joined) SKETCH side onto the
    # pair relation, so the downstream Arrow-UDF stage inherits the pair
    # relation's partitioning — which AQE coalesces to ~minPartitionSize
    # because pairs are 16 B/row (measured: the s=1000 merge UDF ran
    # 4-wide on 16 slots, 75 s of the 113 s verify wall; plus the driver
    # serially built 2x ~300 MB broadcasts). The shuffled-hash join lands
    # both sides on the configured shuffle width, the UDF runs at full
    # slot parallelism, and no fat-row sort or driver broadcast happens.
    # At web scale the sketch side is never broadcastable, so this stays
    # the production path.
    return cands.hint("shuffle_hash").join(side, id_col)


def verify_pairs(cands: DataFrame, sketches: DataFrame, params: SketchParams,
                 jaccard_threshold: float | None = None,
                 max_distance: float | None = None,
                 max_pvalue: float | None = None,
                 with_pvalue: bool = False,
                 prefix_filter: int | None = 128,
                 prefix_margin: float = 0.15,
                 materialize_tier1: bool = True) -> DataFrame:
    """Attach Mash-exact (common, denom, jaccard, mash_dist[, p_value]) to a
    candidate-pair DataFrame (id_a, id_b), id_a < id_b.

    Two-tier verification when ``jaccard_threshold`` and ``prefix_filter``
    are set: tier 1 joins only the bottom-``prefix_filter`` prefix of each
    sketch (``substring`` of the binary blob — 1 KB instead of 8 KB per
    side) and drops pairs whose prefix-Jaccard estimate is below
    ``threshold - prefix_margin``; tier 2 runs the full-s Mash-exact merge
    on the survivors. The prefix estimate over m hashes has sd
    ~ sqrt(j(1-j)/m) (~0.04 at m=128, j=0.7), so a 0.15 margin is >3.5 sd
    — boilerplate-only candidate junk (j ~ 0.0-0.3) dies at 1/8 of the
    shuffle cost, true pairs are untouched, and the FINAL numbers are
    always the full-s exact ones (precision is never affected).

    Join strategy: shuffled-hash joins (no fat-row sorts); the cheap
    jaccard threshold runs before the p-value UDF (cheap-filter-first,
    CommandDistance.cpp:409-417).
    """
    embedded = params_from_schema(sketches)
    if embedded is not None:  # refuse mismatched tables (F6, Sketch.cpp:133-160)
        params.check_compatible(embedded)
    sk = sketches.select("doc_id", "sketch", "card_est")
    small = _sketch_side_small(sk)
    if small:
        # broadcast-attach path: the pair relation often arrives with
        # the partitioning of a tiny crossJoin side — spread it so the
        # merge UDF runs at full slot width (explicit N: AQE does not
        # re-coalesce a user-numbered repartition)
        cands = cands.repartition(int(sk.sparkSession.conf.get(
            "spark.sql.shuffle.partitions")))
    use_prefix = (
        prefix_filter is not None
        and jaccard_threshold is not None
        and prefix_filter < params.s
    )
    if use_prefix:
        # widen the margin to >=6 sd of the m-hash estimator so borderline
        # true pairs are essentially never pre-filtered (P < 1e-9/pair)
        import math

        t = float(jaccard_threshold)
        sigma = math.sqrt(max(t * (1.0 - t), 0.05) / float(prefix_filter))
        prefix_margin = max(float(prefix_margin), 6.0 * sigma)
        pre = F.substring(F.col("sketch"), 1, int(prefix_filter) * 8)
        pvu = make_verify_udf(int(prefix_filter))
        tier1 = _attach(cands, sk, "id_a", "a", pre, small=small)
        tier1 = _attach(tier1, sk, "id_b", "b", pre, small=small)
        tier1 = tier1.withColumn(
            "_p", pvu(F.col("sketch_a"), F.col("sketch_b"))
        ).select(
            "id_a", "id_b",
            (F.col("_p.common") / F.greatest(F.col("_p.denom"), F.lit(1))).alias("_jpre"),
        )
        cands = tier1.filter(
            F.col("_jpre") >= float(jaccard_threshold) - float(prefix_margin)
        ).select("id_a", "id_b")
        if materialize_tier1:
            # materialize the survivor list ONCE (16 B rows): it is
            # consumed by the tier-2 attach chain AND both branches of the
            # surv_ids union below — without this, the whole tier-1
            # subtree (attach joins + prefix-verify UDF over EVERY
            # candidate) re-executes once per consumer (measured 3-5x in
            # the optimized plan; exchange reuse does not cover the
            # differently-partitioned branches). Callers inside
            # foreachBatch must pass materialize_tier1=False —
            # localCheckpoint there breaks the micro-batch file-sink
            # commit (see streaming.process_batch) — and accept the cheap
            # per-batch re-execution instead. Block release is the
            # caller's pipeline-level concern (pipeline.DedupResult
            # .release() sweeps every checkpoint created during the run).
            # eager: the survivor list has three consumers whose AQE jobs
            # launch concurrently; a lazy checkpoint makes their tasks
            # race on the checkpoint lock (see lsh.candidate_pairs).
            cands = cands.localCheckpoint(eager=True)
        # restrict the fat table to survivor ids BEFORE the attach joins so
        # they only move survivors' sketches instead of the whole table.
        # No forced broadcast hint: the survivor-id set is O(true pairs)
        # and unbounded at web scale — AQE picks broadcast vs shuffled
        # semi-join from the measured size (autoBroadcastJoinThreshold is
        # tuned in session.py), so small runs still get the broadcast plan
        # without the OOM cliff a hard F.broadcast() would create.
        surv_ids = (
            cands.select(F.col("id_a").alias("doc_id"))
            .unionByName(cands.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        # SHUFFLE_HASH hint, build = the skinny survivor-id set: the
        # checkpointed relations here are ExistingRDD scans with no size
        # stats, so the planner (even with preferSortMergeJoin=false)
        # falls back to SORT-merge for this semi-join and SORTS the fat
        # 8 KB-row sketch relation — twice, once per attach side
        # (round-6 executed-plan audit: 2x "SortMergeJoin LeftSemi" +
        # "Sort [doc_id]" over the sketch exchange). The hint forces a
        # shuffled-hash semi build on the id set; the fat side's
        # doc_id exchange remains (and is reused by the attach join's
        # partitioning requirement), the sorts disappear.
        sk = sk.join(surv_ids.hint("shuffle_hash"), "doc_id", "left_semi")

    df = _attach(cands, sk, "id_a", "a", F.col("sketch"), small=small)
    df = _attach(df, sk, "id_b", "b", F.col("sketch"), small=small)
    return _merge_and_score(df, params, jaccard_threshold=jaccard_threshold,
                            max_distance=max_distance, max_pvalue=max_pvalue,
                            with_pvalue=with_pvalue)


def _merge_and_score(df: DataFrame, params: SketchParams,
                     jaccard_threshold: float | None = None,
                     max_distance: float | None = None,
                     max_pvalue: float | None = None,
                     with_pvalue: bool = False) -> DataFrame:
    """(id_a, id_b, sketch_a, sketch_b, card_a, card_b) -> scored pairs:
    the Mash-exact capped merge plus distance/p-value column expressions
    and the reference's -d/-v filters (shared tail of ``verify_pairs``
    and ``cross_dist``)."""
    vu = make_verify_udf(params.s)
    df = df.withColumn("_v", vu(F.col("sketch_a"), F.col("sketch_b")))
    df = df.select(
        "id_a", "id_b", "card_a", "card_b",
        F.col("_v.common").alias("common"),
        F.col("_v.denom").alias("denom"),
    )
    df = df.withColumn(
        "jaccard",
        F.when(F.col("denom") > 0, F.col("common") / F.col("denom")).otherwise(F.lit(0.0)),
    )
    # Mash distance as a pure column expression (CommandDistance.cpp:387-407)
    j = F.col("jaccard")
    dist = -F.log(2.0 * j / (1.0 + j)) / F.lit(float(params.k))
    # common==0 is tested FIRST: the reference's branch order
    # (common==denom first) is safe only because mash drops sub-k
    # records at sketch time; we retain empty-sketch docs, and an
    # empty-vs-empty pair has common==denom==0 — it must score as
    # maximally distant (1.0), not as a perfect match (0.0)
    df = df.withColumn(
        "mash_dist",
        F.when(F.col("common") == 0, F.lit(1.0))
        .when(F.col("common") == F.col("denom"), F.lit(0.0))
        .otherwise(F.least(dist, F.lit(1.0))),
    )
    if jaccard_threshold is not None:
        df = df.filter(F.col("jaccard") >= float(jaccard_threshold))
    if max_distance is not None:  # reference -d filter, CommandDistance.cpp:409-412
        df = df.filter(F.col("mash_dist") <= float(max_distance))
    if with_pvalue or max_pvalue is not None:
        pu = make_pvalue_udf(params.kmer_space, params.s)
        df = df.withColumn("p_value", pu(F.col("common"), F.col("card_a"), F.col("card_b")))
        if max_pvalue is not None:  # reference -v filter, CommandDistance.cpp:419-422
            df = df.filter(F.col("p_value") <= float(max_pvalue))
    return df.drop("card_a", "card_b")


def cross_dist(ref_sketches: DataFrame, query_sketches: DataFrame,
               params: SketchParams,
               max_distance: float | None = None,
               max_pvalue: float | None = None,
               with_pvalue: bool = True,
               upper_only: bool = False) -> DataFrame:
    """Exhaustive ref × query Mash distances — the exact form of J4
    (``mash dist`` prints EVERY query×ref pair, ``CommandDistance.cpp``
    main loop; ``mash triangle`` is the self case with i<j,
    ``CommandTriangle.cpp:159-198``).

    The output is O(|ref|·|query|) BY DEFINITION, so this is the
    reference-parity surface for moderate N (a 10^4×10^4 run is 10^8
    skinny rows — fine distributed); at web scale the near-duplicate
    path is ``lsh.candidate_pairs`` + ``verify_pairs``, which never
    enumerates non-colliding pairs. The pair relation here is two 8-byte
    ids; sketches attach via the same skinny-pair shuffled-hash joins as
    ``verify_pairs``, so no fat row ever enters the cross product.

    ``upper_only=True`` keeps id_a < id_b (triangle). Param compat is
    enforced against both tables' embedded params (Sketch.cpp:133-160).
    """
    for t in (ref_sketches, query_sketches):
        embedded = params_from_schema(t)
        if embedded is not None:
            params.check_compatible(embedded)
    cands = (
        ref_sketches.select(F.col("doc_id").alias("id_a"))
        .crossJoin(query_sketches.select(F.col("doc_id").alias("id_b")))
    )
    if upper_only:
        cands = cands.filter(F.col("id_a") < F.col("id_b"))
    ra = ref_sketches.select("doc_id", "sketch", "card_est")
    qb = query_sketches.select("doc_id", "sketch", "card_est")
    small_a, small_b = _sketch_side_small(ra), _sketch_side_small(qb)
    if small_a and small_b:
        # both sides broadcast: spread the crossJoin output so the merge
        # UDF is not bound to the left side's (tiny) partitioning
        cands = cands.repartition(int(ra.sparkSession.conf.get(
            "spark.sql.shuffle.partitions")))
    df = _attach(cands, ra, "id_a", "a", F.col("sketch"), small=small_a)
    df = _attach(df, qb, "id_b", "b", F.col("sketch"), small=small_b)
    return _merge_and_score(df, params, max_distance=max_distance,
                            max_pvalue=max_pvalue, with_pvalue=with_pvalue)


def best_k_hits(pairs: DataFrame, b: int, query_col: str = "id_b",
                ref_col: str = "id_a") -> DataFrame:
    """F7: keep the ``b`` best hits per query, ties to the earlier ref —
    the reference's ``find -b`` semantics (``CommandFind.cpp:37``,
    compiled-out command; same shape as dist users' post-filter).

    A per-query ``row_number`` window: partitions shuffle on the query id,
    so the work distributes across executors; no driver-side sort. Skewed
    queries (one query hitting everything) are bounded by the upstream
    candidate caps, not by this operator.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(query_col).orderBy(
        F.asc("mash_dist"), F.asc(ref_col))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(b))
        .drop("_rn")
    )
