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

from .compare import binom_sf, capped_merge
from .hashing import decode_signed
from .params import SketchParams

_MERGE_FIELDS = StructType(
    [StructField("common", IntegerType(), False), StructField("denom", IntegerType(), False)]
)


def make_verify_udf(sketch_size: int):
    """(sketch_a, sketch_b) -> struct(common, denom).

    sketch columns are sign-flip-encoded int64 arrays; signed sort order ==
    unsigned order, so the capped merge can run directly on the encoded
    values — ``capped_merge`` only relies on ordering and equality, both
    preserved by the encoding. (We still decode to uint64 for clarity.)
    """

    @pandas_udf(_MERGE_FIELDS)
    def verify_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
        n = len(a)
        common = np.zeros(n, dtype=np.int32)
        denom = np.zeros(n, dtype=np.int32)
        for i in range(n):
            sa = decode_signed(np.asarray(a.iloc[i], dtype=np.int64))
            sb = decode_signed(np.asarray(b.iloc[i], dtype=np.int64))
            # sketch_size is min(s_a, s_b) of the PARAMETER s
            # (CommandDistance.cpp:313-315); both sides share one config
            # here (enforced by SketchParams.check_compatible). Short docs
            # (len < s) exhaust the merge early and top up, as in the
            # reference.
            c, d = capped_merge(sa, sb, sketch_size)
            common[i] = c
            denom[i] = d
        return pd.DataFrame({"common": common, "denom": denom})

    return verify_udf


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

    return pvalue_udf


def verify_pairs(cands: DataFrame, sketches: DataFrame, params: SketchParams,
                 jaccard_threshold: float | None = None,
                 max_distance: float | None = None,
                 max_pvalue: float | None = None,
                 with_pvalue: bool = False) -> DataFrame:
    """Attach Mash-exact (common, denom, jaccard, mash_dist[, p_value]) to a
    candidate-pair DataFrame (id_a, id_b), id_a < id_b.

    Join strategy: two shuffle joins against the sketch table on its key —
    at scale both sides are bucketable by doc_id so the joins co-locate;
    the cheap jaccard threshold runs before the p-value UDF.
    """
    sk = sketches.select(
        F.col("doc_id"), F.col("sketch"), F.col("card_est")
    )
    df = (
        cands.join(sk.withColumnRenamed("doc_id", "id_a")
                     .withColumnRenamed("sketch", "sketch_a")
                     .withColumnRenamed("card_est", "card_a"), "id_a")
        .join(sk.withColumnRenamed("doc_id", "id_b")
                .withColumnRenamed("sketch", "sketch_b")
                .withColumnRenamed("card_est", "card_b"), "id_b")
    )
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
    df = df.withColumn(
        "mash_dist",
        F.when(F.col("common") == F.col("denom"), F.lit(0.0))
        .when(F.col("common") == 0, F.lit(1.0))
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
