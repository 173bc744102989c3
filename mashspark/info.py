"""Sketch-collection utilities: histogram, cardinality, union ("paste"),
JSON dump, error-bound table — the reference's ``info``/``paste``/``bounds``
surface (SURVEY.md §2: A5, A7, S7, S9; ``CommandInfo.cpp``,
``CommandPaste.cpp:30-89``, ``CommandBounds.cpp:36-136``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compare import binom_sf
from .params import SketchParams


def sketch_cardinalities(sketches: DataFrame) -> DataFrame:
    """Per-doc KMV distinct-shingle estimate recomputed as a column expr
    (2^64 * size / max_hash, MinHashHeap.h:45). Sketches are sign-encoded,
    so max unsigned = last element decoded: (x XOR 2^63) as unsigned =
    x + 2^63 in real terms; computed in double precision like the
    reference."""
    last = F.element_at(F.col("sketch"), F.size("sketch"))
    max_u = F.col("_last").cast("double") + F.lit(float(2**63))
    return (
        sketches.withColumn("_last", last)
        .select(
            "doc_id",
            F.size("sketch").alias("sketch_n"),
            F.when(F.size("sketch") == 0, F.lit(0))
            .otherwise(
                (F.lit(float(2**64)) * F.size("sketch") / max_u).cast("long")
            )
            .alias("kmv_cardinality"),
        )
    )


def count_histogram(sketches_with_counts: DataFrame) -> DataFrame:
    """Histogram of hash multiplicities per sketch (info -c,
    Sketch.cpp:63-82): (doc_id, multiplicity, n_hashes)."""
    return (
        sketches_with_counts.select("doc_id", F.explode("counts").alias("multiplicity"))
        .groupBy("doc_id", "multiplicity")
        .agg(F.count("*").alias("n_hashes"))
    )


def paste(*sketch_dfs: DataFrame) -> DataFrame:
    """Union compatible sketch collections (CommandPaste.cpp:30-89);
    parameter compatibility is the caller's contract
    (SketchParams.check_compatible)."""
    out = sketch_dfs[0]
    for df in sketch_dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def sketch_json_dump(sketches: DataFrame, params: SketchParams) -> DataFrame:
    """JSON-dump rows compatible in spirit with the reference's info -d
    schema (schema-1.0.0.json): one JSON doc per sketch with header params
    inlined (our golden-file interchange format)."""
    hdr = F.struct(
        F.lit(params.k).alias("kmer"),
        F.lit(params.s).alias("sketchSize"),
        F.lit("MurmurHash3_x64_128").alias("hashType"),
        F.lit(64).alias("hashBits"),
        F.lit(params.seed).alias("hashSeed"),
    )
    return sketches.select(
        F.to_json(
            F.struct(
                hdr.alias("params"),
                F.col("doc_id").alias("name"),
                F.col("card_est").alias("length"),
                F.col("sketch").alias("hashes_signed"),
            )
        ).alias("json")
    )


def bounds_table(params: SketchParams, prob: float = 0.99,
                 distances=(0.05, 0.1, 0.15, 0.2, 0.25, 0.3)) -> list[dict]:
    """Closed-form Mash-distance error bounds (CommandBounds.cpp:36-136):
    for each target distance, the +/- error at confidence ``prob`` given
    sketch size s. Driver-side utility (no DataFrame; matches the
    reference, which prints a table)."""
    s = params.s
    k = params.k
    out = []
    for d in distances:
        j = 1.0 / (2.0 * math.exp(k * d) - 1.0)  # invert D = -ln(2j/(1+j))/k
        # binomial quantile search on shared-count x ~ Bin(s, j)
        lo_x, hi_x = 0, s
        tail = (1.0 - prob) / 2.0
        # upper quantile: smallest x with P(X >= x) <= tail
        x = int(s * j)
        while x <= s and float(binom_sf(x - 1, j, s)[0]) > tail:
            x += 1
        hi_x = min(x, s)
        # lower quantile: largest x with P(X <= x) <= tail
        x = int(s * j)
        while x >= 0 and 1.0 - float(binom_sf(x, j, s)[0]) > tail:
            x -= 1
        lo_x = max(x, 0)

        def dist_of(c):
            if c <= 0:
                return 1.0
            jj = c / s
            return min(1.0, -math.log(2.0 * jj / (1.0 + jj)) / k)

        out.append(
            {
                "distance": d,
                "jaccard": j,
                "err_low": dist_of(hi_x) - d,
                "err_high": dist_of(lo_x) - d,
            }
        )
    return out
