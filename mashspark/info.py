"""Sketch-collection utilities: histogram, cardinality, union ("paste"),
JSON dump, error-bound table — the reference's ``info``/``paste``/``bounds``
surface (SURVEY.md §2: A5, A7, S7, S9; ``CommandInfo.cpp``,
``CommandPaste.cpp:30-89``, ``CommandBounds.cpp:36-136``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from .compare import binom_sf
from .hashing import decode_sketch_bytes
from .params import SketchParams


def sketch_cardinalities(sketches: DataFrame, s: int | None = None) -> DataFrame:
    """Per-doc KMV distinct-shingle estimate recomputed from the sketch
    (2^64 * size / max_hash, MinHashHeap.h:45; double math like the
    reference). Sketches are binary blobs, so the max-hash extraction is a
    vectorized pandas UDF over the final 8 bytes.

    ``s`` = the sketch-size parameter the sketches were built with: an
    UNSATURATED sketch (n < s) holds every distinct shingle, so its exact
    cardinality is n — the KMV extrapolation only applies at saturation
    (matches ``sketch.card_est`` / reference reads-mode length,
    ``Sketch.cpp:1272-1282``). ``s=None`` keeps the estimator everywhere."""
    @pandas_udf(LongType())
    def kmv_udf(blobs: pd.Series) -> pd.Series:
        out = np.zeros(len(blobs), dtype=np.int64)
        for i, b in enumerate(blobs):
            if b is not None and len(b):
                n = len(b) // 8
                if s is not None and n < s:
                    out[i] = n
                    continue
                mx = float(decode_sketch_bytes(b[-8:])[0])
                out[i] = int(2.0**64 * n / mx) if mx else n
        return pd.Series(out)

    return sketches.select(
        "doc_id",
        (F.length("sketch") / 8).cast("long").alias("sketch_n"),
        kmv_udf(F.col("sketch")).alias("kmv_cardinality"),
    )


def coverage_estimates(sketches_with_counts: DataFrame) -> DataFrame:
    """A6 coverage estimate: mean multiplicity of the surviving sketch
    hashes (``estimateMultiplicity``, MinHashHeap.h:44) as a pure column
    expression over the ``counts`` column produced by
    ``sketch.sketch_documents_with_counts``. The reference's coverage-based
    early stop (Sketch.cpp:1258-1262) has no batch analog — the estimate
    itself is the operator."""
    return sketches_with_counts.select(
        "doc_id",
        F.when(
            F.size("counts") > 0,
            F.aggregate("counts", F.lit(0).cast("long"), lambda a, x: a + x)
            / F.size("counts"),
        ).otherwise(F.lit(0.0)).alias("coverage"),
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
    """Union compatible sketch collections (CommandPaste.cpp:30-89).
    Parameter compatibility is ENFORCED when both tables carry embedded
    params (schema metadata set by ``sketch.sketch_documents``) — the
    reference refuses mismatched files at load (Sketch.cpp:133-160)."""
    from .params import params_from_schema

    base = params_from_schema(sketch_dfs[0])
    out = sketch_dfs[0]
    for df in sketch_dfs[1:]:
        p = params_from_schema(df)
        if base is not None and p is not None:
            base.check_compatible(p)
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
                F.col("sketch").alias("hashes_b64"),  # binary -> base64 in JSON
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
