"""Containment screen as a DataFrame op (reference ``mash screen``,
``CommandScreen.cpp:54-461``): which reference sketches are contained in a
mixture/corpus of documents, with what estimated identity.

Reference physical model: inverted hash table + atomic counters shared by
threads (``CommandScreen.cpp:93-116,571-575``). Spark model: explode the
sketch db to (hash, ref_id) — typically small: refs × s rows — broadcast
it, hash the mixture's shingles with the same vectorized UDF, join, and
let Catalyst's partial+final aggregation replace the atomics.

Webtext use case: "which boilerplate/template sketches occur inside these
pages" — containment, not symmetric resemblance (J6/J7 in SURVEY.md §2.4).

Also winner-take-all reallocation (``screen -w``,
``CommandScreen.cpp:357-407``) as a window rank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .hashing import encode_signed, hash_shingles_concat, signed_sketch_bytes
from .minhash import bottom_k, kmv_set_size
from .params import SketchParams


@pandas_udf(ArrayType(LongType()))
def sketch_bytes_to_array(blobs: pd.Series) -> pd.Series:
    """binary sketch blob -> array<long> (signed-encoded values)."""
    return pd.Series([signed_sketch_bytes(b) for b in blobs])


def make_all_hashes_udf(k: int, seed: int):
    """text -> array of ALL distinct shingle hashes (sign-encoded).

    The mixture side of screen is NOT sketched — every shingle counts
    (``CommandScreen.cpp:560-576``). Distinct-per-doc with counts kept at
    the aggregation level instead (multiplicity = per-doc occurrences
    summed across docs downstream)."""

    @pandas_udf(ArrayType(LongType()))
    def all_hashes_udf(texts: pd.Series) -> pd.Series:
        vals = texts.fillna("").astype(str).tolist()
        bufs = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in vals]
        lens = [len(b) for b in bufs]
        big = np.concatenate(bufs) if bufs else np.empty(0, dtype=np.uint8)
        all_h = hash_shingles_concat(big, k, seed)
        out = []
        off = 0
        for blen in lens:
            if blen < k:
                out.append(np.empty(0, dtype=np.int64))
            else:
                nk = blen - k + 1
                out.append(encode_signed(all_h[off : off + nk]))  # with repeats
            off += blen
        return pd.Series(out)

    return all_hashes_udf


def screen(refs_sketches: DataFrame, mixture_docs: DataFrame,
           params: SketchParams, min_cov: int = 1,
           identity_min: float | None = None,
           winner_take_all: bool = False,
           ref_id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (ref_id, shared, denom, identity, median_multiplicity).

    refs_sketches: output of ``sketch.sketch_documents`` (or any table with
    ref_id + ``sketch`` array). mixture_docs: raw documents.
    Identity = (shared/denom) ** (1/k) (``estimateIdentity``,
    CommandScreen.cpp:463-482); median multiplicity uses the reference's
    sorted_depths[shared // 2] convention (CommandScreen.cpp:436).
    """
    index = refs_sketches.select(
        F.col(ref_id_col).alias("ref_id"),
        (F.length("sketch") / 8).cast("int").alias("denom"),
        F.explode(sketch_bytes_to_array(F.col("sketch"))).alias("hash"),
    )

    udf = make_all_hashes_udf(params.k, params.seed)
    mix = (
        mixture_docs.select(F.explode(udf(F.col(text_col))).alias("hash"))
        .groupBy("hash")
        .agg(F.count("*").alias("mult"))
    )
    if min_cov > 1:
        mix = mix.filter(F.col("mult") >= min_cov)

    hits = mix.join(F.broadcast(index), "hash")

    if winner_take_all:
        # first pass scores, then each hash credits only the best ref
        prelim = hits.groupBy("ref_id", "denom").agg(F.count("*").alias("shared"))
        prelim = prelim.withColumn(
            "score", F.pow(F.col("shared") / F.col("denom"), 1.0 / params.k)
        )
        hits = hits.join(prelim.select("ref_id", "score"), "ref_id")
        w = Window.partitionBy("hash").orderBy(F.desc("score"), F.desc("denom"), F.asc("ref_id"))
        hits = hits.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    out = hits.groupBy("ref_id", "denom").agg(
        F.count("*").alias("shared"),
        F.sort_array(F.collect_list("mult")).alias("_depths"),
    )
    out = out.select(
        "ref_id",
        "shared",
        "denom",
        F.when(F.col("shared") == F.col("denom"), F.lit(1.0))
        .when(F.col("shared") == 0, F.lit(0.0))
        .otherwise(F.pow(F.col("shared") / F.col("denom"), 1.0 / params.k))
        .alias("identity"),
        F.element_at(
            F.col("_depths"), ((F.col("shared") / 2).cast("int") + 1)
        ).alias("median_multiplicity"),
    )
    if identity_min is not None:
        out = out.filter(F.col("identity") >= identity_min)
    return out


def mixture_set_size(mixture_docs: DataFrame, params: SketchParams,
                     text_col: str = "text") -> int:
    """KMV distinct-shingle estimate of the whole mixture
    (CommandScreen.cpp:322) — bottom-s of all shingle hashes via
    distributed min-merge: per-partition bottom-s, then driver merge."""
    udf = make_all_hashes_udf(params.k, params.seed)
    s = params.s
    exploded = mixture_docs.select(F.explode(udf(F.col(text_col))).alias("h"))
    rows = (
        exploded.select("h").distinct().orderBy("h").limit(s).collect()
    )
    from .hashing import decode_signed

    vals = decode_signed(np.array([r.h for r in rows], dtype=np.int64))
    return kmv_set_size(np.sort(vals)[:s])
