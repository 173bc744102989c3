"""End-to-end near-duplicate pipeline:

documents -> sketches -> exact-dup collapse -> LSH candidates ->
Mash-exact verify -> duplicate edges -> connected components -> clusters.

Stage map to the reference: sketching = ``mash sketch``
(``Sketch.cpp:105-253``), pairwise verification = ``mash dist`` semantics
(``CommandDistance.cpp:336-448``) restricted to LSH candidates, edge list =
``mash triangle -E`` (``CommandTriangle.cpp:200-214``), clustering is ours
(the reference leaves clustering to the user).

Scale notes (the 100 TB story):
* sketching is map-only — linear in executors, no shuffle;
* exact-dup collapse groups on the full sketch array (value equality, no
  64-bit-fingerprint birthday collisions at 10^12 docs) and removes the
  dominant bucket skew before LSH;
* the band join shuffles (band_idx, band_key, doc_id) — 12 bytes + key per
  band entry, NOT the sketches;
* sketches are re-joined only for surviving candidate pairs;
* every groupBy/join key is salted or AQE-split per ``lsh.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cc as _cc
from . import lsh as _lsh
from . import verify as _verify
from .params import PipelineConfig
from .sketch import sketch_documents


@dataclass
class DedupResult:
    sketches: DataFrame      # doc_id, sketch, n_kmers, card_est, band_idx, band_key
    exact_groups: DataFrame  # doc_id, rep_id  (identical-sketch members)
    pairs: DataFrame         # verified rep pairs: id_a, id_b, common, denom, jaccard, mash_dist
    edges: DataFrame         # duplicate edges over ALL docs (src, dst)
    clusters: DataFrame      # doc_id, cluster_id (min doc_id of cluster)
    lsh_metrics: DataFrame   # bucket/skew metrics (one row)


def exact_collapse(sketches: DataFrame) -> DataFrame:
    """(doc_id, rep_id): rep = min doc_id among docs with IDENTICAL sketch.

    Grouping key is the sketch array itself (value equality) — exact
    duplicates and exact sketch-collisions collapse to one representative
    before LSH, removing mirrored/templated mega-buckets (skew source #1).
    Empty sketches (docs shorter than k) are NOT collapsed together — an
    empty sketch carries no similarity evidence; such docs stay singletons.
    """
    nonempty = sketches.filter(F.size("sketch") > 0)
    groups = nonempty.groupBy("sketch").agg(F.min("doc_id").alias("rep_id"))
    members = nonempty.join(groups, "sketch").select("doc_id", "rep_id")
    empty = (
        sketches.filter(F.size("sketch") == 0)
        .select("doc_id", F.col("doc_id").alias("rep_id"))
    )
    return members.unionByName(empty)


def dedup_pipeline(docs: DataFrame, config: PipelineConfig | None = None,
                   id_col: str = "doc_id", text_col: str = "text") -> DedupResult:
    config = config or PipelineConfig()
    sp = config.sketch

    sketches = sketch_documents(docs, sp, config.lsh, id_col=id_col, text_col=text_col)
    sketches = sketches.persist()

    exact_groups = exact_collapse(sketches)
    reps = (
        exact_groups.filter(F.col("doc_id") == F.col("rep_id"))
        .select(F.col("rep_id").alias("doc_id"))
        .join(sketches, "doc_id")
    )

    cand, lsh_metrics = _lsh.candidate_pairs(
        reps,
        band_doc_cap=config.lsh.band_doc_cap,
        hard_bucket_cap=config.lsh.hard_bucket_cap,
    )
    pairs = _verify.verify_pairs(
        cand,
        reps,
        sp,
        jaccard_threshold=config.jaccard_threshold,
        max_distance=config.max_distance,
        max_pvalue=config.max_pvalue,
    )

    # duplicate edges: verified rep-rep edges + member->rep edges of
    # exact-dup groups (exact dups are duplicates by definition: j = 1).
    rep_edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    member_edges = (
        exact_groups.filter(F.col("doc_id") != F.col("rep_id"))
        .select(F.col("doc_id").alias("src"), F.col("rep_id").alias("dst"))
    )
    edges = rep_edges.unionByName(member_edges)

    comp = _cc.connected_components(
        edges,
        max_iterations=config.cc_max_iterations,
        driver_threshold=config.cc_driver_threshold,
    )
    all_ids = sketches.select("doc_id")
    clusters = (
        all_ids.join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )

    return DedupResult(
        sketches=sketches,
        exact_groups=exact_groups,
        pairs=pairs,
        edges=edges,
        clusters=clusters,
        lsh_metrics=lsh_metrics,
    )
