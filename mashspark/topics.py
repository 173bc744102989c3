"""Unsupervised topic clustering for mixture balancing: spherical
k-means over stateless hashing-TF document vectors, plus the
temperature-balanced sampling plan over the discovered topics — the
"cluster the corpus, then rebalance what you train on" stage
(DoReMi-adjacent domain discovery; SemDeDup's clustering half applied
to the text path when no model embeddings exist).

Composition over invention — every stage is an already-tested operator:

- Vectors: ``textstats.hashing_tf_vectors`` (murmur3 bucketing, no
  vocabulary state, JVM-side; L2-normalized so dot = cosine).
- Training: ``ann.ivf_train`` — deterministic init (k smallest ids),
  one pass per Lloyd iteration emitting ONLY per-partition partial
  sums (O(partitions x k x dim) collected, corpus-size-independent).
  Deliberately NOT MLlib KMeans: the partials-only loop is already
  plan-audited here, deterministic under fixed inputs, and the
  quantizer stays a plain numpy array any UDF closure can ship.
- Assignment: ``ann.make_ivf_assign_udf`` — map-only, quantizer in
  the closure.
- Balancing: ``sampling.mixture_plan`` / ``sampling.stratified_sample``
  keyed on the topic column — deterministic md5 sampling, so the
  balanced subset is append-stable and repartition-invariant.

Reference scope note: the reference has no clustering beyond
connected components; this stage comes from the task brief's
training-data axis (mixture/domain balancing).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mashspark.ann import ivf_train, make_ivf_assign_udf
from mashspark.textstats import hashing_tf_vectors


def topic_model(docs: DataFrame, n_topics: int = 8, dim: int = 256,
                n_iters: int = 4, id_col: str = "doc_id",
                text_col: str = "text",
                sample_mod: int | None = None) -> np.ndarray:
    """Train the (n_topics, dim) topic centroids. ``sample_mod=m``
    trains on the deterministic 1/m id-hash sample — at 10^12 docs the
    quantizer needs a sample, not the corpus."""
    vecs = hashing_tf_vectors(docs, dim=dim, id_col=id_col,
                              text_col=text_col)
    return ivf_train(vecs, n_lists=n_topics, n_iters=n_iters,
                     id_col=id_col, vec_col="embedding",
                     sample_mod=sample_mod)


def assign_topics(docs: DataFrame, centroids: np.ndarray,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, topic): nearest-centroid cosine assignment, map-only
    (vectors recomputed in the same pass — cheaper than materializing
    a corpus-wide vector column just to read it once)."""
    dim = centroids.shape[1]
    vecs = hashing_tf_vectors(docs, dim=dim, id_col=id_col,
                              text_col=text_col)
    assign = make_ivf_assign_udf(centroids)
    return vecs.select(
        F.col(id_col),
        assign(F.col("embedding")).cast("int").alias("topic"),
    )


def topic_balanced_sample(docs: DataFrame, centroids: np.ndarray,
                          temperature: float = 2.0,
                          target_frac: float = 0.5,
                          salt: str = "topics",
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Temperature-balanced subset across discovered topics: topics are
    weighted by size^(1/T) (T>1 flattens toward uniform — boosts rare
    topics, shrinks mega-topics), renormalized to draw ``target_frac``
    of the corpus in expectation, and sampled with the deterministic
    md5 rule (append-stable, repartition-invariant). Per-topic rates
    are capped at 1.0 (this operator subsamples; epoch repetition of
    rare topics is ``mixture_plan``'s job). Returns the surviving
    (id, topic) rows."""
    from mashspark.sampling import hash_uniform

    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    assigned = docs.select(id_col, text_col)
    # materialize the (id, topic) relation ONCE: it feeds BOTH the
    # per-topic counts collect below and the returned filtered plan —
    # without it the hashing-TF + assignment UDF runs over the full
    # corpus twice (the dominant cost at scale). localCheckpoint rather
    # than persist: persist() pinned executor storage for the
    # SparkContext's lifetime with no handle for the caller to
    # unpersist; checkpoint blocks are freed by the ContextCleaner as
    # soon as the caller drops the returned DataFrame.
    topics = assign_topics(assigned, centroids, id_col, text_col) \
        .localCheckpoint(eager=True)
    counts = {int(r["topic"]): int(r["n"]) for r in
              topics.groupBy("topic").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values()) or 1
    tw = {t: n ** (1.0 / temperature) for t, n in counts.items()}
    z = sum(tw.values()) or 1.0
    # expected draw = target_frac * total, split by tempered weights
    rates = {t: min(1.0, (tw[t] / z) * target_frac * total / counts[t])
             for t in counts}
    # exact integer thresholds in the md5-uniform's [0, 2^32) space —
    # the same no-float-boundary discipline as sampling.split_assign
    thresh = {t: int(r * (1 << 32)) for t, r in rates.items()}
    cut = F.lit(0).cast("long")
    for t, c in sorted(thresh.items()):
        cut = F.when(F.col("topic") == t, F.lit(c).cast("long")) \
            .otherwise(cut)
    return topics.filter(hash_uniform(F.col(id_col), salt) < cut)
