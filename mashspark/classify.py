"""Trained quality-filter classifier — the fastText-style curation
stage: label a small seed set (wiki-like = good, spammy = bad), train a
linear classifier over stateless text features, score every document,
filter or stratify on the probability.

Spark-first composition, no hand-rolled training loop: features come
from ``textstats.hashing_tf_vectors`` (stateless murmur3 bucketing — no
vocabulary to ship), the model is MLlib's distributed
``LogisticRegression`` (L-BFGS over partition-parallel gradient
aggregation — the same treeAggregate pattern a manual implementation
would rebuild, already fault-tolerant and scale-tested), and scoring is
a map-only transform whose model weights ship once per executor via the
closure. At 10^12 docs the training set is the small labeled seed
(classifier training data is always tiny next to the corpus); the
expensive part — scoring the corpus — is one embarrassingly parallel
pass.

Everything is DataFrame-in / DataFrame-out so the stage composes with
the rest of the curation funnel (dedup -> quality -> split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mashspark.textstats import hashing_tf_vectors


def _features(docs: DataFrame, dim: int, id_col: str,
              text_col: str) -> DataFrame:
    """(id, features vector) via the stateless hashing-TF bridge."""
    from pyspark.ml.functions import array_to_vector

    vec = hashing_tf_vectors(docs, dim=dim, id_col=id_col,
                             text_col=text_col)
    return vec.select(
        id_col,
        array_to_vector(F.col("embedding").cast("array<double>"))
        .alias("features"),
    )


def train_quality_model(
    labeled: DataFrame,
    dim: int = 256,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the quality model on a labeled seed set (``label_col`` in
    {0, 1}; 1 = keep-quality). Returns the fitted MLlib model."""
    from pyspark.ml.classification import LogisticRegression

    feats = _features(labeled, dim, id_col, text_col).join(
        labeled.select(id_col, F.col(label_col).cast("double")
                       .alias(label_col)),
        id_col,
    )
    lr = LogisticRegression(
        featuresCol="features", labelCol=label_col,
        regParam=reg_param, maxIter=max_iter, standardization=False,
    )
    return lr.fit(feats)


def score_quality(
    docs: DataFrame,
    model,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, quality_prob, keep) for every document: one map-only pass
    (hashing-TF + the linear model's dot product; weights travel in the
    task closure, no join)."""
    from pyspark.ml.functions import vector_to_array

    feats = _features(docs, dim, id_col, text_col)
    scored = model.transform(feats)
    prob = vector_to_array(F.col("probability")).getItem(1)
    return scored.select(
        id_col,
        prob.alias("quality_prob"),
        (prob >= 0.5).alias("keep"),
    )
