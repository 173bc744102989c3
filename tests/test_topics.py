"""Topic clustering + temperature-balanced sampling
(mashspark/topics.py)."""

from pyspark.sql import functions as F

from mashspark.topics import assign_topics, topic_balanced_sample, topic_model


def _corpus(spark, n_a=80, n_b=20):
    """Two disjoint-vocabulary families, heavily imbalanced."""
    rows = []
    for i in range(n_a):
        rows.append((i, " ".join(f"alpha{j % 7}" for j in range(i % 5 + 20)),
                     "a"))
    for i in range(n_b):
        rows.append((1000 + i,
                     " ".join(f"beta{j % 6}" for j in range(i % 4 + 20)),
                     "b"))
    return spark.createDataFrame(rows, "doc_id long, text string, fam string")


def test_topics_separate_disjoint_vocabularies(spark):
    docs = _corpus(spark)
    cent = topic_model(docs, n_topics=2, dim=64, n_iters=4)
    assert cent.shape == (2, 64)
    got = assign_topics(docs, cent).join(docs.select("doc_id", "fam"),
                                         "doc_id")
    # every family maps to exactly one topic, and they differ
    fams = {r["fam"]: set() for r in got.select("fam").distinct().collect()}
    for r in got.collect():
        fams[r["fam"]].add(r["topic"])
    assert len(fams["a"]) == 1 and len(fams["b"]) == 1
    assert fams["a"] != fams["b"]


def test_assignment_is_deterministic(spark):
    docs = _corpus(spark)
    cent = topic_model(docs, n_topics=2, dim=64, n_iters=2)
    a = {(r["doc_id"], r["topic"])
         for r in assign_topics(docs.repartition(1), cent).collect()}
    b = {(r["doc_id"], r["topic"])
         for r in assign_topics(docs.repartition(5), cent).collect()}
    assert a == b


def test_balanced_sample_flattens_mixture(spark):
    docs = _corpus(spark, n_a=160, n_b=40)
    cent = topic_model(docs, n_topics=2, dim=64, n_iters=4)
    kept = topic_balanced_sample(docs, cent, temperature=100.0,
                                 target_frac=0.4)
    got = {r["topic"]: r["n"] for r in
           kept.groupBy("topic").agg(F.count("*").alias("n")).collect()}
    # T -> inf: equal expected draw per topic (40 each from 200 * 0.4);
    # the small topic (40 docs) gets a much higher rate than the big one
    assert len(got) == 2
    big, small = max(got.values()), min(got.values())
    assert big / small < 2.5  # raw imbalance was 4.0
    # deterministic: same call, same survivors
    again = topic_balanced_sample(docs, cent, temperature=100.0,
                                  target_frac=0.4)
    assert {r["doc_id"] for r in kept.collect()} == \
        {r["doc_id"] for r in again.collect()}


def test_balanced_sample_rate_cap(spark):
    """target_frac near 1 with strong flattening: rare-topic rate would
    exceed 1.0 and must cap (subsample semantics, never repeat)."""
    docs = _corpus(spark, n_a=160, n_b=8)
    cent = topic_model(docs, n_topics=2, dim=64, n_iters=4)
    kept = topic_balanced_sample(docs, cent, temperature=100.0,
                                 target_frac=0.9)
    per_doc = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert per_doc.filter("n > 1").count() == 0
    assert kept.count() <= 168
