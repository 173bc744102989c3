"""Physical-plan audits: the properties that make the operators scale are
pinned here so a refactor can't silently regress them.

Each assertion names the scale behavior it guards:

* parquet scans receive pushed filters and pruned schemas (a 100 TB scan
  must not read columns or row groups the query doesn't touch);
* the sketch stage is map-only (no Exchange before the UDF — sketching
  10^12 docs must not shuffle the corpus);
* exact-collapse and the LSH bucket sizing do partial (map-side)
  aggregation before their exchange;
* the screen hash join broadcasts the reference index (mixture side must
  stream map-side, never shuffle on hash);
* verify's fat-sketch joins hash, not sort-merge (8 KB binary rows must
  not be sorted).
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from mashspark.params import LSHParams, PipelineConfig, SketchParams
from mashspark.sketch import sketch_documents
from mashspark.webtext import webtext_spark_df

PARAMS = SketchParams(k=21, s=64)
LSH = LSHParams(bands=16)


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "docs.parquet")
    webtext_spark_df(spark, n_base=30, seed=3).select(
        "doc_id", "url", "text", "lang").write.parquet(path)
    return path


def test_scan_pushdown_and_pruning(spark, docs_parquet):
    df = (
        spark.read.parquet(docs_parquet)
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "lang")
    )
    plan = plan_of(df)
    assert "PushedFilters: [" in plan and "LessThan(doc_id,50)" in plan, plan
    # pruned read schema: text/url must NOT be read for this projection
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema and "url" not in read_schema, read_schema


def test_sketch_stage_is_map_only(spark, docs_parquet):
    docs = spark.read.parquet(docs_parquet)
    sk = sketch_documents(docs, PARAMS, LSH)
    plan = plan_of(sk, "simple")
    assert "Exchange" not in plan, plan


def test_exact_collapse_partial_aggregation(spark, docs_parquet):
    from mashspark.pipeline import exact_collapse

    docs = spark.read.parquet(docs_parquet)
    sk = sketch_documents(docs, PARAMS, LSH)
    groups = exact_collapse(sk)
    plan = plan_of(groups, "simple")
    # partial agg before the exchange: HashAggregate appears on both sides
    # of the fingerprint exchange (map-side combine of the 24 B/doc keys)
    assert plan.count("HashAggregate") >= 2, plan
    assert "SortAggregate" not in plan, plan


def test_screen_broadcasts_reference_index(spark, docs_parquet):
    from mashspark.screen import screen

    docs = spark.read.parquet(docs_parquet)
    refs = docs.filter(F.col("doc_id") < 20)
    refs_sk = sketch_documents(refs, PARAMS, LSH)
    out = screen(refs_sk, docs, PARAMS)
    plan = plan_of(out, "simple")
    assert "BroadcastHashJoin" in plan, plan
    # the corpus-sized mixture hash table must never sort-merge
    assert "SortMergeJoin" not in plan, plan


def test_screen_aggregates_only_index_hits(spark, docs_parquet):
    """The mixture groupBy(hash) must sit ABOVE an index semi-join: the
    reference only counts hashes that hit the inverted index
    (CommandScreen.cpp:571-575), and aggregating first would shuffle
    O(corpus shingles) rows where O(index hits) suffice."""
    from mashspark.screen import screen

    docs = spark.read.parquet(docs_parquet)
    refs = docs.filter(F.col("doc_id") < 20)
    refs_sk = sketch_documents(refs, PARAMS, LSH)
    out = screen(refs_sk, docs, PARAMS)
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    lines = opt.splitlines()
    agg_hash = [i for i, l in enumerate(lines)
                if "Aggregate [hash" in l and "mult" in l]
    semi = [i for i, l in enumerate(lines) if "LeftSemi" in l]
    assert agg_hash and semi, opt
    # children print below parents: the semi-join must be a descendant of
    # the mult aggregate (index filter BEFORE the corpus-scale groupBy)
    assert semi[0] > agg_hash[0], opt


def test_substring_verify_joins_windows_not_texts(spark, docs_parquet):
    """The substring verify must attach ~min_len-byte window slices to the
    candidate-pair relation, never whole texts: a doc in P pairs must not
    replicate its full bytes P times through the join. Invariant: in the
    optimized plan, text encoding only ever appears already wrapped in the
    window substring() (i.e. sliced in the same projection)."""
    from mashspark.substring import substring_dup_pairs

    docs = spark.read.parquet(docs_parquet)
    out = substring_dup_pairs(docs, min_len=40, stride=8)
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    for line in opt.splitlines():
        if "Encode.encode" in line:
            assert "substring(" in line, line


def test_verify_joins_hash_not_sort_merge(spark, docs_parquet):
    from mashspark.verify import verify_pairs

    docs = spark.read.parquet(docs_parquet)
    sk = sketch_documents(docs, PARAMS, LSH)
    ids = sk.select("doc_id")
    cands = (
        ids.withColumnRenamed("doc_id", "id_a")
        .crossJoin(ids.withColumnRenamed("doc_id", "id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .limit(100)
    )
    out = verify_pairs(cands, sk, PARAMS, jaccard_threshold=0.5,
                       prefix_filter=None)
    plan = plan_of(out, "simple")
    assert "SortMergeJoin" not in plan, plan


def test_no_cartesian_blowup_in_candidate_families(spark, docs_parquet):
    """SimHash, SRP-embedding, and substring candidate generation must all
    pair via bucketed equi-joins — never CartesianProduct /
    BroadcastNestedLoopJoin (quadratic at corpus scale)."""
    from mashspark.ann import embedding_dup_pairs
    from mashspark.simhash import simhash_documents, simhash_dup_pairs
    from mashspark.substring import substring_dup_pairs

    docs = spark.read.parquet(docs_parquet)
    plans = {
        "simhash": plan_of(
            simhash_dup_pairs(simhash_documents(docs, k=4), max_hamming=3),
            "simple"),
        "substring": plan_of(
            substring_dup_pairs(docs, min_len=40, stride=8), "simple"),
    }
    emb = docs.select(
        "doc_id",
        F.expr("transform(sequence(1, 8), "
               "i -> cast(pmod(doc_id * i, 97) as float) / 97.0)").alias("vec"),
    )
    plans["srp"] = plan_of(
        embedding_dup_pairs(emb, min_cos=0.9, id_col="doc_id",
                            vec_col="vec", dim=8), "simple")
    for name, p in plans.items():
        assert "CartesianProduct" not in p, (name, p)
        assert "BroadcastNestedLoopJoin" not in p, (name, p)


def _duplicated_udf_calls(plan: str) -> dict:
    """Python-UDF invocation signatures (name + argument exprIds) that
    appear in MORE THAN ONE ArrowEvalPython/BatchEvalPython node of a
    formatted plan. Catalyst clones a UDF call when a filter on derived
    columns is planned between two copies of the evaluation — every row
    then pays the python cost twice (measured 2x on the verify tier of
    the dedup pipeline before the asNondeterministic single-eval guards).
    """
    import re

    calls: dict = {}
    for m in re.finditer(r"\((\d+)\) (?:Arrow|Batch)EvalPython\s*\n"
                         r"(?:.*\n)*?Arguments: \[([^\]]*)\]", plan):
        node_id, args = m.groups()
        for call in re.finditer(r"(\w+)\(([^()]*)\)#\d+", args):
            sig = f"{call.group(1)}({call.group(2)})"
            calls.setdefault(sig, set()).add(node_id)
    return {sig: nodes for sig, nodes in calls.items() if len(nodes) > 1}


def test_no_duplicated_udf_evaluation(spark, docs_parquet):
    """Single-eval audit over every operator whose plan chains a python
    UDF into a derived-column filter: each UDF invocation signature must
    appear in exactly one eval node."""
    from mashspark.screen import screen
    from mashspark.substring import substring_dup_spans
    from mashspark.verify import contain_pairs, verify_pairs

    docs = spark.read.parquet(docs_parquet)
    sk = sketch_documents(docs, PARAMS, LSH)
    ids = sk.select("doc_id")
    cands = (
        ids.withColumnRenamed("doc_id", "id_a")
        .crossJoin(ids.withColumnRenamed("doc_id", "id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .limit(100)
    )
    plans = {
        "verify+pvalue": plan_of(verify_pairs(
            cands, sk, PARAMS, jaccard_threshold=0.5, max_pvalue=1e-5,
            prefix_filter=None)),
        "verify+prefix": plan_of(verify_pairs(
            cands, sk, PARAMS, jaccard_threshold=0.5, prefix_filter=16,
            materialize_tier1=False)),
        "contain": plan_of(contain_pairs(cands, sk, PARAMS)),
        "screen": plan_of(screen(
            sketch_documents(docs.filter(F.col("doc_id") < 20), PARAMS, LSH),
            docs, PARAMS, max_pvalue=1e-5, identity_min=0.8)),
        "substring": plan_of(substring_dup_spans(
            docs, min_len=24, stride=4)[0]),
        "sketch": plan_of(sketch_documents(docs, PARAMS, LSH)),
    }
    bad = {name: dups for name, p in plans.items()
           if (dups := _duplicated_udf_calls(p))}
    assert not bad, f"duplicated python-UDF evaluation: {bad}"


def test_cross_dist_crosses_ids_not_sketches(spark, docs_parquet):
    """cross_dist's pair space is O(n*m) BY DEFINITION (mash dist prints
    every pair), so the only scale property to pin is that the cross
    product happens over skinny 8-byte id relations — the fat sketch
    blobs must attach AFTER pair enumeration via hash joins, and no
    sort-merge may sort fat rows."""
    from mashspark.verify import cross_dist

    docs = spark.read.parquet(docs_parquet)
    sk = sketch_documents(docs, PARAMS, LSH)
    out = cross_dist(sk, sk, PARAMS, upper_only=True, with_pvalue=False)
    plan = plan_of(out, "formatted")
    assert "SortMergeJoin" not in plan, plan
    # the nested-loop cross node exists, but over id-only projections:
    # every BroadcastNestedLoopJoin input/output must be id columns only
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "BroadcastNestedLoopJoin" in ln and ":" in ln and "Output" in ln:
            assert "sketch" not in ln, ln
    # sketches enter through hash joins after the cross product
    import re

    bnl = [l for l in lines if re.search(r"\(\d+\) BroadcastNestedLoopJoin", l)]
    assert bnl, "expected a cross node over ids"
    out_lines = [lines[i + 1] for i, l in enumerate(lines) if l in bnl
                 and i + 1 < len(lines)]
    for ol in out_lines:
        assert "sketch" not in ol, ol


def test_ivfpq_search_is_distributed_query_side(spark):
    """Round-4 rework of pq.ivfpq_search: the query relation must stay a
    DataFrame end to end — probe assignment is an Arrow map pass over
    queries, candidates come from a shuffled-hash equi-join on list_id,
    and NO sort-merge sorts the candidate relation. (The former
    formulation collected the query table to the driver and shipped a
    q x nprobe x m x k LUT tensor in the task closure — corpus-vs-corpus
    search was structurally impossible.)"""
    import numpy as np

    from mashspark.pq import ivfpq_index, ivfpq_search

    rng = np.random.default_rng(7)
    vecs = spark.createDataFrame(
        [(int(i), rng.standard_normal(16).tolist()) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    cent = rng.standard_normal((4, 16))
    books = rng.standard_normal((4, 8, 4))
    idx = ivfpq_index(vecs, cent, books)
    out = ivfpq_search(idx, vecs, cent, books, top_k=3, nprobe=2)
    plan = plan_of(out, "formatted")
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # both mapInPandas stages (probe over queries, ADC over candidates)
    assert plan.count("MapInPandas") >= 2, plan


def test_pq_search_blocked_no_driver_queries(spark):
    """pq_search packs queries and codes into per-batch block rows and
    cross-joins the two TINY packed relations — queries never collect to
    the driver, and correctness holds for a query table far larger than
    any sane closure (tie-heavy PQ codes included)."""
    import numpy as np

    from mashspark.pq import pq_adc_reference, pq_search

    rng = np.random.default_rng(11)
    n = 400
    mat = rng.standard_normal((n, 16))
    vecs = spark.createDataFrame(
        [(int(i), mat[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(8)  # several blocks on each side
    books = rng.standard_normal((4, 8, 4))
    out = pq_search(vecs, vecs, books, top_k=3)
    plan = plan_of(out, "formatted")
    assert plan.count("MapInPandas") >= 3, plan  # pack, pack, score
    rows = {(r.query_id, r.rank): r.neighbor_id for r in out.collect()}
    # exact parity vs the single-process ADC reference on every query
    from mashspark.pq import _assign_subspace

    codes = np.stack([
        np.concatenate([[_assign_subspace(mat[i:i + 1, j * 4:(j + 1) * 4],
                                          books[j])[0]] for j in range(4)])
        for i in range(n)
    ])
    for q in range(n):
        d = pq_adc_reference(mat[q], codes, books)
        order = np.lexsort((np.arange(n), d))
        want = [int(i) for i in order if i != q][:3]
        got = [rows[(q, r)] for r in (1, 2, 3)]
        assert got == want, (q, got, want)
