"""C4 page cleaning: line/page filters and three-sentence-span global
dedup (mashspark/c4.py) vs an independent pure-Python reference."""

import re

import pytest
from pyspark.sql import functions as F

from mashspark.c4 import c4_line_filters, duplicated_spans, span_dedup, span_occurrences

# ---------------------------------------------------------------------------
# independent single-process reference (no Spark)
# ---------------------------------------------------------------------------


def _py_line_keep(line, min_words=5, drop_word="javascript"):
    if not re.search(r'[.!?"]$', line):
        return False
    if line.strip() == "":
        return False
    if len(line.strip().split()) < min_words:
        return False
    if drop_word and drop_word in line.lower():
        return False
    return True


def _py_line_filters(docs, min_words=5, min_lines_kept=3):
    out = {}
    for doc_id, text in docs:
        lines = text.split("\n")
        kept = [x for x in lines if _py_line_keep(x, min_words)]
        page_ok = (
            len(kept) >= min_lines_kept
            and "lorem ipsum" not in text.lower()
            and "{" not in text
        )
        out[doc_id] = (len(lines), len(kept), page_ok, "\n".join(kept))
    return out


def _py_span_dedup(docs, n=3):
    """Gold C4 span dedup: first (doc_id, pos) occurrence of each
    duplicated n-line span survives; every other occurrence's n lines
    are removed; docs reassembled in order."""
    occ = {}  # span -> list[(doc_id, pos)]
    units = {doc_id: text.split("\n") for doc_id, text in docs}
    for doc_id in sorted(units):
        u = units[doc_id]
        for pos in range(len(u) - n + 1):
            occ.setdefault("\n".join(u[pos:pos + n]), []).append((doc_id, pos))
    removed = {doc_id: set() for doc_id in units}
    for places in occ.values():
        if len(places) <= 1:
            continue
        for doc_id, pos in sorted(places)[1:]:
            removed[doc_id].update(range(pos, pos + n))
    out = {}
    for doc_id, u in units.items():
        kept = [x for i, x in enumerate(u) if i not in removed[doc_id]]
        out[doc_id] = (len(u), len(kept), "\n".join(kept))
    return out


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

_FILTER_DOCS = [
    (1, "Good line with five words here.\nshort.\nno punct at all five"
        "\nAnother good line stays in place!\nA third keeper line is here.\n"
        "And a fourth good line survives."),
    (2, "Only one good line in this doc.\ntiny.\nmeh"),          # < 3 kept
    (3, "This page has lorem ipsum filler text.\nA second good line here yes."
        "\nA third good line right here.\nA fourth good line right here."),
    (4, "var x = {a: 1};\nA perfectly fine long line ends here."
        "\nAnother perfectly fine line ends here.\nAnd one more good line here."),
    (5, "Enable javascript to view this page.\nReal content line number one."
        "\nReal content line number two.\nReal content line number three."),
    (6, ""),
]

_SPAN_DOCS = [
    (10, "a1\nb2\nc3\nd4\ne5"),          # winner of span (b2,c3,d4)
    (11, "x0\nb2\nc3\nd4\nz9"),          # loser: middle 3 removed
    (12, "b2\nc3\nd4"),                  # loser: whole doc removed
    (13, "u1\nu2"),                      # too short for any span
    (14, "p\np\np\np\np\np"),            # intra-doc repeats: first span wins
    (15, "unique\nlines\nonly\nhere"),
]


def _spark_rows(df, cols):
    return {r[0]: tuple(r[i] for i in range(1, len(cols))) for r in
            df.select(*cols).collect()}


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_c4_line_filters_matches_reference(spark):
    df = spark.createDataFrame(_FILTER_DOCS, "doc_id long, text string")
    got = _spark_rows(
        c4_line_filters(df),
        ["doc_id", "n_lines", "n_lines_kept", "keep_page", "cleaned"],
    )
    want = _py_line_filters(_FILTER_DOCS)
    assert got == want
    # the fixture exercises every rule: a kept page, a too-few-lines
    # drop, a blocklist drop, a brace drop, and a javascript line strip
    assert got[1][2] is True
    assert got[2][2] is False and got[2][1] == 1
    assert got[3][2] is False and got[3][1] >= 3   # lorem ipsum kills page
    assert got[4][2] is False                       # brace kills page
    assert got[5][1] == 3 and "javascript" not in got[5][3]


def test_c4_line_filters_is_map_only(spark):
    df = spark.createDataFrame(_FILTER_DOCS, "doc_id long, text string")
    plan = c4_line_filters(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_span_occurrences_and_winners(spark):
    df = spark.createDataFrame(_SPAN_DOCS, "doc_id long, text string")
    spans = span_occurrences(df, n=3)
    # doc 13 (2 units) emits nothing; doc 10 (5 units) emits 3 spans
    per_doc = {r["doc_id"]: r["c"] for r in
               spans.groupBy("doc_id").agg(F.count("*").alias("c")).collect()}
    assert 13 not in per_doc and per_doc[10] == 3
    dups = {r["span_md5"]: (r["n_occurrences"], r["win_id"], r["win_pos"])
            for r in duplicated_spans(spans).collect()}
    # (b2,c3,d4) occurs in docs 10,11,12 -> winner (10, 1);
    # (p,p,p) occurs 4x inside doc 14 -> winner (14, 0)
    assert sorted(v for v in dups.values()) == [(3, 10, 1), (4, 14, 0)]


def test_span_dedup_matches_reference(spark):
    df = spark.createDataFrame(_SPAN_DOCS, "doc_id long, text string")
    got = _spark_rows(
        span_dedup(df, n=3),
        ["doc_id", "n_units", "n_units_kept", "cleaned"],
    )
    want = _py_span_dedup(_SPAN_DOCS)
    assert got == want
    # spot-pin the semantics, independent of the reference impl:
    assert got[10] == (5, 5, "a1\nb2\nc3\nd4\ne5")      # winner untouched
    assert got[11] == (5, 2, "x0\nz9")                   # middle removed
    assert got[12] == (3, 0, "")                         # fully removed
    assert got[13] == (2, 2, "u1\nu2")                   # no spans, unchanged
    # overlapping-occurrence erosion (C4 semantics): the winner span is
    # (14,0) = indices 0-2, but removing occurrences at pos 1,2,3 covers
    # indices 1-5, so only index 0 survives
    assert got[14] == (6, 1, "p")
    assert got[15] == (4, 4, "unique\nlines\nonly\nhere")


def test_split_sentences(spark):
    from mashspark.c4 import split_sentences

    rows = [(1, 'First sentence. Second one! A "quoted end."  Third? done'),
            (2, "no terminal punctuation here at all"),
            (3, "Abbrev limits apply e.g. this splits. By design.")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["s"] for r in
           df.select("doc_id", split_sentences(F.col("text")).alias("s"))
           .collect()}
    assert got[1] == 'First sentence.\nSecond one!\nA "quoted end."\nThird?\ndone'
    assert got[2] == "no terminal punctuation here at all"
    # documented limitation: abbreviation periods split too
    assert got[3] == "Abbrev limits apply e.g.\nthis splits.\nBy design."
    # composes with span_dedup: sentence-level spans out of the box
    sent = df.select("doc_id", split_sentences(F.col("text")).alias("text"))
    out = span_dedup(sent, n=2)
    assert out.count() == 3


def test_span_dedup_plan_guards(spark):
    """The span-dedup physical plan must contain no window function
    (the winner is a min(struct) aggregate with map-side partials) and
    no cartesian/broadcast-nested-loop join (every join is an
    equi-join)."""
    df = spark.createDataFrame(_SPAN_DOCS, "doc_id long, text string")
    plan = span_dedup(df, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("n_parts", [1, 7])
def test_span_dedup_partition_invariant(spark, n_parts):
    df = spark.createDataFrame(_SPAN_DOCS, "doc_id long, text string") \
        .repartition(n_parts)
    got = _spark_rows(span_dedup(df, n=3),
                      ["doc_id", "n_units", "n_units_kept", "cleaned"])
    assert got == _py_span_dedup(_SPAN_DOCS)
