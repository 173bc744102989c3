"""Gopher duplicated-n-gram character coverage
(repetition.dup_ngram_coverage) vs an independent set-of-positions
reference."""

import re

from mashspark.repetition import dup_ngram_coverage


def _py_coverage(text, n):
    """Independent implementation: mark covered char positions in a
    set (the UDF unions sorted intervals instead)."""
    spans = [(m.start(), m.end()) for m in re.finditer(r"\S+", text)]
    words = [text[a:b] for a, b in spans]
    occ = {}
    for i in range(len(words) - n + 1):
        occ.setdefault(tuple(words[i:i + n]), []).append(i)
    covered = set()
    for poss in occ.values():
        if len(poss) > 1:
            for i in poss:
                covered.update(range(spans[i][0], spans[i + n - 1][1]))
    return len(covered), len(text)


_DOCS = [
    (1, "a b c d e x a b c d e y"),            # "a b c d e" twice
    (2, "a b c d e f a b c d e f"),            # overlapping dup 5-grams
    (3, "all words here are unique tokens ok"),
    (4, "one two three four"),                  # shorter than n
    (5, ""),
    (6, "  p  q   r s t   p  q   r s t  "),    # irregular whitespace
    (7, "z z z z z z z z z z"),                 # same word everywhere
]


def test_dup_ngram_coverage_matches_reference(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    for n in (5, 6):
        got = {r["doc_id"]: (r["covered_chars"], r["n_chars"])
               for r in dup_ngram_coverage(df, n=n).collect()}
        want = {i: _py_coverage(t, n) for i, t in _DOCS}
        assert got == want, n


def test_frequent_ngrams(spark):
    from collections import Counter

    from mashspark.repetition import frequent_ngrams

    rows = [
        (1, "subscribe to our newsletter now please and thanks"),
        (2, "subscribe to our newsletter now or maybe later"),
        (3, "subscribe to our newsletter now " * 3 + "tail words here"),
        (4, "totally unrelated content with no repeats at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def py_counts(n, by_docs):
        c = Counter()
        for i, t in rows:
            ws = t.lower().split()
            grams = [" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)]
            c.update(set(grams) if by_docs else grams)
        return c

    # doc-frequency mode, threshold cut (tie-free, oracle form)
    got = {r["ngram"]: r["n_docs"] for r in
           frequent_ngrams(df, n=3, min_count=2).collect()}
    want = {g: c for g, c in py_counts(3, True).items() if c >= 2}
    assert got == want
    assert got["subscribe to our"] == 3
    # occurrence mode counts repeats within a doc
    occ = {r["ngram"]: r["n_occurrences"] for r in
           frequent_ngrams(df, n=3, by_docs=False, min_count=3).collect()}
    assert occ["subscribe to our"] == 5  # 1 + 1 + 3
    # top-k mode returns exactly k rows, count-descending
    top = frequent_ngrams(df, n=3, top_k=5).collect()
    assert len(top) == 5
    assert [r["n_docs"] for r in top] == sorted(
        [r["n_docs"] for r in top], reverse=True)


def test_gopher_line_format_flags(spark):
    from mashspark.repetition import gopher_line_format_flags

    rows = [
        (1, "- item one\n- item two\n- item three\nprose line"),  # 75% bullets
        (2, "tail line goes on...\nand on…\nnormal\nnormal2\nnormal3"),
        (3, "• a\n* b\n- c"),                       # 100% bullets -> drop
        (4, "x...\ny...\nz"),                        # 67% ellipsis -> drop
        (5, "plain\nlines\nonly"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_line_format_flags(df).collect()}
    assert got[1]["n_bullet_lines"] == 3 and got[1]["keep"]
    assert got[2]["n_ellipsis_lines"] == 2 and not got[2]["keep"]  # 0.4 > 0.3
    assert got[3]["bullet_frac"] == 1.0 and not got[3]["keep"]
    assert not got[4]["keep"]
    assert got[5]["keep"] and got[6]["keep"]
    # map-only: no shuffle in the plan
    plan = gopher_line_format_flags(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_compression_stats(spark):
    """zlib compression signal: exact vs direct zlib, repetitive text
    compresses much harder than varied text, and deterministic across
    partitionings."""
    import zlib

    from mashspark.repetition import compression_stats

    docs = [
        (1, "spam " * 400),
        (2, " ".join(f"w{i}x{i * 7 % 113}" for i in range(400))),
        (3, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for n_parts in (1, 4):
        got = {r["doc_id"]: (r["n_bytes"], r["n_compressed"]) for r in
               compression_stats(df.repartition(n_parts)).collect()}
        want = {i: (len(t.encode()), len(zlib.compress(t.encode(), 6)))
                for i, t in docs}
        assert got == want
    ratio = {i: c / max(b, 1) for i, (b, c) in got.items()}
    assert ratio[1] < 0.05 < ratio[2]


def test_dup_ngram_coverage_semantics(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["covered_chars"], r["n_chars"])
           for r in dup_ngram_coverage(df, n=5).collect()}
    # doc 1: both "a b c d e" spans covered = 9 + 9
    assert got[1] == (18, 23)
    # doc 3/4/5: nothing duplicated or too short
    assert got[3][0] == 0 and got[4][0] == 0 and got[5] == (0, 0)
    # doc 7: every 5-gram is "z z z z z" -> whole token region covered
    assert got[7] == (19, 19)
