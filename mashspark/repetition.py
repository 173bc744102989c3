"""Intra-document repetition signals and corpus-level line dedup —
the Gopher-style repetition filters and CCNet-style boilerplate-line
removal a webtext training pipeline runs between raw extraction and
fuzzy dedup.

Scale design:

- **Repetition signals are per-doc local** — they must NEVER shuffle.
  The duplicate-line signals are pure array expressions
  (``split``/``array_distinct``/``filter``/``aggregate``) inside
  whole-stage codegen: zero Python, zero shuffle, map-only at any
  corpus size. The top-n-gram signal needs a per-doc frequency mode,
  which is O(n^2) as a nested-lambda array expression, so it is an
  Arrow-batched pandas UDF instead (one Counter pass per doc) — still
  map-only, no shuffle.
- **Line dedup is ONE corpus shuffle by line key** (the canonical
  CCNet job shape: count distinct docs per line, then strip frequent
  lines). The shuffle key is the 8-byte ``xxhash64`` of the line, not
  the line bytes, and only the (tiny, heavy-hitter-bounded) frequent
  set flows back — as a broadcast anti-join — so the reassembly pass
  is map-side. 64-bit collisions would strip an innocent line with
  probability ~n_distinct_lines * 2^-64: negligible at 100 TB and
  flagged here rather than silently assumed.

Reference scope note: the reference engine (marbl/Mash) has no text
pipeline; these operators come from the task brief's training-data
axis (Rae et al. 2021 "Gopher" repetition filters; Wenzek et al. 2019
"CCNet" paragraph dedup), re-expressed Spark-first.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StructField, StructType


def _line_array(text_col, sep: str = "\n"):
    """split() on a literal separator (escaped: F.split takes a regex)."""
    import re

    return F.split(text_col, re.escape(sep))


def repetition_signals(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", sep: str = "\n") -> DataFrame:
    """Per-doc duplicate-line signals (Gopher table A1 family), as pure
    codegen array expressions — map-only at any scale.

    Returns: id, n_lines, n_dup_lines (lines whose text occurs more than
    once in the doc, counting every copy), dup_line_frac, and
    dup_line_char_frac (chars in duplicated lines / chars in all lines),
    both rounded to 6 places so a SQL oracle can reproduce them.
    """
    lines = _line_array(F.col(text_col), sep)
    # every element whose value occurs >1 time in the doc's line list
    dups = F.filter(
        lines, lambda x: F.size(F.filter(lines, lambda y: y == x)) > 1
    )
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_lines = F.size(lines)
    n_dup = F.size(dups)
    return df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        n_dup.cast("long").alias("n_dup_lines"),
        F.round(n_dup / F.greatest(n_lines, F.lit(1)), 6).alias("dup_line_frac"),
        F.round(
            chars(dups) / F.greatest(chars(lines), F.lit(1)), 6
        ).alias("dup_line_char_frac"),
    )


_TOP_NGRAM_SCHEMA = StructType([
    StructField("n_ngrams", LongType()),
    StructField("top_ngram_count", LongType()),
])


def make_top_ngram_udf(n: int):
    """Struct(n_ngrams, top_ngram_count) of word n-grams per doc.

    Whitespace-run tokenization (``str.split()``), one Counter pass per
    doc — per-doc local, so the operator stays map-only; Arrow-batched.
    Integer outputs by design: exact to hash-compare against a SQL
    oracle, and the caller derives the Gopher fraction
    top_ngram_count/n_ngrams at whatever rounding it wants.
    """

    @pandas_udf(_TOP_NGRAM_SCHEMA)
    def top_ngram_udf(texts: pd.Series) -> pd.DataFrame:
        n_ngrams, top_count = [], []
        for t in texts.fillna(""):
            words = str(t).split()
            grams = list(zip(*(words[i:] for i in range(n)))) if len(words) >= n else []
            n_ngrams.append(len(grams))
            top_count.append(max(Counter(grams).values()) if grams else 0)
        return pd.DataFrame({"n_ngrams": n_ngrams, "top_ngram_count": top_count})

    return top_ngram_udf


def top_ngram_stats(df: DataFrame, n: int = 2, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-doc most-frequent word n-gram stats (Gopher top-n-gram
    fraction = top_ngram_count / n_ngrams)."""
    u = make_top_ngram_udf(n)
    return df.select(F.col(id_col), u(F.col(text_col)).alias("s")).select(
        id_col, "s.n_ngrams", "s.top_ngram_count"
    )


def _word_ngrams(text_col, n: int):
    """Whitespace word n-grams as a JVM array transform (map-only)."""
    ws = F.filter(F.split(F.lower(text_col), r"\s+"), lambda x: x != "")
    if n == 1:
        return ws
    grams = F.transform(
        F.sequence(F.lit(0), F.size(ws) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + j + 1).cast("int"))
                   for j in range(n)]),
    )
    return F.when(F.size(ws) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def frequent_ngrams(df: DataFrame, n: int = 3, top_k: int = 100,
                    id_col: str = "doc_id", text_col: str = "text",
                    by_docs: bool = True,
                    min_count: int | None = None) -> DataFrame:
    """Corpus-level frequent word-n-gram report: the top ``top_k``
    n-grams by distinct-document frequency (``by_docs``, the
    boilerplate signal) or by raw occurrence count — what an operator
    eyeballs before choosing the line-dedup ``min_docs`` or a
    stop-span blocklist.

    Scale shape (two passes, heavy strings never corpus-shuffle):

    1. Count by the 8-byte ``xxhash64`` of the gram — (hash, count)
       with map-side partial aggregation, so a boilerplate gram in
       10^9 docs collapses per map task; ``by_docs`` inserts a
       (doc, hash) distinct first (also map-side partial). The top-k
       cut is an ordered limit (TakeOrderedAndProject — never a
       global sort).
    2. Recover the winners' TEXT by re-deriving grams and
       broadcast-semi-joining against the top-k hash set, then
       distinct over the (tiny) surviving gram strings.

    Returns (ngram, n_docs|n_occurrences) ordered by count desc then
    gram asc. ``min_count`` switches the cut from top-k to a count
    threshold — tie-free (the top-k boundary otherwise breaks ties in
    hash order), exactly reproducible by any engine, and the form a
    production blocklist job uses. 64-bit gram collisions would merge
    two grams' counts with probability ~n_distinct^2 * 2^-65 —
    negligible and noted, as everywhere else this trick is used.
    """
    metric = "n_docs" if by_docs else "n_occurrences"
    exploded = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(_word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    hashed = exploded.select("_doc", F.xxhash64("gram").alias("_h"))
    if by_docs:
        hashed = hashed.distinct()
    counted = hashed.groupBy("_h").agg(F.count("*").alias(metric))
    if min_count is not None:
        top = counted.filter(F.col(metric) >= min_count)
    else:
        top = counted.orderBy(F.desc(metric), F.asc("_h")).limit(top_k)
    named = (
        exploded.select("gram", F.xxhash64("gram").alias("_h")).distinct()
        .join(F.broadcast(top), "_h")
        .select(F.col("gram").alias("ngram"), metric)
    )
    out = named.orderBy(F.desc(metric), F.asc("ngram"))
    return out if min_count is not None else out.limit(top_k)


_DUP_NGRAM_SCHEMA = StructType([
    StructField("covered_chars", LongType()),
    StructField("n_chars", LongType()),
])


def make_dup_ngram_coverage_udf(n: int):
    """Struct(covered_chars, n_chars) per doc for the Gopher
    duplicate-n-gram rule (Rae et al. 2021, A1: docs are dropped when
    the fraction of characters inside DUPLICATED word n-grams exceeds
    a per-n cap, n = 5..10).

    covered_chars is the length of the UNION of character intervals
    spanned by every occurrence of every n-gram that occurs more than
    once in the doc (overlaps counted once — the standard reading);
    n_chars is the doc length, so the rule is covered_chars/n_chars.
    Tokens are \\S+ runs with their true character spans. Per-doc
    local, Arrow-batched, map-only; integer outputs by design (exact
    hash-compare vs a SQL oracle)."""
    import re as _re

    tok = _re.compile(r"\S+")

    @pandas_udf(_DUP_NGRAM_SCHEMA)
    def dup_ngram_udf(texts: pd.Series) -> pd.DataFrame:
        covered_out, total_out = [], []
        for t in texts.fillna(""):
            s = str(t)
            spans = [(m.start(), m.end()) for m in tok.finditer(s)]
            words = [s[a:b] for a, b in spans]
            occ: dict[tuple, list[int]] = {}
            for i in range(len(words) - n + 1):
                occ.setdefault(tuple(words[i:i + n]), []).append(i)
            ivals = sorted(
                (spans[i][0], spans[i + n - 1][1])
                for poss in occ.values() if len(poss) > 1 for i in poss
            )
            covered = 0
            cur_a, cur_b = None, -1
            for a, b in ivals:
                if cur_a is None or a > cur_b:
                    if cur_a is not None:
                        covered += cur_b - cur_a
                    cur_a, cur_b = a, b
                else:
                    cur_b = max(cur_b, b)
            if cur_a is not None:
                covered += cur_b - cur_a
            covered_out.append(covered)
            total_out.append(len(s))
        return pd.DataFrame({"covered_chars": covered_out,
                             "n_chars": total_out})

    return dup_ngram_udf


def dup_ngram_coverage(df: DataFrame, n: int = 5, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-doc duplicated-n-gram character coverage (Gopher A1,
    n = 5..10): (id, covered_chars, n_chars)."""
    u = make_dup_ngram_coverage_udf(n)
    return df.select(F.col(id_col), u(F.col(text_col)).alias("s")).select(
        id_col, "s.covered_chars", "s.n_chars"
    )


def gopher_line_format_flags(df: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text", sep: str = "\n",
                             max_bullet_frac: float = 0.90,
                             max_ellipsis_frac: float = 0.30) -> DataFrame:
    """The remaining Gopher A1 page-format rules (Rae et al. 2021):
    drop pages where more than ``max_bullet_frac`` of lines start with
    a bullet mark (• - *) or more than ``max_ellipsis_frac`` end with
    an ellipsis. Pure codegen array expressions — map-only, fuses into
    the scan like ``gopher_quality_flags`` (kept separate so each
    rule-set stays independently composable and oracle-checked).

    Returns (id, n_lines, n_bullet_lines, n_ellipsis_lines,
    bullet_frac, ellipsis_frac, keep); fractions rounded to 6 places
    for oracle reproducibility.
    """
    lines = _line_array(F.col(text_col), sep)
    bullet = F.filter(
        lines,
        lambda x: F.substring(F.ltrim(x), 1, 1).isin("•", "-", "*"),
    )
    ellipsis = F.filter(
        lines,
        lambda x: F.rtrim(x).endswith("...") | F.rtrim(x).endswith("…"),
    )
    n, nb, ne = F.size(lines), F.size(bullet), F.size(ellipsis)
    bf = F.round(nb / F.greatest(n, F.lit(1)), 6)
    ef = F.round(ne / F.greatest(n, F.lit(1)), 6)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_lines"),
        nb.cast("long").alias("n_bullet_lines"),
        ne.cast("long").alias("n_ellipsis_lines"),
        bf.alias("bullet_frac"),
        ef.alias("ellipsis_frac"),
        ((bf <= max_bullet_frac) & (ef <= max_ellipsis_frac)).alias("keep"),
    )


_COMPRESSION_SCHEMA = StructType([
    StructField("n_bytes", LongType()),
    StructField("n_compressed", LongType()),
])


def make_compression_udf(level: int = 6):
    """Struct(n_bytes, n_compressed) per doc: zlib-compressed size of
    the UTF-8 text — the compression-ratio repetition proxy the
    RedPajama-v2 / Dolma quality stacks ship (templated or repetitive
    pages compress far below prose's ~2.5-3x). zlib with a fixed level
    is bit-deterministic, so the integer outputs are exact and
    partition-invariant; the signal is n_compressed/n_bytes, derived
    by the caller at its own rounding. Per-doc local, Arrow-batched,
    map-only — stdlib zlib, no external deps."""
    import zlib

    @pandas_udf(_COMPRESSION_SCHEMA)
    def compression_udf(texts: pd.Series) -> pd.DataFrame:
        raw, comp = [], []
        for t in texts.fillna(""):
            b = str(t).encode("utf-8")
            raw.append(len(b))
            comp.append(len(zlib.compress(b, level)))
        return pd.DataFrame({"n_bytes": raw, "n_compressed": comp})

    return compression_udf


def compression_stats(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", level: int = 6) -> DataFrame:
    """Per-doc compression signal: (id, n_bytes, n_compressed)."""
    u = make_compression_udf(level)
    return df.select(F.col(id_col), u(F.col(text_col)).alias("s")).select(
        id_col, "s.n_bytes", "s.n_compressed"
    )


def _exploded_lines(df: DataFrame, id_col: str, text_col: str, sep: str):
    return df.select(
        F.col(id_col).alias("_doc"),
        F.explode(_line_array(F.col(text_col), sep)).alias("line"),
    )


# the 8 "must see at least 2" common words of the Gopher quality rule
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", sep: str = "\n",
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_word_len: float = 3.0,
                         max_mean_word_len: float = 10.0,
                         max_dup_line_frac: float = 0.30,
                         max_dup_line_char_frac: float = 0.20,
                         max_symbol_word_ratio: float = 0.10,
                         min_stopword_hits: int = 2) -> DataFrame:
    """Gopher-rule quality filter (Rae et al. 2021, A1) as one map-only
    projection of pure column expressions: per-doc booleans for each
    rule plus the conjunction ``keep``. No UDF, no shuffle — the filter
    a 100 TB corpus runs FIRST, so it must be a plain codegen scan.

    Rules: word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; duplicate-line fraction and
    duplicate-line char fraction under their caps (the ``sep``-split
    line signals of ``repetition_signals``); hash/ellipsis symbols per
    word under ``max_symbol_word_ratio``; at least ``min_stopword_hits``
    DISTINCT common words present.
    """
    c = F.col(text_col)
    t = F.trim(c)
    words = F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("long")
    safe_words = F.greatest(words, F.lit(1))
    mean_wl = F.length(F.regexp_replace(c, r"\s+", "")) / safe_words
    lines = _line_array(c, sep)
    dups = F.filter(
        lines, lambda x: F.size(F.filter(lines, lambda y: y == x)) > 1
    )
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dup_frac = F.size(dups) / F.greatest(F.size(lines), F.lit(1))
    dup_char_frac = chars(dups) / F.greatest(chars(lines), F.lit(1))
    n_symbols = (
        (F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit(""))))
        + (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / 3
    )
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    stop_hits = sum(
        (F.when(padded.contains(f" {w} "), 1).otherwise(0)
         for w in _GOPHER_STOPWORDS),
        start=F.lit(0),
    )
    flags = {
        "word_count_ok": (words >= min_words) & (words <= max_words),
        "mean_word_len_ok": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "dup_line_frac_ok": dup_frac <= max_dup_line_frac,
        "dup_line_char_frac_ok": dup_char_frac <= max_dup_line_char_frac,
        "symbol_ratio_ok": (n_symbols / safe_words) <= max_symbol_word_ratio,
        "stopwords_ok": stop_hits >= min_stopword_hits,
    }
    keep = None
    for expr in flags.values():
        keep = expr if keep is None else (keep & expr)
    return df.select(
        F.col(id_col),
        *[v.alias(k) for k, v in flags.items()],
        keep.alias("keep"),
    )


def boilerplate_line_hashes(df: DataFrame, min_docs: int,
                            id_col: str = "doc_id", text_col: str = "text",
                            sep: str = "\n") -> DataFrame:
    """xxhash64 of every line occurring in >= min_docs DISTINCT docs.

    The one corpus shuffle, and it carries only (doc_id, line_hash) =
    16 bytes/row — never the line bytes. distinct() first makes the
    per-hash count a distinct-doc count with map-side partials instead
    of countDistinct's per-group set state.
    """
    return (
        _exploded_lines(df, id_col, text_col, sep)
        .select("_doc", F.xxhash64("line").alias("line_hash"))
        .distinct()
        .groupBy("line_hash")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def boilerplate_lines(df: DataFrame, min_docs: int, id_col: str = "doc_id",
                      text_col: str = "text", sep: str = "\n") -> DataFrame:
    """The frequent-line set itself: (line, n_docs).

    Line TEXTS are recovered by a second, broadcast-pruned pass: join
    the exploded lines against the (tiny) frequent-hash set map-side,
    then distinct only the surviving lines — so the full-line-bytes
    shuffle is over the heavy-hitter set, not the corpus.
    """
    freq = boilerplate_line_hashes(df, min_docs, id_col, text_col, sep)
    return (
        _exploded_lines(df, id_col, text_col, sep)
        .join(F.broadcast(freq), F.xxhash64("line") == F.col("line_hash"))
        .select("line", "n_docs")
        .distinct()
    )


def remove_boilerplate(df: DataFrame, min_docs: int, id_col: str = "doc_id",
                       text_col: str = "text", sep: str = "\n") -> DataFrame:
    """CCNet-style line dedup: strip lines that occur in >= min_docs
    distinct docs; reassemble each doc's surviving lines in order.

    Returns (id, n_lines_kept, cleaned) for every input doc — a doc
    whose every line is boilerplate survives as ``cleaned = ''``. The
    anti-join is on the broadcast frequent-HASH set (8 bytes/entry; a
    64-bit collision stripping an innocent line has probability
    ~n_distinct_lines/2^64 — negligible, and noted rather than silently
    assumed). Positions travel with the lines so reassembly is an
    in-group array_sort, not a global order.
    """
    arr = _line_array(F.col(text_col), sep)
    exploded = df.select(
        F.col(id_col), F.posexplode(arr).alias("pos", "line")
    )
    boiler = boilerplate_line_hashes(
        df, min_docs, id_col, text_col, sep
    ).select("line_hash")
    kept = exploded.join(
        F.broadcast(boiler), F.xxhash64("line") == F.col("line_hash"),
        "left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("n_lines_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("cleaned"),
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
            F.coalesce("cleaned", F.lit("")).alias("cleaned"),
        )
    )
