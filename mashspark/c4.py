"""C4-style page cleaning (Raffel et al. 2020, JMLR "Exploring the
Limits of Transfer Learning" — the C4 corpus rules) re-expressed
Spark-first: per-line heuristic filters plus the corpus-global
"discard all but one of any three-sentence span" dedup.

Scale design:

- **Line filters are per-doc local** (``c4_line_filters``): every rule
  — terminal punctuation, minimum words per line, the "javascript"
  line drop, the page-level lorem-ipsum / curly-brace / minimum-kept-
  lines checks — is a pure array/string column expression inside
  whole-stage codegen. Zero Python, zero shuffle, map-only at any
  corpus size; this is the filter a 100 TB crawl runs FIRST, so it
  must fuse into the scan.
- **Span dedup is ONE corpus shuffle on a 16-byte key**
  (``span_dedup``): each doc emits (doc_id, pos, md5(span)) for every
  n-unit sliding window — the md5, never the span bytes, is what
  shuffles. A map-side-partial groupBy finds duplicated hashes and
  their first occurrence via ``min(struct(doc_id, pos))`` (an ordinary
  agg with partial merge — never a row_number window, which would
  funnel hot spans through one task). Only duplicated-span occurrences
  flow back through an equi-join; removal indices and doc reassembly
  are per-doc local. Output volume of the dup relation is O(duplicated
  spans), not O(corpus).
- 128-bit md5 collisions would merge two distinct spans with
  probability ~n_spans^2 * 2^-129 — negligible at 10^12 docs and noted
  here rather than silently assumed.

Unit granularity is a caller-supplied separator (default ``\\n``): C4
splits on sentence boundaries; a deterministic separator keeps the
operator engine-reproducible (RE2-based oracles cannot express the
lookbehind a "real" sentence splitter wants) and the span/winner/
removal semantics — the substance of the operator — are identical.

Reference scope note: the reference engine (marbl/Mash) has no text
pipeline; this operator comes from the task brief's training-data axis
(C4 is the canonical "clean a Common Crawl snapshot" recipe),
re-expressed Spark-first.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the C4 paper's "policy" page blocklist is much longer; these two are
# the reproducible, content-neutral entries every reimplementation keeps
_DEFAULT_BLOCKLIST = ("lorem ipsum",)
_TERMINAL_PUNCT_RE = '[.!?"]$'


def _units(text_col, sep: str):
    return F.split(text_col, re.escape(sep))


def _line_keep(line, min_words: int, drop_word: str):
    """The C4 per-line predicate as a pure column expression: ends in
    terminal punctuation, has >= min_words whitespace words, is not
    blank, and does not mention ``drop_word`` (C4 drops any line with
    the word "javascript")."""
    words = F.size(F.split(F.trim(line), r"\s+"))
    keep = (
        line.rlike(_TERMINAL_PUNCT_RE)
        & (F.trim(line) != "")
        & (words >= min_words)
    )
    if drop_word:
        keep = keep & ~F.lower(line).contains(drop_word.lower())
    return keep


def c4_line_filters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_words: int = 5,
    min_lines_kept: int = 3,
    blocklist: tuple[str, ...] = _DEFAULT_BLOCKLIST,
    drop_brace: bool = True,
    drop_word: str = "javascript",
) -> DataFrame:
    """C4 line + page filters as ONE map-only codegen projection.

    Per line (kept iff ALL hold): ends in a terminal punctuation mark
    (``. ! ? "``), contains at least ``min_words`` words, does not
    contain ``drop_word``. Per page (``keep_page``): at least
    ``min_lines_kept`` lines survived, no blocklist phrase, and no
    ``{`` (C4's "probably code" heuristic).

    Returns one row per input doc: (id, n_lines, n_lines_kept,
    keep_page, cleaned) where ``cleaned`` is the surviving lines
    re-joined with ``sep`` in original order ('' if none survive).
    """
    lines = _units(F.col(text_col), sep)
    kept = F.filter(lines, lambda x: _line_keep(x, min_words, drop_word))
    lower_text = F.lower(F.col(text_col))
    page_ok = F.size(kept) >= min_lines_kept
    for phrase in blocklist:
        page_ok = page_ok & ~lower_text.contains(phrase.lower())
    if drop_brace:
        page_ok = page_ok & ~F.col(text_col).contains("{")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        page_ok.alias("keep_page"),
        F.array_join(kept, sep).alias("cleaned"),
    )


def split_sentences(text_col, newline_out: bool = True):
    """Sentence segmentation as a pure column expression: break after a
    terminal punctuation run followed by whitespace (Java-regex
    lookbehind, so the punctuation stays with its sentence). Returns
    the text with sentence breaks re-joined by newline (``newline_out``,
    ready for the ``sep='\\n'`` operators) or the raw array.

    NOT oracle-checkable (RE2-based engines lack lookbehind — the
    reason the span/line operators take a separator instead of
    hard-wiring this); pinned by pytest. A production pipeline with a
    trained segmenter plugs in upstream and feeds the same operators.
    """
    arr = F.split(text_col, r'(?<=[.!?]["\')\]]?)\s+')
    return F.array_join(arr, "\n") if newline_out else arr


def span_occurrences(df: DataFrame, n: int = 3, id_col: str = "doc_id",
                     text_col: str = "text", sep: str = "\n") -> DataFrame:
    """(id, pos, span_md5) for every n-unit sliding window of every doc
    — the skinny relation span dedup shuffles (16 B hash + ids; the
    span TEXT never leaves its map task). Docs with fewer than ``n``
    units emit nothing (the CASE guards ``sequence`` from a negative
    stop). Map-only."""
    units = _units(F.col(text_col), sep)
    hashes = F.when(
        F.size(units) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(units) - n),
            lambda i: F.md5(F.concat_ws(sep, F.slice(units, i + 1, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), F.posexplode(hashes).alias("pos", "span_md5")
    )


def duplicated_spans(spans: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(span_md5, n_occurrences, win_id, win_pos) for every span hash
    occurring more than once corpus-wide. The winner — the occurrence
    C4 keeps — is the lexicographically smallest (id, pos), computed as
    ``min(struct(id, pos))``: an ordinary aggregate with map-side
    partial merge, so a boilerplate span in 10^9 docs collapses inside
    each map task instead of funneling through one window task."""
    return (
        spans.groupBy("span_md5")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_w"),
        )
        .filter(F.col("n_occurrences") > 1)
        .select(
            "span_md5",
            "n_occurrences",
            F.col(f"_w.{id_col}").alias("win_id"),
            F.col("_w.pos").alias("win_pos"),
        )
    )


def span_dedup(df: DataFrame, n: int = 3, id_col: str = "doc_id",
               text_col: str = "text", sep: str = "\n") -> DataFrame:
    """C4 three-sentence-span global dedup: any ``n``-unit span that
    occurs more than once corpus-wide is removed from every doc except
    its first (smallest (id, pos)) occurrence; each doc's surviving
    units are re-joined with ``sep`` in order.

    Returns one row per input doc: (id, n_units, n_units_kept,
    cleaned). A doc whose every unit sat inside a removed span survives
    with ``cleaned = ''``; docs with no duplicated spans pass through
    byte-identical.

    Join shapes: spans x duplicated-spans is an equi-join on the md5
    where the right side holds ONLY duplicated hashes (AQE broadcasts
    it when small, shuffles when a 10^12-doc crawl makes it big);
    removal-index expansion is an O(n)-per-removed-span explode; the
    keep pass is a left_anti equi-join on (id, unit index); reassembly
    is an in-group array_sort — never a global order.
    """
    spans = span_occurrences(df, n, id_col, text_col, sep)
    dups = duplicated_spans(spans, id_col)
    removed_spans = (
        spans.join(dups.select("span_md5", "win_id", "win_pos"), "span_md5")
        .filter(
            ~((F.col(id_col) == F.col("win_id"))
              & (F.col("pos") == F.col("win_pos")))
        )
        .select(id_col, "pos")
    )
    removed_units = removed_spans.select(
        id_col,
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + (n - 1))
        ).alias("idx"),
    ).distinct()
    units = _units(F.col(text_col), sep)
    exploded = df.select(
        F.col(id_col), F.posexplode(units).alias("idx", "unit")
    )
    kept = exploded.join(removed_units, [id_col, "idx"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("n_units_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "unit"))),
                lambda s: s["unit"],
            ),
            sep,
        ).alias("cleaned"),
    )
    return (
        df.select(F.col(id_col), F.size(units).cast("long").alias("n_units"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_units",
            F.coalesce("n_units_kept", F.lit(0)).cast("long")
            .alias("n_units_kept"),
            F.coalesce("cleaned", F.lit("")).alias("cleaned"),
        )
    )
