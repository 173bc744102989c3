"""Text canonicalization for dedup preprocessing + canonical-fingerprint
dedup (the Gopher / RefinedWeb / NearDedup recipe — public method; no
reference-code analog, the reference's analog is dna.py's
case-fold/canonical-k-mer normalization for sequences).

Byte-exact dedup misses the most common web duplicates: the same
article re-serialized with different casing, whitespace runs, smart
punctuation, or rotating numbers (dates, view counts). The standard fix
is to dedup on a CANONICAL form: lowercase, collapse every
non-alphanumeric run to a single space, optionally mask digits, trim.
MinHash pipelines apply the same canonicalization before shingling.

Everything here is pure Spark column expressions — whole-stage codegen,
map-only, zero Python, and every step is ANSI-SQL-expressible (the
DuckDB oracle runs the identical regexes), so the dedup output is
hash-compared end to end:

- ``canonical_text``: the normal form (a projection; at 10^12 docs this
  fuses into the scan stage);
- ``canonical_fingerprint``: md5 of the normal form — 16 B/doc is all
  the dedup shuffles;
- ``canonical_dup_groups``: fingerprint -> min-doc_id representative,
  the same skew-safe groupBy(min)+join-back shape as
  ``pipeline.exact_collapse`` (a window over the fingerprint would
  funnel a 10^7-copy boilerplate group through one task).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_text(col: Column, mask_digits: bool = True) -> Column:
    """Lowercase, collapse non-alphanumeric runs to one space, optionally
    mask every digit to ``0`` (kills dates/counters), trim."""
    out = F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")
    if mask_digits:
        out = F.regexp_replace(out, "[0-9]", "0")
    return F.trim(out)


def canonical_fingerprint(col: Column, mask_digits: bool = True) -> Column:
    """md5 hex of the canonical form — the 16-byte dedup key."""
    return F.md5(canonical_text(col, mask_digits))


def canonical_dup_groups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_digits: bool = True,
) -> DataFrame:
    """-> (doc_id, rep_id): rep = min doc_id among docs whose CANONICAL
    text is identical. Supersets byte-exact dedup (identical bytes have
    identical canonical forms).

    Shape: groupBy(fp).min + equi-join back — map-side partials collapse
    mega-groups before the exchange, and the join back is AQE-skew
    splittable; only (doc_id, 16 B fp) ever shuffles.

    Docs whose canonical form is EMPTY (null text, or no [a-z0-9]
    content at all — e.g. non-Latin-script pages, which this ASCII
    recipe cannot canonicalize) are NOT collapsed together: an empty
    normal form carries no identity evidence, so they stay singletons —
    the same rule exact_collapse applies to empty sketches. Extend the
    character class before using this on non-Latin corpora.
    """
    canon = F.coalesce(canonical_text(F.col(text_col), mask_digits),
                       F.lit(""))
    keyed = docs.select(F.col(id_col).alias("doc_id"), canon.alias("_c"))
    nonempty = keyed.filter(F.length("_c") > 0).select(
        "doc_id", F.md5("_c").alias("_fp"))
    reps = nonempty.groupBy("_fp").agg(F.min("doc_id").alias("rep_id"))
    members = nonempty.join(reps, "_fp").select("doc_id", "rep_id")
    empty = keyed.filter(F.length("_c") == 0).select(
        "doc_id", F.col("doc_id").alias("rep_id"))
    return members.unionByName(empty)


def canonical_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_digits: bool = True,
) -> DataFrame:
    """Keep one representative (min id) per canonical-duplicate group —
    ``docs`` filtered, original columns intact."""
    groups = canonical_dup_groups(docs, text_col, id_col, mask_digits)
    keep = groups.filter(F.col("doc_id") == F.col("rep_id")).select(
        F.col("doc_id").alias("_keep_id"))
    return docs.join(
        keep, F.col(id_col) == F.col("_keep_id"), "left_semi")
