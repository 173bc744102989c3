"""PII detection / redaction over web text — a standard curation stage
(emails, phone numbers, IP addresses, SSN-shaped ids) applied before a
corpus is used for training.

Spark-first shape: every detector is a single JVM-side regex column
expression (``regexp_count`` / ``regexp_replace``) — map-only, inside
whole-stage codegen, zero shuffle, no Python in the hot path. At 100 TB
this runs at scan speed; the only cost is the regex engine per row.

Pattern dialect: the patterns below restrict themselves to the
constructs Java regex (Spark) and RE2 (DuckDB oracle, Go/Rust tooling)
evaluate identically — character classes, bounded repetition, ``\\b``,
optional groups; no backreferences, no lookaround. That keeps the
operator portable AND oracle-checkable bit-for-bit.

Redaction replaces each match with a typed placeholder token
(``<EMAIL>`` etc.) rather than deleting, preserving sentence shape for
downstream tokenization. Passes apply in a fixed order (email, ipv4,
ssn, phone) so overlapping matches resolve deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: redaction applies top-to-bottom; ssn before phone so a
# 3-2-4-digit id is typed SSN, not matched piecemeal by the phone rule
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+?\d{1,2}[-. ]\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match-count columns for ``text`` (long, 0 when clean)."""
    return {
        f"n_{name}": F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def pii_signals(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII counts + a has_pii flag: the filtering signal (drop or
    route docs whose PII density is high) and the audit metric (corpus
    PII rate per class)."""
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        id_col,
        *[c.alias(n) for n, c in counts.items()],
        (total > 0).alias("has_pii"),
    )


def redact(text: Column) -> Column:
    """Replace every PII match with its typed placeholder, fixed pass
    order. Composes as a column expression (usable inside any select)."""
    out = text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``docs`` with ``text_col`` redacted in place; adds
    ``n_redactions`` (how many placeholders were inserted) so downstream
    stages can filter on redaction density without re-scanning."""
    red = redact(F.col(text_col))
    n = None
    for name in PII_PATTERNS:
        c = F.regexp_count(red, F.lit(f"<{name.upper()}>")).cast("long")
        n = c if n is None else n + c
    return docs.withColumn(text_col, red).withColumn("n_redactions", n)
