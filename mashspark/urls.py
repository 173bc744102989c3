"""URL canonicalization + URL-level exact dedup.

The first stage of a Common-Crawl-style dedup pipeline is URL-level:
the same page is fetched under trivially-different URLs (fragment,
tracking params, www/port/trailing-slash variants), and collapsing
those BEFORE content sketching removes refetch duplicates at zero
sketch cost. The reference (marbl/Mash) has no URL stage — sequences
have no URLs — so this operator is part of the web-text extension
layer (SURVEY.md §2 LLM-pipeline ops), not a reference-parity op.

Everything here is pure Spark column expressions (regexp + higher-order
array functions): whole-stage codegen, no Python, no shuffle beyond the
final groupBy on the canonical key — at 10^12 rows the normalize step
is map-only and the dedup groupBy shuffles one short string per doc
with map-side partial aggregation.

Canonicalization (order matters):
1. drop the ``#fragment``;
2. lowercase scheme and host; strip a leading ``www.``; strip explicit
   default ports ``:80`` (http) and ``:443`` (https);
3. strip trailing ``/`` runs from the path (``/a/`` == ``/a``; a bare
   ``/`` collapses to the empty path);
4. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``), sort the survivors (param order is not
   semantic), drop the ``?`` when nothing survives.

Deliberately NOT done (they change page identity on real sites):
percent-decoding, param-value normalization, host IDN folding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# matches one query param that is pure click-tracking
_TRACKING_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def normalized_url(url) -> Column:
    """Canonical form of ``url`` (str column name or Column) per the
    module docstring. Pure column expression — codegen end to end."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, "#.*$", "")  # fragment never reaches the server

    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.regexp_replace(host, "^www\\.", "")
    host = (
        F.when(scheme == F.lit("http"), F.regexp_replace(host, ":80$", ""))
        .when(scheme == F.lit("https"), F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )

    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.regexp_replace(path, "/+$", "")

    query = F.regexp_extract(u, _QUERY_RE, 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qnorm = F.array_join(kept, "&")

    base = F.concat(scheme, F.lit("://"), host, path)
    return F.when(qnorm == "", base).otherwise(
        F.concat(base, F.lit("?"), qnorm)
    )


def with_normalized_url(df: DataFrame, url_col: str = "url",
                        out_col: str = "norm_url") -> DataFrame:
    """Map-only: append the canonical URL column."""
    return df.withColumn(out_col, normalized_url(url_col))


def url_dup_groups(df: DataFrame, url_col: str = "url",
                   id_col: str = "doc_id") -> DataFrame:
    """URL-level duplicate groups: (norm_url, n_docs, min_doc_id) for
    canonical URLs fetched more than once. groupBy does map-side partial
    aggregation; the canonical key is short, so the shuffle is bounded
    by ~(key + 12 B)/doc — the cheapest dedup signal in the pipeline and
    the one applied first at ingest."""
    return (
        with_normalized_url(df, url_col)
        .groupBy("norm_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("min_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def host_of(url) -> Column:
    """Lowercased host with a leading ``www.`` stripped (no port
    stripping — ports distinguish origins for stats purposes). Pure
    column expression."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    return F.regexp_replace(host, "^www\\.", "")


def domain_stats(df: DataFrame, url_col: str = "url",
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-host corpus statistics — the rollup a crawl curation pass
    ranks and filters on: (host, n_docs, n_unique_urls, n_dup_url_docs,
    total_text_chars). ``n_dup_url_docs`` counts docs whose canonical
    URL occurs more than once under the host (refetch pressure).

    One map-only projection + one groupBy(host, norm_url) + one
    groupBy(host): both aggregate with map-side partials; hosts are the
    classic skew key (a mega-site dwarfs the tail), but the per-URL
    pre-aggregation bounds any host's second-stage input by its count
    of DISTINCT urls, and AQE skew handling splits the rest. (True
    registrable-domain grouping needs the public-suffix list, which is
    not bundled; host-level is exact and PSL grouping is a map-only
    lookup away.)"""
    per_url = (
        with_normalized_url(df, url_col)
        .withColumn("_host", host_of(url_col))
        .groupBy("_host", "norm_url")
        .agg(
            F.count("*").alias("n_docs_url"),
            F.sum(F.length(text_col)).alias("chars_url"),
        )
    )
    return (
        per_url.groupBy("_host")
        .agg(
            F.sum("n_docs_url").alias("n_docs"),
            F.count("*").alias("n_unique_urls"),
            F.sum(F.when(F.col("n_docs_url") > 1, F.col("n_docs_url"))
                  .otherwise(F.lit(0))).alias("n_dup_url_docs"),
            F.sum("chars_url").alias("total_text_chars"),
        )
        .withColumnRenamed("_host", "host")
    )


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per canonical URL — the ingest
    pre-filter that runs before any content sketching. Rows with NULL
    urls are kept as-is (no URL evidence, not duplicates): they are
    routed AROUND the grouping, because an equi-join key is
    null-rejecting and a NULL group key would otherwise collapse every
    url-less row into one arbitrary survivor."""
    normed = with_normalized_url(df, url_col)
    withurl = normed.filter(F.col("norm_url").isNotNull())
    nourl = normed.filter(F.col("norm_url").isNull()).drop("norm_url")
    reps = withurl.groupBy("norm_url").agg(F.min(id_col).alias(id_col))
    return withurl.join(
        reps, ["norm_url", id_col], "left_semi",
    ).drop("norm_url").unionByName(nourl)


def latest_snapshot(df: DataFrame, url_col: str = "url",
                    ts_col: str = "warc_ts",
                    id_col: str = "doc_id") -> DataFrame:
    """Re-crawl collapse: keep the NEWEST fetch of each canonical URL
    (max ``ts_col``, ties broken to the largest ``id_col`` — a total
    deterministic rule). The other standard ingest pre-filter beside
    ``url_dedup``: a multi-snapshot Common-Crawl stack refreshes pages
    across crawls, and training pipelines keep the freshest copy rather
    than an arbitrary one.

    Shape: argmax via ``max(struct(ts, id))`` — a plain aggregate with
    map-side partials, so a URL refetched 10^6 times collapses inside
    each map task before the (short-key + 16 B)/url exchange; never a
    row_number window funnel over hot URLs. Rows with NULL urls carry
    no revisit evidence and are kept as-is (routed around the grouping,
    same rule as ``url_dedup``); a NULL ``ts_col`` sorts below every
    real timestamp (struct max ordering), so a dated fetch always beats
    an undated one.
    """
    normed = with_normalized_url(df, url_col)
    withurl = normed.filter(F.col("norm_url").isNotNull())
    nourl = normed.filter(F.col("norm_url").isNull()).drop("norm_url")
    winners = (
        withurl.groupBy("norm_url")
        .agg(F.max(F.struct(F.col(ts_col), F.col(id_col))).alias("_w"))
        .select("norm_url", F.col(f"_w.{id_col}").alias(id_col))
    )
    return withurl.join(
        winners, ["norm_url", id_col], "left_semi",
    ).drop("norm_url").unionByName(nourl)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
) -> DataFrame:
    """Incremental re-crawl delta: compare two crawl snapshots by
    canonical URL and emit (norm_url, status, old_doc_id, new_doc_id)
    for every ``added`` / ``removed`` / ``changed`` URL — ``unchanged``
    pages (same canonical URL, byte-identical text) are NOT emitted.

    This is how a 10^12-document pipeline processes crawl N+1 without
    re-reading crawl N's work: downstream stages (sketching, dedup,
    scoring) run on the delta, which for web crawls is a small fraction
    of the corpus. Emitting only the delta is the point — the full
    outer join's matched-and-identical rows die at the filter, inside
    the join stage, so the output is O(churn), not O(corpus).

    Shape: each side collapses revisits first (``latest_snapshot`` when
    ``ts_col`` is given, else min-id ``url_dedup`` semantics), projects
    to (norm_url, id, 16 B md5(text)) — the only bytes that shuffle —
    then ONE full-outer equi-join on the canonical URL. Rows with NULL
    urls carry no cross-snapshot identity and are excluded (they cannot
    be matched between crawls); run content-level dedup on them instead.
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        collapsed = (latest_snapshot(df, url_col, ts_col, id_col)
                     if ts_col else url_dedup(df, url_col, id_col))
        return (
            with_normalized_url(collapsed, url_col)
            .filter(F.col("norm_url").isNotNull())
            .select(
                "norm_url",
                F.col(id_col).alias(f"{tag}_doc_id"),
                F.md5(F.col(text_col)).alias(f"{tag}_fp"),
            )
        )

    j = side(old, "old").join(side(new, "new"), "norm_url", "full_outer")
    status = (
        F.when(F.col("old_doc_id").isNull(), F.lit("added"))
        .when(F.col("new_doc_id").isNull(), F.lit("removed"))
        # eqNullSafe: a NULL text on one side is still a change
        .when(~F.col("old_fp").eqNullSafe(F.col("new_fp")),
              F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status") != "unchanged")
        .select("norm_url", "status", "old_doc_id", "new_doc_id")
    )
