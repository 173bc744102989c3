"""Registry hygiene: pin the driver-window rotation policy so a new
contract query can never silently land outside the driver's
DRIVER_WINDOW-query check prefix (the round-4 process defect), and pin
the strict contract-checker canonicalization so type drift between an
op and its oracle (DOUBLE 3.0 vs BIGINT 3) is a local failure before it
becomes a driver hash_match failure.

No SparkSession needed — these are pure registry/compare checks.
"""

import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402


def test_history_covers_registry_exactly():
    qs = set(entrymod.queries())
    hist = set(entrymod.DRIVER_GREEN_HISTORY)
    assert qs == hist, (
        f"DRIVER_GREEN_HISTORY out of sync with queries(): "
        f"missing={sorted(qs - hist)} stale={sorted(hist - qs)} — "
        f"a new query MUST get a history entry (0 = never checked) and "
        f"a slot inside the first {entrymod.DRIVER_WINDOW} positions"
    )


def test_no_never_checked_query_outside_window():
    qs = list(entrymod.queries())
    hist = entrymod.DRIVER_GREEN_HISTORY
    dark = qs[entrymod.DRIVER_WINDOW:]
    never = [q for q in dark if hist[q] == 0]
    assert never == [], (
        f"queries with zero lifetime green driver rows are outside the "
        f"driver's {entrymod.DRIVER_WINDOW}-query window: {never}"
    )


def test_window_prioritizes_least_recently_checked():
    """Every query INSIDE the window must be no more recently green than
    any never-checked query (trivially true) and the dark set must hold
    only the most recently green queries: max(last_green in window,
    excluding deliberate re-checks) <= min(last_green in dark)."""
    qs = list(entrymod.queries())
    hist = entrymod.DRIVER_GREEN_HISTORY
    dark = qs[entrymod.DRIVER_WINDOW:]
    # the dark set may contain nothing older than round (current-2):
    # with history values {0, 3, 4} and the round-5 window, dark must be
    # all last_green >= 4
    assert all(hist[q] >= 4 for q in dark), (
        f"stale queries left dark: "
        f"{[q for q in dark if hist[q] < 4]}"
    )


def test_rows_only_set_is_sanctioned_only():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rows_only = sorted(set(qs) - set(oracles))
    assert rows_only == ["quality_classifier_preds", "topic_counts"], (
        f"unexpected rows-only queries (no oracle_sql entry): "
        f"{rows_only} — every new query needs an oracle unless its "
        f"training math is partitioning-dependent by construction"
    )


def test_strict_canon_catches_type_drift():
    """The exact round-4 escape: values numerically identical, types
    different (Spark DOUBLE vs oracle BIGINT). Loose allclose passes;
    strict stringify must fail — mirroring the driver's hash compare."""
    sys.path.insert(0, "/root/repo/tools")
    import check_contract as cc

    spark_side = pd.DataFrame({"id": [1, 2], "rep_score": [3.0, 5.0]})
    oracle_side = pd.DataFrame({"id": [1, 2], "rep_score": [3, 5]})
    assert cc.compare("t", spark_side, oracle_side) == []
    strict = cc.compare_strict("t", spark_side, oracle_side)
    assert strict, "strict compare must flag DOUBLE-vs-BIGINT drift"
    assert "rep_score" in strict[0]


def test_strict_canon_null_and_bytes():
    import check_contract as cc

    a = pd.DataFrame({"x": [None, b"\x01\xff"], "y": [1.5, float("nan")]})
    b2 = pd.DataFrame({"x": [None, b"\x01\xff"], "y": [1.5, None]})
    assert cc.compare_strict("t", a, b2) == []
