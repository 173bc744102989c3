"""Versioned snapshot log over parquet — the Iceberg table-format
discipline (north rule: "per-partition lineage + metrics written
alongside each Iceberg snapshot") implemented directly, since this
sandbox ships no Iceberg runtime.

The model is Iceberg's, scoped to what the engine needs:

* **data files are immutable** — every commit writes a fresh
  ``data/<uuid>/`` parquet directory and never touches prior ones
  (contrast ``io.run_checkpointed``, whose resume-oriented bucket store
  overwrites in place and keeps only the latest state);
* a **snapshot** is a JSON manifest ``_snapshots/v<N>.json`` listing the
  data directories visible at that version, the operation that produced
  it (append / overwrite), the parent version, and a summary block
  (row count, input lineage, caller metrics — the analog of Iceberg's
  snapshot summary properties);
* the **current version** is an atomic pointer file
  (``_snapshots/CURRENT``, ``os.replace``) — readers never see a torn
  table, and a writer killed before the pointer swap leaves the table
  at its previous version with only orphaned (harmless, expirable)
  data files;
* **conflict detection**: the snapshot JSON is created with ``O_EXCL``,
  so two concurrent committers race on the version file — single-table
  optimistic concurrency, the simplified form of Iceberg's commit
  protocol. An ``append`` loser retries against the winner's file list
  (its data is state-independent); a ``merge`` loser raises
  ``ConcurrentCommitError`` because its merged relation was computed
  from the pre-race table and committing it would erase the winner's
  rows — the caller re-runs the merge; ``overwrite`` is last-writer-wins
  by definition;
* **time travel**: ``read_table(..., version=N)`` reads any retained
  snapshot's file list; ``expire_snapshots`` is the maintenance job
  that prunes history and deletes data directories no retained
  snapshot references.

On a real cluster this module is replaced by
``df.writeTo(table).append()`` / ``.overwritePartitions()`` against a
catalog-backed Iceberg table — the API surface here (append /
overwrite / history / time travel / expire) maps one-to-one, which is
the point: pipelines written against it carry over.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _snap_dir(table_path: str) -> str:
    return os.path.join(table_path, "_snapshots")


def _current_path(table_path: str) -> str:
    return os.path.join(_snap_dir(table_path), "CURRENT")


def _snap_path(table_path: str, version: int) -> str:
    return os.path.join(_snap_dir(table_path), f"v{version:05d}.json")


def current_version(table_path: str) -> int | None:
    """Version the CURRENT pointer names, or None for an empty table."""
    try:
        with open(_current_path(table_path)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def snapshot(table_path: str, version: int) -> dict:
    with open(_snap_path(table_path, version)) as fh:
        return json.load(fh)


def snapshots(table_path: str) -> list[dict]:
    """All retained snapshots, oldest first (the table history)."""
    sd = _snap_dir(table_path)
    if not os.path.isdir(sd):
        return []
    out = []
    for f in sorted(os.listdir(sd)):
        if f.startswith("v") and f.endswith(".json"):
            with open(os.path.join(sd, f)) as fh:
                out.append(json.load(fh))
    return out


class ConcurrentCommitError(RuntimeError):
    """A merge lost its optimistic-concurrency race: the table advanced
    past the version the merged relation was computed against. The
    caller must re-run the merge against the new CURRENT (the data it
    wrote is discarded; nothing was committed)."""


def _commit(spark: SparkSession, df: DataFrame, table_path: str,
            operation: str, summary: dict | None,
            retries: int = 5, expected_parent: int | None | str = "any",
            ) -> int:
    """Write immutable data, then commit the snapshot: O_EXCL version
    file + atomic CURRENT swap. The data write happens ONCE; only the
    (cheap, metadata-level) commit step retries on a version race.

    ``expected_parent``: for operations whose DATA was computed from a
    specific table version (merge), the version the caller read. If the
    table has advanced past it when the commit is attempted, committing
    would silently drop the concurrent winner's rows (lost update) —
    raise ``ConcurrentCommitError`` instead and discard the data dir.
    ``"any"`` (append/overwrite) skips the check: append re-reads the
    winner's file list each retry, and overwrite replaces the table
    regardless of prior state (last-writer-wins by definition)."""
    data_dir = os.path.join(table_path, "data", uuid.uuid4().hex)
    df.write.parquet(data_dir)
    n_rows = spark.read.parquet(data_dir).count()
    os.makedirs(_snap_dir(table_path), exist_ok=True)
    lineage = ", ".join(str(p) for p in df.inputFiles()[:8]) or "<in-memory>"
    for _ in range(max(1, retries)):
        # parent = the last COMMITTED snapshot (the pointer); the version
        # number must additionally clear any snapshot file a concurrent
        # winner has created but not yet pointed at, or the loser would
        # retry the same taken version forever
        parent = current_version(table_path)
        if expected_parent != "any" and parent != expected_parent:
            shutil.rmtree(data_dir, ignore_errors=True)
            raise ConcurrentCommitError(
                f"{operation} to {table_path} computed against version "
                f"{expected_parent} but CURRENT is now {parent}; re-run "
                f"the {operation} against the new table state")
        if operation == "append" and parent is not None:
            files = snapshot(table_path, parent)["files"]
        else:
            files = []
        taken = [int(f[1:-5]) for f in os.listdir(_snap_dir(table_path))
                 if f.startswith("v") and f.endswith(".json")]
        version = max([parent or 0, *taken], default=0) + 1
        entry = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "files": files + [os.path.relpath(data_dir, table_path)],
            "summary": {
                "n_rows_written": n_rows,
                "input": lineage,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                **(summary or {}),
            },
        }
        try:
            fd = os.open(_snap_path(table_path, version),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue  # another committer won this version; re-read and retry
        with os.fdopen(fd, "w") as fh:
            json.dump(entry, fh)
        tmp = f"{_current_path(table_path)}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, _current_path(table_path))
        return version
    raise RuntimeError(
        f"snapshot commit to {table_path} lost {retries} version races")


def commit_append(spark: SparkSession, df: DataFrame, table_path: str,
                  summary: dict | None = None) -> int:
    """New snapshot = parent's files + this write's files."""
    return _commit(spark, df, table_path, "append", summary)


def commit_overwrite(spark: SparkSession, df: DataFrame, table_path: str,
                     summary: dict | None = None) -> int:
    """New snapshot = this write's files only (full-table replace at the
    metadata level; prior data stays readable via time travel until
    expired)."""
    return _commit(spark, df, table_path, "overwrite", summary)


def commit_merge(spark: SparkSession, updates: DataFrame, table_path: str,
                 key_col: str, summary: dict | None = None) -> int:
    """Copy-on-write MERGE (the Iceberg ``MERGE INTO`` analog, upsert
    form): rows of the current table whose ``key_col`` appears in
    ``updates`` are replaced, new keys are inserted, everything else is
    carried over. The re-crawl shape: upsert each crawl's pages by
    canonical URL and time-travel across crawls.

    Copy-on-write = the merged relation is rewritten as one new
    overwrite snapshot. One anti-join (hash-partitioned on the key;
    broadcast when updates are small — AQE decides) + one union; the
    prior snapshot stays readable until expired. Scale note: rewriting
    the whole table per merge is the COW trade-off — at Iceberg scale
    merge-on-read deletes bound the rewrite to touched partitions;
    partition the table (e.g. by key bucket) and merge per-partition to
    get the same bound here."""
    base = current_version(table_path)
    if base is None:
        return _commit(spark, updates, table_path, "merge", summary,
                       expected_parent=None)
    cur = read_table(spark, table_path, version=base)
    keys = updates.select(key_col).distinct()
    merged = cur.join(keys, key_col, "left_anti").unionByName(updates)
    # the merged relation embodies the table AT ``base``: committing it
    # after a concurrent commit would erase that winner's rows, so the
    # commit pins expected_parent and raises ConcurrentCommitError on a
    # race (caller re-runs the merge) rather than losing the update
    return _commit(spark, merged, table_path, "merge", summary,
                   expected_parent=base)


def read_table(spark: SparkSession, table_path: str,
               version: int | None = None) -> DataFrame:
    """Read the table at CURRENT (default) or any retained ``version``
    (time travel)."""
    v = current_version(table_path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"{table_path} has no committed snapshot")
    snap = snapshot(table_path, v)
    paths = [os.path.join(table_path, f) for f in snap["files"]]
    return spark.read.parquet(*paths)


def expire_snapshots(table_path: str, keep_last: int = 1) -> dict:
    """Iceberg-maintenance analog: retain the last ``keep_last``
    snapshots of CURRENT's ANCESTRY (never raw file order — an orphaned
    higher-version snapshot from a writer that died before its pointer
    swap must not displace the live version), delete other snapshot
    files at-or-below CURRENT, and remove data directories nothing
    retained references. Snapshot files ABOVE CURRENT are left alone:
    they may belong to a commit in flight right now (between O_EXCL
    create and pointer swap); if their writer died they become
    ≤-CURRENT non-ancestry on a later commit and the next expire cleans
    them. Unreferenced data dirs (orphans from writers that died before
    writing any snapshot file) are removed either way. Returns counts
    for audit."""
    cur = current_version(table_path)
    snaps = snapshots(table_path)
    if cur is None or not snaps:
        return {"snapshots_removed": 0, "data_dirs_removed": 0}
    by_version = {s["version"]: s for s in snaps}
    chain = []
    v = cur
    while v is not None and v in by_version:
        chain.append(by_version[v])
        v = by_version[v].get("parent")
    keep = chain[:max(1, keep_last)]  # newest-first suffix of history
    keep_versions = {s["version"] for s in keep}
    inflight = [s for s in snaps if s["version"] > cur]
    drop = [s for s in snaps
            if s["version"] <= cur and s["version"] not in keep_versions]
    referenced = {f for s in keep + inflight for f in s["files"]}
    data_root = os.path.join(table_path, "data")
    removed_dirs = 0
    if os.path.isdir(data_root):
        for d in os.listdir(data_root):
            rel = os.path.join("data", d)
            if rel not in referenced:
                shutil.rmtree(os.path.join(data_root, d),
                              ignore_errors=True)
                removed_dirs += 1
    for s in drop:
        try:
            os.remove(_snap_path(table_path, s["version"]))
        except FileNotFoundError:
            pass
    return {"snapshots_removed": len(drop), "data_dirs_removed": removed_dirs}
