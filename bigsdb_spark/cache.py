"""Governed materializations (SURVEY §4 X1-X3).

The reference maintains derived tables (per-scheme field caches,
completion counts, seqbin/locus stats) with full / incremental / daily /
daily_replace refresh modes and an atomic create-new -> drop-old ->
rename swap (sql/isolatedb.sql:1441-1586, Datastore.pm:1242-2175,
update_scheme_caches.pl).

Here a materialization is a parquet table governed by a transactional
``SnapshotLog`` (bigsdb_spark/snaplog.py): immutable snapshot dirs
published by an append-only commit log, so

- ``refresh_full``   : stage a new version, commit atomically — readers
  never see a partial table (the reference's atomic rename swap), and a
  reader mid-query on the previous version keeps intact files (reader
  isolation the old pointer-file protocol lacked).
- ``refresh_incremental`` : new version = current rows for unchanged
  keys + recomputed rows for the changed-key set (the reference's
  incremental mode keyed on isolate id + datestamp) — an anti-join +
  union, i.e. exactly a MERGE, expressed on immutable parquet.  The
  commit carries ``expected_version``: two concurrent incremental
  refreshes cannot silently lose one writer's merge — the loser gets a
  ``CommitConflict`` and retries from a fresh read.
- ``read``           : the current version as a DataFrame.

On Delta/Iceberg the commit log is REPLACE TABLE / MERGE; the semantics
tested here are mode correctness, swap atomicity, and crash-injection
recovery (tests/test_snaplog.py kills the protocol between every pair
of steps).

A cache-vs-recompute policy mirrors the reference's thresholds
(MAX_LOCI_NON_CACHE_SCHEME=30, Constants.pm:41; cache required above
100 loci for rendering, ResultsTablePage.pm:33).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigsdb_spark.snaplog import CommitConflict, SnapshotLog

MAX_LOCI_NON_CACHE_SCHEME = 30   # Constants.pm:41
LOCUS_LIMIT_TO_USE_CACHE = 100   # ResultsTablePage.pm:33


def should_use_cache(n_loci: int, for_display: bool = False) -> bool:
    """Cache policy: scheme-warehouse queries cache past 30 loci
    (Constants.pm:41); the results-table display path tolerates up to
    100 uncached loci before demanding the cache
    (ResultsTablePage.pm:33)."""
    limit = LOCUS_LIMIT_TO_USE_CACHE if for_display else MAX_LOCI_NON_CACHE_SCHEME
    return n_loci > limit


class Materialization:
    """A governed derived table backed by a ``SnapshotLog``.

    Version strings keep the historical ``v_%06d`` shape (they are the
    log's integer versions), so callers and tests see the same names
    the pointer protocol produced.

    Retention policy: every refresh commits a new version and then
    gc's the log down to ``keep_versions`` (default 2 = the new
    version plus its predecessor — the minimum that keeps a reader
    who resolved the previous snapshot just before the swap safe, and
    the same implicit retention the reference's create->rename->drop
    swap provides, sql/isolatedb.sql:1580-1586).  Raise
    ``keep_versions`` on the refresh call to hold a longer time-travel
    window: a reader is guaranteed its pinned version's files for the
    next ``keep_versions - 1`` refreshes, after which reads of that
    version raise like a missing table.  gc runs inline after each
    refresh commit (the streaming refresh jobs inherit this — no
    separate janitor to schedule); orphan sweeping of crashed-writer
    scratch is the separate age-gated ``SnapshotLog.gc(sweep_orphans=
    True, scratch_ttl_s=...)`` documented in snaplog.py."""

    TABLE = "data"

    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.dir = os.path.join(root, name)
        self.log = SnapshotLog(self.dir)

    def current_version(self) -> str | None:
        snap = self.log.latest()
        return f"v_{snap.version:06d}" if snap else None

    def exists(self) -> bool:
        return self.log.latest() is not None

    def read(self, version: str | int | None = None) -> DataFrame:
        """Read the latest snapshot, or — time travel — any retained
        version (``v_%06d`` string or bare int).  Retention is the
        ``keep_versions`` knob of the refresh path: an old version
        reads fine until gc drops it, then raises like a missing
        table."""
        if version is None:
            snap = self.log.latest()
            if snap is None:
                raise FileNotFoundError(f"no current version for {self.dir}")
        else:
            v = (
                int(version.removeprefix("v_"))
                if isinstance(version, str)
                else int(version)
            )
            if v not in self.log.versions():
                raise FileNotFoundError(
                    f"version v_{v:06d} of {self.dir} does not exist or "
                    "was dropped by retention"
                )
            snap = self.log.snapshot(v)
        return self.spark.read.parquet(snap.path(self.TABLE))

    def history(self) -> list[dict]:
        """Commit history of the retained snapshots, oldest first:
        version string, payload tables, and the caller metadata each
        commit recorded — the audit surface a lakehouse table format
        exposes (DESCRIBE HISTORY), driven from the same log that
        serves reads."""
        return [
            {
                "version": f"v_{s.version:06d}",
                "tables": list(s.tables),
                "meta": dict(s.meta),
            }
            for s in map(self.log.snapshot, self.log.versions())
        ]

    def _swap_in(
        self,
        df: DataFrame,
        keep_versions: int = 2,
        expected_version: int | None = None,
        meta: dict | None = None,
    ) -> str:
        """Stage a complete new version, commit it atomically, then gc
        superseded snapshots — the reference's full create-new ->
        rename -> drop-old swap (sql/isolatedb.sql:1580-1586), now with
        reader isolation: ``keep_versions`` retains the new snapshot
        plus its predecessor, and a crash anywhere before the commit
        link leaves the previous snapshot current and complete."""
        txn = self.log.begin()
        try:
            df.write.mode("overwrite").parquet(txn.path(self.TABLE))
            snap = txn.commit(meta=meta, expected_version=expected_version)
        except BaseException:
            txn.abort()
            raise
        self.log.gc(keep=keep_versions)
        return f"v_{snap.version:06d}"

    def refresh_full(self, df: DataFrame, keep_versions: int = 2) -> str:
        return self._swap_in(df, keep_versions, meta={"op": "full"})

    def refresh_incremental(
        self,
        recomputed: DataFrame,
        changed_keys: DataFrame,
        key: str,
        max_retries: int = 3,
        keep_versions: int = 2,
    ) -> str:
        """MERGE semantics: keep current rows whose key is NOT in
        ``changed_keys``, add ``recomputed`` rows (which must cover
        exactly the changed keys).  The read-merge-commit cycle is
        guarded by ``expected_version`` — if another writer lands a
        version between our read and our commit, the merge would be
        based on stale rows, so the commit aborts and the cycle
        retries against the fresh snapshot (no lost updates)."""
        for _ in range(max_retries):
            snap = self.log.latest()
            if snap is None:
                try:
                    return self._swap_in(
                        recomputed, keep_versions,
                        expected_version=-1, meta={"op": "merge"},
                    )
                except CommitConflict:
                    continue  # someone created v0 under us; merge with it
            current = self.spark.read.parquet(snap.path(self.TABLE))
            kept = current.join(
                F.broadcast(changed_keys.select(key).distinct()),
                on=key,
                how="left_anti",
            )
            try:
                return self._swap_in(
                    kept.unionByName(recomputed),
                    keep_versions,
                    expected_version=snap.version,
                    meta={"op": "merge"},
                )
            except CommitConflict:
                continue
        raise CommitConflict(
            f"incremental refresh of {self.dir} lost {max_retries} races"
        )
