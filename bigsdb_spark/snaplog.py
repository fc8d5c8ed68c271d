"""Transactional versioned-snapshot commit log for on-disk tables.

The reference swaps derived tables atomically inside a database
transaction (sql/isolatedb.sql:1580-1586: create temp_* -> DROP old ->
ALTER RENAME, all under the server's transactional DDL).  The Spark
engine persists its materializations and streaming indexes as parquet
directories, where a bare pointer file gives atomic *cutover* but not
reader isolation (a reader holding the old pointer can lose its files
to the swap's cleanup) nor multi-writer safety (two concurrent
refreshes can interleave pointer writes and leak or clobber versions).

``SnapshotLog`` is the pure-Python stand-in for a lakehouse table
format (Delta/Iceberg, which are not available in this sandbox): an
append-only commit log of immutable snapshots.

Layout under a root directory::

    <root>/_log/00000000001.json     # one immutable record per commit
    <root>/snap-<token>/<table>/...  # immutable payload (parquet dirs)
    <root>/_staging/<token>/...      # uncommitted writer scratch

Protocol invariants:

* A snapshot becomes visible in exactly one atomic step: hard-linking a
  fully written record file into ``_log/<version>.json`` (``os.link``
  fails with EEXIST if the version is taken, so the first writer wins
  and a concurrent loser retries with the next number or aborts on an
  ``expected_version`` conflict).  Readers therefore never observe a
  partial record or a record pointing at unfinished payload.
* Payload directories are immutable once published and are only removed
  by ``gc`` keeping the newest ``keep`` versions — an in-flight reader
  that resolved the previous snapshot finishes against intact files
  (reader isolation across swaps; same retention the pointer protocol
  kept implicitly).
* A crash at ANY point before the record link leaves only unreferenced
  scratch (``_staging/<token>`` or an unpublished ``snap-<token>``),
  which ``gc`` sweeps; the previous snapshot stays the latest.  A crash
  after the link is a completed commit.
* Each record carries caller metadata (JSON), giving persisted state a
  format/version marker — the probe side can fail fast on a snapshot
  written by an incompatible pipeline instead of silently mismatching.

Crash-safety is proven by injection tests that simulate a kill between
every adjacent pair of protocol steps (tests/test_snaplog.py).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Any, Callable

# Test-only failpoint hook: tests install a callable that raises at a
# named protocol step to simulate a crash there.  Never set in
# production; the default is a no-op.
_FAILPOINT: Callable[[str], None] = lambda name: None


def _fail(name: str) -> None:
    _FAILPOINT(name)


class CommitConflict(RuntimeError):
    """Another writer committed first (optimistic-concurrency loss)."""


@dataclass(frozen=True)
class Snapshot:
    """A resolved, immutable, committed snapshot."""

    root: str
    version: int
    snapshot_dir: str          # relative to root
    tables: tuple[str, ...]
    meta: dict[str, Any]

    def path(self, table: str) -> str:
        if table not in self.tables:
            raise KeyError(f"snapshot v{self.version} has no table {table!r}")
        return os.path.join(self.root, self.snapshot_dir, table)


class Transaction:
    """Writer scratch space: stage tables, then commit atomically."""

    def __init__(self, log: "SnapshotLog"):
        self._log = log
        self.token = uuid.uuid4().hex[:12]
        self._dir = os.path.join(log.root, "_staging", self.token)
        os.makedirs(self._dir, exist_ok=True)
        self._done = False
        self._published: str | None = None
        self._linked = False

    def path(self, table: str) -> str:
        """Target directory for a staged table (write parquet here)."""
        if "/" in table or table.startswith("_"):
            raise ValueError(f"bad table name {table!r}")
        return os.path.join(self._dir, table)

    def commit(
        self,
        meta: dict[str, Any] | None = None,
        expected_version: int | None = None,
    ) -> Snapshot:
        """Publish the staged tables as the next snapshot.

        ``expected_version``: if given, abort with ``CommitConflict``
        when the latest committed version is no longer this one — the
        caller's read-modify-write raced another writer and must be
        retried from a fresh read (lost-update prevention).  Without
        it, concurrent writers serialize on the version number via the
        link-first-wins loop (last-committer-wins ordering, no lost
        directories either way).
        """
        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        tables = sorted(
            d
            for d in os.listdir(self._dir)
            if os.path.isdir(os.path.join(self._dir, d))
        )
        if not tables:
            raise ValueError("nothing staged")
        _fail("pre_publish")
        # publish payload under an unguessable immutable name first;
        # until a record references it, it is invisible garbage
        snap_rel = f"snap-{self.token}"
        os.replace(self._dir, os.path.join(self._log.root, snap_rel))
        self._published = snap_rel
        _fail("post_publish")
        log_dir = os.path.join(self._log.root, "_log")
        os.makedirs(log_dir, exist_ok=True)
        tmp = os.path.join(log_dir, f".tmp-{self.token}")
        try:
            # losing the link race (EEXIST) proves ANOTHER writer just
            # committed, so unbounded retry cannot livelock: a writer
            # retries at most once per competing commit (lock-free
            # progress).  Only expected_version mismatches abort.
            while True:
                latest = self._log.latest()
                latest_v = latest.version if latest else -1
                if expected_version is not None and latest_v != expected_version:
                    raise CommitConflict(
                        f"expected latest v{expected_version}, found v{latest_v}"
                    )
                version = latest_v + 1
                record = {
                    "version": version,
                    "snapshot": snap_rel,
                    "tables": tables,
                    "meta": meta or {},
                }
                with open(tmp, "w") as fh:
                    json.dump(record, fh)
                    fh.flush()
                    os.fsync(fh.fileno())
                _fail("pre_link")
                try:
                    # the atomic publish: first writer to claim the
                    # version number wins; EEXIST means we raced
                    os.link(tmp, os.path.join(log_dir, f"{version:011d}.json"))
                except FileExistsError:
                    continue
                self._linked = True  # commit is durable from here on
                _fail("post_link")
                self._done = True
                return Snapshot(
                    self._log.root, version, snap_rel, tuple(tables), meta or {}
                )
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass

    def abort(self) -> None:
        """Discard the transaction: remove staged scratch, and — if the
        payload was published but its record never linked (a commit
        that lost an ``expected_version`` race) — the orphaned payload
        dir as well.  A no-op on the payload once the record has
        linked: the commit is durable then, and removing its payload
        would corrupt the latest snapshot."""
        shutil.rmtree(self._dir, ignore_errors=True)
        if self._published is not None and not self._linked:
            shutil.rmtree(
                os.path.join(self._log.root, self._published),
                ignore_errors=True,
            )
        self._done = True


class SnapshotLog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def begin(self) -> Transaction:
        return Transaction(self)

    # -- readers ---------------------------------------------------------
    def _log_dir(self) -> str:
        return os.path.join(self.root, "_log")

    def versions(self) -> list[int]:
        try:
            names = os.listdir(self._log_dir())
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            if n.endswith(".json") and not n.startswith("."):
                try:
                    out.append(int(n[:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def snapshot(self, version: int) -> Snapshot:
        with open(os.path.join(self._log_dir(), f"{version:011d}.json")) as fh:
            rec = json.load(fh)
        return Snapshot(
            self.root,
            rec["version"],
            rec["snapshot"],
            tuple(rec["tables"]),
            rec.get("meta", {}),
        )

    def latest(self) -> Snapshot | None:
        vs = self.versions()
        return self.snapshot(vs[-1]) if vs else None

    # -- maintenance -----------------------------------------------------
    def gc(
        self,
        keep: int = 2,
        sweep_orphans: bool = False,
        scratch_ttl_s: float = 0.0,
    ) -> list[str]:
        """Drop snapshots older than the newest ``keep``.  Returns the
        removed paths.  ``keep >= 1`` always; in-flight readers of the
        previous snapshot need ``keep >= 2`` (the pointer protocol's
        implicit retention, now explicit).

        ``sweep_orphans=True`` additionally removes unreferenced
        scratch — aborted ``_staging`` dirs and published-but-never-
        linked ``snap-`` dirs from crashed commits.  With the default
        ``scratch_ttl_s=0`` that is only safe when no writer is in
        flight (single-writer startup recovery): a concurrent writer
        between its publish and link steps holds exactly such a dir.
        Pass a positive ``scratch_ttl_s`` to make the sweep safe under
        concurrency — scratch younger than the TTL is presumed to
        belong to a live writer and is skipped; anything older than a
        sane TTL (commits take seconds, not hours) is a crash
        leftover."""
        keep = max(1, keep)
        removed: list[str] = []
        vs = self.versions()
        live, dead = vs[-keep:], vs[:-keep]
        referenced = {self.snapshot(v).snapshot_dir for v in live}
        for v in dead:
            snap = self.snapshot(v)
            if snap.snapshot_dir not in referenced:
                p = os.path.join(self.root, snap.snapshot_dir)
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
            os.unlink(os.path.join(self._log_dir(), f"{v:011d}.json"))
        if sweep_orphans:
            import time

            def _expired(p: str) -> bool:
                if scratch_ttl_s <= 0:
                    return True
                try:
                    return time.time() - os.path.getmtime(p) > scratch_ttl_s
                except OSError:
                    return False  # vanished under us: a live writer moved it

            all_referenced = {
                self.snapshot(v).snapshot_dir for v in self.versions()
            }
            for d in os.listdir(self.root):
                if d.startswith("snap-") and d not in all_referenced:
                    p = os.path.join(self.root, d)
                    if _expired(p):
                        shutil.rmtree(p, ignore_errors=True)
                        removed.append(p)
            staging = os.path.join(self.root, "_staging")
            if os.path.isdir(staging):
                if scratch_ttl_s <= 0:
                    shutil.rmtree(staging, ignore_errors=True)
                    removed.append(staging)
                else:
                    for d in os.listdir(staging):
                        p = os.path.join(staging, d)
                        if _expired(p):
                            shutil.rmtree(p, ignore_errors=True)
                            removed.append(p)
        return removed
