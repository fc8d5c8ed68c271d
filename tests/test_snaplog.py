"""Transactional snapshot-log tests (SURVEY §4 X1-X3 hardening).

The reference swaps derived tables inside a database transaction
(sql/isolatedb.sql:1580-1586); the engine's parquet equivalent is
``bigsdb_spark/snaplog.py``.  The core claim — a reader NEVER sees a
partial or missing snapshot, whatever instant a writer dies — is proven
here by injecting a crash between every adjacent pair of protocol
steps and checking the reader's view after each.
"""

from __future__ import annotations

import json
import os

import pytest

from bigsdb_spark import snaplog
from bigsdb_spark.snaplog import CommitConflict, SnapshotLog


@pytest.fixture
def no_failpoints():
    yield
    snaplog._FAILPOINT = lambda name: None


def _write_table(txn, table: str, payload: str) -> None:
    os.makedirs(txn.path(table), exist_ok=True)
    with open(os.path.join(txn.path(table), "data.txt"), "w") as fh:
        fh.write(payload)


def _read_table(snap, table: str) -> str:
    with open(os.path.join(snap.path(table), "data.txt")) as fh:
        return fh.read()


def _commit(log: SnapshotLog, payload: str, **kw):
    txn = log.begin()
    try:
        _write_table(txn, "data", payload)
        return txn.commit(**kw)
    except BaseException:
        txn.abort()
        raise


def test_commit_read_roundtrip(tmp_path):
    log = SnapshotLog(str(tmp_path / "t"))
    assert log.latest() is None
    s0 = _commit(log, "v0 rows", meta={"batch_id": 7})
    assert s0.version == 0
    got = log.latest()
    assert got.version == 0
    assert got.meta == {"batch_id": 7}
    assert _read_table(got, "data") == "v0 rows"
    s1 = _commit(log, "v1 rows")
    assert s1.version == 1
    assert _read_table(log.latest(), "data") == "v1 rows"


ALL_FAILPOINTS = ["pre_publish", "post_publish", "pre_link", "post_link"]


@pytest.mark.parametrize("point", ALL_FAILPOINTS)
def test_crash_injection_every_step(tmp_path, point, no_failpoints):
    """Kill the writer between every pair of protocol steps.  Before
    the record link the previous snapshot must stay latest and fully
    readable; after the link the commit is durable."""
    root = str(tmp_path / "t")
    log = SnapshotLog(root)
    _commit(log, "old rows")

    class Boom(RuntimeError):
        pass

    def hook(name):
        if name == point:
            raise Boom(name)

    snaplog._FAILPOINT = hook
    with pytest.raises(Boom):
        _commit(log, "new rows")
    snaplog._FAILPOINT = lambda name: None

    snap = log.latest()
    if point == "post_link":
        # the link happened: the commit is durable despite the crash
        assert snap.version == 1
        assert _read_table(snap, "data") == "new rows"
    else:
        assert snap.version == 0
        assert _read_table(snap, "data") == "old rows"
    # recovery: sweep scratch, then the writer retries and lands
    log.gc(sweep_orphans=True)
    assert _read_table(log.latest(), "data") == "old rows" or point == "post_link"
    _commit(log, "retry rows")
    assert _read_table(log.latest(), "data") == "retry rows"
    # no crash residue: only referenced payload dirs + the log remain
    residue = [
        d
        for d in os.listdir(root)
        if d.startswith("snap-")
        and d not in {log.snapshot(v).snapshot_dir for v in log.versions()}
    ]
    log.gc(sweep_orphans=True)
    assert not [
        d
        for d in os.listdir(root)
        if d.startswith("snap-")
        and d not in {log.snapshot(v).snapshot_dir for v in log.versions()}
    ], residue


def test_expected_version_conflict(tmp_path):
    """Optimistic concurrency: a writer whose read went stale must NOT
    be able to clobber the other writer's commit."""
    log = SnapshotLog(str(tmp_path / "t"))
    _commit(log, "base")
    base = log.latest().version
    # writer A and writer B both read version `base`; A commits first
    _commit(log, "A's merge", expected_version=base)
    with pytest.raises(CommitConflict):
        _commit(log, "B's stale merge", expected_version=base)
    assert _read_table(log.latest(), "data") == "A's merge"
    # B retries from a fresh read and succeeds
    _commit(log, "B's fresh merge", expected_version=log.latest().version)
    assert _read_table(log.latest(), "data") == "B's fresh merge"


def test_unversioned_writers_serialize(tmp_path):
    """Without expected_version, concurrent commits serialize on the
    version number (link-first-wins); none is lost or overwritten."""
    log = SnapshotLog(str(tmp_path / "t"))
    # interleave: both stage before either commits
    t1, t2 = log.begin(), log.begin()
    _write_table(t1, "data", "one")
    _write_table(t2, "data", "two")
    s1 = t1.commit()
    s2 = t2.commit()
    assert {s1.version, s2.version} == {0, 1}
    assert _read_table(log.snapshot(0), "data") == "one"
    assert _read_table(log.snapshot(1), "data") == "two"


def test_gc_keeps_previous_snapshot_for_inflight_readers(tmp_path):
    log = SnapshotLog(str(tmp_path / "t"))
    _commit(log, "v0")
    reader_view = log.latest()  # an in-flight reader pinned v0
    _commit(log, "v1")
    log.gc(keep=2)
    # the reader's files are intact after the newer commit + gc
    assert _read_table(reader_view, "data") == "v0"
    _commit(log, "v2")
    log.gc(keep=2)
    # now v0 is beyond the retention window
    assert not os.path.exists(reader_view.path("data"))
    assert log.versions() == [1, 2]


def test_gc_orphan_sweep_and_abort(tmp_path):
    root = str(tmp_path / "t")
    log = SnapshotLog(root)
    _commit(log, "v0")
    # aborted transaction leaves no staging behind
    t = log.begin()
    _write_table(t, "data", "junk")
    t.abort()
    # crashed commit: published payload, record never linked
    t2 = log.begin()
    _write_table(t2, "data", "junk2")
    os.replace(t2._dir, os.path.join(root, "snap-orphan"))
    log.gc(sweep_orphans=True)
    assert not os.path.exists(os.path.join(root, "snap-orphan"))
    assert not os.path.exists(os.path.join(root, "_staging"))
    assert _read_table(log.latest(), "data") == "v0"


def test_record_is_complete_at_visibility(tmp_path):
    """The log record a reader can list is always fully written: the
    link is the visibility point and the source file was fsynced."""
    log = SnapshotLog(str(tmp_path / "t"))
    _commit(log, "v0", meta={"format": "x/1"})
    log_dir = os.path.join(log.root, "_log")
    (rec,) = [f for f in os.listdir(log_dir) if f.endswith(".json")]
    with open(os.path.join(log_dir, rec)) as fh:
        parsed = json.load(fh)  # parses — never a torn write
    assert parsed["meta"] == {"format": "x/1"}
    assert parsed["tables"] == ["data"]


def test_materialization_crash_injection(spark, tmp_path, no_failpoints):
    """The governed-cache swap on top of the log: a refresh killed at
    any pre-link step leaves readers on the old, complete version."""
    from bigsdb_spark.cache import Materialization

    m = Materialization(spark, str(tmp_path), "mat")
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    m.refresh_full(df1)

    class Boom(RuntimeError):
        pass

    def hook(name):
        if name == "pre_link":
            raise Boom(name)

    snaplog._FAILPOINT = hook
    with pytest.raises(Boom):
        m.refresh_full(df2)
    snaplog._FAILPOINT = lambda name: None
    assert m.current_version() == "v_000000"
    assert [tuple(r) for r in m.read().collect()] == [(1, "a")]
    m.refresh_full(df2)
    assert [tuple(r) for r in m.read().collect()] == [(2, "b")]


def test_materialization_incremental_retries_on_race(spark, tmp_path):
    """A competing full refresh landing between the incremental's read
    and commit forces a retry from the fresh snapshot — the competing
    write is merged with, never silently overwritten."""
    from bigsdb_spark.cache import Materialization

    m = Materialization(spark, str(tmp_path), "mat")
    m.refresh_full(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))

    raced = {"done": False}
    orig = snaplog._FAILPOINT

    def hook(name):
        # on the incremental's first commit attempt, sneak a competing
        # full refresh in just before the link
        if name == "pre_link" and not raced["done"]:
            raced["done"] = True
            m2 = Materialization(spark, str(tmp_path), "mat")
            m2.refresh_full(
                spark.createDataFrame(
                    [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
                )
            )

    snaplog._FAILPOINT = hook
    try:
        m.refresh_incremental(
            spark.createDataFrame([(2, "B!")], "id long, v string"),
            spark.createDataFrame([(2,)], "id long"),
            "id",
        )
    finally:
        snaplog._FAILPOINT = orig
    got = sorted(tuple(r) for r in m.read().collect())
    # row 3 from the competing refresh survived the merge
    assert got == [(1, "a"), (2, "B!"), (3, "c")]


def test_threaded_commit_race_loses_nothing(tmp_path):
    """N threads race unversioned commits: every commit lands, versions
    are a contiguous 0..N-1 sequence, and each payload is readable at
    exactly one version — the link-first-wins loop serializes writers
    without locks (the multi-writer claim under a real thread race)."""
    import threading

    log = SnapshotLog(str(tmp_path / "t"))
    n = 12
    barrier = threading.Barrier(n)
    errors: list[BaseException] = []

    def commit_one(i):
        try:
            txn = log.begin()
            _write_table(txn, "data", f"payload-{i}")
            barrier.wait()  # maximize link contention
            txn.commit(meta={"writer": i})
        except BaseException as e:
            errors.append(e)

    threads = [threading.Thread(target=commit_one, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert log.versions() == list(range(n))
    payloads = sorted(
        _read_table(log.snapshot(v), "data") for v in log.versions()
    )
    assert payloads == sorted(f"payload-{i}" for i in range(n))


def test_materialization_time_travel_and_history(spark, tmp_path):
    """read(version) serves any retained snapshot unchanged while new
    versions land; history() exposes the commit trail with per-op
    metadata; retention gc turns a dropped version into a clean
    FileNotFoundError."""
    from bigsdb_spark.cache import Materialization

    mat = Materialization(spark, str(tmp_path), "tt")
    mat.refresh_full(spark.range(3).withColumnRenamed("id", "k"))
    v0 = mat.current_version()
    mat.refresh_incremental(
        spark.createDataFrame([(1,)], "k long"),
        spark.createDataFrame([(1,)], "k long"),
        key="k",
    )
    v1 = mat.current_version()
    assert (v0, v1) == ("v_000000", "v_000001")
    # time travel: the superseded version is intact and distinct
    assert sorted(r["k"] for r in mat.read(v0).collect()) == [0, 1, 2]
    assert sorted(r["k"] for r in mat.read(0).collect()) == [0, 1, 2]
    assert sorted(r["k"] for r in mat.read().collect()) == [0, 1, 2]
    hist = mat.history()
    assert [h["version"] for h in hist] == ["v_000000", "v_000001"]
    assert [h["meta"]["op"] for h in hist] == ["full", "merge"]
    assert all(h["tables"] == ["data"] for h in hist)
    # a third refresh pushes v0 past keep_versions=2 -> retention error
    mat.refresh_full(spark.range(5).withColumnRenamed("id", "k"))
    with pytest.raises(FileNotFoundError, match="retention"):
        mat.read(v0)
    assert [h["version"] for h in mat.history()] == ["v_000001", "v_000002"]
    with pytest.raises(FileNotFoundError):
        mat.read(99)


def test_materialization_reader_pinned_across_two_refresh_gc_cycles(
    spark, tmp_path
):
    """Retention contract (VERDICT r5 #4): a reader who resolved a
    version keeps its files for the next keep_versions - 1 refreshes,
    each of which runs gc inline.  A Spark DataFrame pinned to v0 is
    re-collected AFTER each of two refresh+gc cycles at
    keep_versions=3 (both succeed, identical rows), and the third
    refresh — v0 now beyond retention — removes its files."""
    import os as _os

    from bigsdb_spark.cache import Materialization

    mat = Materialization(spark, str(tmp_path), "pin")
    mat.refresh_full(spark.range(4).withColumnRenamed("id", "k"))
    pinned = mat.read()  # lazy plan bound to v0's physical path
    v0_path = mat.log.snapshot(0).path(Materialization.TABLE)
    assert sorted(r["k"] for r in pinned.collect()) == [0, 1, 2, 3]
    # refresh #1 + inline gc at keep=3: v0 retained
    mat.refresh_full(
        spark.range(10).withColumnRenamed("id", "k"), keep_versions=3
    )
    assert sorted(r["k"] for r in pinned.collect()) == [0, 1, 2, 3]
    # refresh #2 + inline gc at keep=3: v0 is the 3rd-newest, retained
    mat.refresh_incremental(
        spark.createDataFrame([(1,)], "k long"),
        spark.createDataFrame([(1,)], "k long"),
        key="k",
        keep_versions=3,
    )
    assert _os.path.exists(v0_path)
    assert sorted(r["k"] for r in pinned.collect()) == [0, 1, 2, 3]
    assert mat.log.versions() == [0, 1, 2]
    # refresh #3 at keep=3 pushes v0 out: files gone, version list slid
    mat.refresh_full(
        spark.range(2).withColumnRenamed("id", "k"), keep_versions=3
    )
    assert not _os.path.exists(v0_path)
    assert mat.log.versions() == [1, 2, 3]
    # current reads are unaffected throughout
    assert sorted(r["k"] for r in mat.read().collect()) == [0, 1]


def test_gc_scratch_ttl_protects_live_writers(tmp_path):
    """With a positive scratch_ttl_s, fresh scratch (a live writer
    mid-commit) survives the orphan sweep while stale crash leftovers
    are removed — making startup recovery safe to run under
    concurrency."""
    log = SnapshotLog(str(tmp_path / "t"))
    # a committed snapshot so gc has a live version to reference
    txn0 = log.begin()
    os.makedirs(txn0.path("data"))
    open(os.path.join(txn0.path("data"), "f"), "w").write("x")
    txn0.commit()
    # live writer: published payload, record not yet linked
    live = log.begin()
    os.makedirs(live.path("data"))
    open(os.path.join(live.path("data"), "f"), "w").write("y")
    # stale leftovers: an old staging dir and an old unlinked snap dir
    stale_staging = os.path.join(log.root, "_staging", "deadbeef")
    os.makedirs(stale_staging)
    stale_snap = os.path.join(log.root, "snap-oldcrash")
    os.makedirs(stale_snap)
    old = 1_000_000_000  # well past any TTL
    os.utime(stale_staging, (old, old))
    os.utime(stale_snap, (old, old))

    removed = log.gc(keep=2, sweep_orphans=True, scratch_ttl_s=3600)
    assert stale_staging in removed and stale_snap in removed
    assert os.path.isdir(live._dir)  # fresh scratch untouched
    # the live writer can still commit normally afterwards
    snap = live.commit()
    assert snap.version == 1
    # ttl=0 keeps the old semantics: everything unreferenced goes
    crash = log.begin()
    os.makedirs(crash.path("data"))
    log.gc(keep=2, sweep_orphans=True)
    assert not os.path.isdir(crash._dir)
