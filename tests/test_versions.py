"""Isolate version chains (operators/versions.py): clone-and-point
curation, pointer-doubling chain resolution, history unrolling."""

import pyspark.sql.functions as F

from bigsdb_spark.operators.versions import (
    create_new_versions,
    latest_versions,
    version_history,
)


def _isolates(spark):
    # chain 1 -> 2 -> 3 (3 is current), singleton 7
    return spark.createDataFrame(
        [
            (1, "UK", "2020-01-01", 2),
            (2, "UK", "2021-01-01", 3),
            (3, "UK", "2022-01-01", None),
            (7, "FR", "2020-06-01", None),
        ],
        "id int, country string, date_entered string, new_version int",
    ).withColumn("date_entered", F.col("date_entered").cast("date"))


def test_latest_versions_resolves_chains(spark):
    got = {
        r["id"]: r["latest_id"] for r in latest_versions(_isolates(spark)).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 7: 7}


def test_long_chain_log_rounds(spark):
    # chain of 40 versions: resolves within the 20-round doubling cap
    rows = [(i, i + 1 if i < 40 else None) for i in range(1, 41)]
    iso = spark.createDataFrame(rows, "id int, new_version int")
    got = {r["id"]: r["latest_id"] for r in latest_versions(iso).collect()}
    assert set(got.values()) == {40}


def test_create_new_versions(spark):
    pairs = spark.createDataFrame([(3, 10), (7, 11)], "old_id int, new_id int")
    out = create_new_versions(_isolates(spark), pairs, "2026-08-14")
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 6
    assert rows[3]["new_version"] == 10
    assert rows[10]["new_version"] is None
    assert rows[10]["country"] == "UK"
    assert str(rows[10]["date_entered"]) == "2026-08-14"
    assert rows[7]["new_version"] == 11 and rows[11]["country"] == "FR"
    # untouched chain intact
    assert rows[1]["new_version"] == 2
    # latest-only view after the update: the fresh clones + nothing else
    latest = {r["id"] for r in out.filter(F.col("new_version").isNull()).collect()}
    assert latest == {10, 11}


def test_version_history(spark):
    hist = version_history(_isolates(spark)).collect()
    chains = {}
    for r in hist:
        chains.setdefault(r["latest_id"], []).append((r["version"], r["id"]))
    assert sorted(chains[3]) == [(1, 1), (2, 2), (3, 3)]
    assert chains[7] == [(1, 7)]


def test_create_new_versions_rejects_superseded(spark):
    import pytest

    pairs = spark.createDataFrame([(2, 10)], "old_id int, new_id int")
    with pytest.raises(ValueError, match="already superseded"):
        create_new_versions(_isolates(spark), pairs, "2026-08-14")


def test_version_history_nonmonotonic_ids(spark):
    """A curator reusing a lower id for a newer version: history must
    rank by chain distance, not id order."""
    import pyspark.sql.functions as F

    iso = spark.createDataFrame(
        [(3, 1), (1, None)], "id int, new_version int"
    )  # 3 is the OLD record, its successor got id 1
    hist = version_history(iso).collect()
    got = sorted((r["version"], r["id"]) for r in hist)
    assert got == [(1, 3), (2, 1)]  # oldest first regardless of id


def test_create_new_versions_rejects_used_new_id(spark):
    """Regression (ADVICE r3): a new_id colliding with an existing
    record id must raise, not silently duplicate the id."""
    import pytest

    pairs = spark.createDataFrame([(3, 7)], "old_id int, new_id int")
    with pytest.raises(ValueError, match="already in use"):
        create_new_versions(_isolates(spark), pairs, "2026-08-14")


def test_create_new_versions_rejects_duplicate_new_id(spark):
    import pytest

    pairs = spark.createDataFrame(
        [(3, 10), (7, 10)], "old_id int, new_id int"
    )
    with pytest.raises(ValueError, match="duplicate new_id"):
        create_new_versions(_isolates(spark), pairs, "2026-08-14")
