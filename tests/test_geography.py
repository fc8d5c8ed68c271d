"""Geography point lookup (Datastore.pm lookup_geography_point /
sql/isolatedb_geocoding.sql) and bbox reverse containment."""

from __future__ import annotations

import pytest

from bigsdb_spark.functions.geography import (
    lookup_geography_points,
    reverse_geocode_bbox,
)


@pytest.fixture(scope="module")
def lookup(spark):
    # geography_point_lookup: UNIQUE (country_code, field, value)
    return spark.createDataFrame(
        [
            ("FR", "town", "Paris", 48.8566, 2.3522),
            ("FR", "town", "PARIS", 48.9, 2.4),  # case-variant row
            ("KE", "town", "Nairobi", -1.2921, 36.8219),
            ("FR", "region", "Normandie", 49.0, 0.1),
        ],
        "country_code string, field string, value string, "
        "latitude double, longitude double",
    )


def test_lookup_exact_beats_case_insensitive(spark, lookup):
    isolates = spark.createDataFrame(
        [
            (1, "France", "Paris"),     # exact match
            (2, "France", "paris"),     # ci only -> deterministic winner
            (3, "Kenya", "NAIROBI"),    # ci
            (4, "France", "Lyon"),      # no match -> NULLs
            (5, "Unknown", "Paris"),    # country not in iso2 map
        ],
        "id int, country string, town string",
    )
    got = {
        r.id: (r.latitude, r.longitude)
        for r in lookup_geography_points(
            isolates, lookup, "town",
            iso2={"France": "FR", "Kenya": "KE"},
        ).collect()
    }
    assert got[1] == (48.8566, 2.3522)  # exact, not the PARIS variant
    # ci tier deduplicates to the lexicographically first value (PARIS)
    assert got[2] == (48.9, 2.4)
    assert got[3] == (-1.2921, 36.8219)
    assert got[4] == (None, None)
    assert got[5] == (None, None)


def test_lookup_filters_by_field(spark, lookup):
    isolates = spark.createDataFrame(
        [(1, "FR", "Normandie")], "id int, country string, town string"
    )
    # 'town' lookup must not see the 'region' row
    got = lookup_geography_points(isolates, lookup, "town").collect()[0]
    assert got.latitude is None


def test_reverse_geocode_smallest_box_wins(spark):
    points = spark.createDataFrame(
        [(1, 48.85, 2.35), (2, -1.29, 36.82), (3, 80.0, 170.0)],
        "id int, latitude double, longitude double",
    )
    boxes = spark.createDataFrame(
        [
            ("Europe", 35.0, 70.0, -10.0, 40.0),
            ("France", 41.0, 51.0, -5.0, 10.0),  # nested, smaller
            ("Kenya", -5.0, 5.0, 33.0, 42.0),
        ],
        "region string, min_lat double, max_lat double, "
        "min_lon double, max_lon double",
    )
    got = {
        r.id: r.region
        for r in reverse_geocode_bbox(points, boxes, "id").collect()
    }
    assert got[1] == "France"  # both contain it; smaller area wins
    assert got[2] == "Kenya"
    assert got[3] is None


def test_reverse_geocode_broadcasts_boxes(spark):
    points = spark.createDataFrame(
        [(1, 48.85, 2.35)], "id int, latitude double, longitude double"
    )
    boxes = spark.createDataFrame(
        [("France", 41.0, 51.0, -5.0, 10.0)],
        "region string, min_lat double, max_lat double, "
        "min_lon double, max_lon double",
    )
    plan = reverse_geocode_bbox(points, boxes, "id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
