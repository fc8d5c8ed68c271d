"""P1-P5 semantics on a hand-built isolates fixture (FIXTURES.md):
case-insensitive matching, the literal 'null', null-inclusive NOT, and
array (multi-value field) operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigsdb_spark.predicates import build_predicate


@pytest.fixture(scope="module")
def isolates(spark):
    rows = [
        # id, country, year, serogroup
        (1, "France", 2010, ["B", "C"]),
        (2, "FRANCE", None, ["B"]),
        (3, "UK [England]", 2020, []),
        (4, None, 2015, None),
        (5, "Germany", 2005, ["W", "Y"]),
    ]
    return spark.createDataFrame(
        rows, "id int, country string, year int, serogroup array<string>"
    )


def ids(df):
    return sorted(r.id for r in df.collect())


def test_ci_equality(isolates):
    got = isolates.filter(build_predicate(F.col("country"), "=", "france"))
    assert ids(got) == [1, 2]


def test_null_keyword(isolates):
    got = isolates.filter(build_predicate(F.col("country"), "=", "null"))
    assert ids(got) == [4]


def test_null_inclusive_not(isolates):
    """BIGSdb NOT keeps NULL rows (IsolateQueryPage.pm:2329-2332) —
    SQL 3VL would drop id=4."""
    got = isolates.filter(build_predicate(F.col("country"), "NOT", "france"))
    assert ids(got) == [3, 4, 5]


def test_not_contain_null_inclusive(isolates):
    got = isolates.filter(build_predicate(F.col("country"), "NOT contain", "an"))
    assert ids(got) == [4]  # France/FRANCE/England/Germany all contain 'an'


def test_contains_case_insensitive(isolates):
    got = isolates.filter(build_predicate(F.col("country"), "contains", "ENGLAND"))
    assert ids(got) == [3]


def test_starts_ends(isolates):
    assert ids(isolates.filter(build_predicate(F.col("country"), "starts with", "uk"))) == [3]
    assert ids(isolates.filter(build_predicate(F.col("country"), "ends with", "MANY"))) == [5]


def test_ordered_compare(isolates):
    got = isolates.filter(build_predicate(F.col("year"), ">=", 2015))
    assert ids(got) == [3, 4]


def test_array_equals_any(isolates):
    got = isolates.filter(build_predicate(F.col("serogroup"), "=", "b", is_array=True))
    assert ids(got) == [1, 2]


def test_array_not_null_inclusive(isolates):
    got = isolates.filter(build_predicate(F.col("serogroup"), "NOT", "B", is_array=True))
    # ids 3 (empty array -> no match), 4 (NULL array kept), 5
    assert ids(got) == [3, 4, 5]


def test_array_ordered_any(isolates):
    got = isolates.filter(build_predicate(F.col("serogroup"), ">", "V", is_array=True))
    assert ids(got) == [5]


def test_invalid_operator_rejected(isolates):
    with pytest.raises(ValueError):
        build_predicate(F.col("country"), "LIKE", "x")


def test_crosstab_wide(spark):
    """A2 wide form (groupBy().pivot() with explicit values): stable
    schema, zero-filled cells — gate-covered in long form by
    a2_crosstab_pct, pinned here in wide form."""
    from bigsdb_spark.operators.breakdown import crosstab_wide

    df = spark.createDataFrame(
        [("x", "a"), ("x", "a"), ("x", "b"), ("y", "b")], "f1 string, f2 string"
    )
    wide = crosstab_wide(df, "f1", "f2", values=["a", "b", "c"])
    got = {r.f1: (r.a, r.b, r.c) for r in wide.collect()}
    assert got == {"x": (2, 1, 0), "y": (0, 1, 0)}


def test_not_null_means_has_value(spark):
    """Regression: 'NOT null' must mean IS NOT NULL — routing it
    through null-inclusive NOT produced a tautology."""
    from bigsdb_spark.predicates import build_predicate
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "x", ["a"]), (2, None, None), (3, "y", [])],
        "id int, v string, arr array<string>",
    )
    got = [r.id for r in df.filter(build_predicate(F.col("v"), "NOT", "null")).collect()]
    assert sorted(got) == [1, 3]
    got_arr = [
        r.id
        for r in df.filter(
            build_predicate(F.col("arr"), "NOT", "null", is_array=True)
        ).collect()
    ]
    assert got_arr == [1]  # empty array = no value
    # '=' null on arrays: NULL or empty
    got_eq = [
        r.id
        for r in df.filter(
            build_predicate(F.col("arr"), "=", "null", is_array=True)
        ).collect()
    ]
    assert sorted(got_eq) == [2, 3]


def test_starts_ends_with_on_arrays(spark):
    from bigsdb_spark.predicates import build_predicate
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, ["B1", "C2"]), (2, ["X9"])], "id int, arr array<string>"
    )
    sw = [
        r.id
        for r in df.filter(
            build_predicate(F.col("arr"), "starts with", "b", is_array=True)
        ).collect()
    ]
    assert sw == [1]
    ew = [
        r.id
        for r in df.filter(
            build_predicate(F.col("arr"), "ends with", "9", is_array=True)
        ).collect()
    ]
    assert ew == [2]


def test_explore_hierarchy(spark):
    """DataExplorer drill-down tree: level counts sum descendants,
    NULLs bucket as 'No value' (DataExplorerPage.pm:79-157)."""
    from bigsdb_spark.operators.breakdown import explore_hierarchy

    df = spark.createDataFrame(
        [
            ("Europe", "UK"), ("Europe", "UK"), ("Europe", "FR"),
            ("Asia", "JP"), (None, None),
        ],
        "continent string, country string",
    )
    tree = explore_hierarchy(df, ["continent", "country"])
    assert tree["count"] == 5
    top = {n["value"]: n for n in tree["children"]}
    assert top["Europe"]["count"] == 3
    assert {c["value"]: c["count"] for c in top["Europe"]["children"]} == {
        "UK": 2, "FR": 1
    }
    assert top["No value"]["count"] == 1
    assert top["No value"]["children"][0]["value"] == "No value"
    # leaves carry no children key (reference leaves are childless)
    assert "children" not in top["Europe"]["children"][0]


def test_explore_hierarchy_bounded_driver_fold(spark):
    """VERDICT r3 #5: two high-cardinality fields must not collect an
    unbounded frequency table — the fold caps at max_rows highest-count
    combinations and flags the cut."""
    from bigsdb_spark.operators.breakdown import explore_hierarchy

    df = spark.range(500).select(
        (F.col("id") % 50).cast("string").alias("a"),
        F.col("id").cast("string").alias("b"),
    )  # 500 distinct (a, b) combinations, all count 1
    tree = explore_hierarchy(df, ["a", "b"], max_rows=100)
    assert tree["truncated"] is True
    kept = sum(
        len(n.get("children", [])) for n in tree["children"]
    )
    assert kept == 100  # exactly max_rows combinations kept
    assert tree["count"] == 100
    # an untruncated tree says so
    full = explore_hierarchy(df, ["a", "b"], max_rows=1000)
    assert full["truncated"] is False and full["count"] == 500


def test_explore_hierarchy_paged_reassembles_full_tree(spark):
    """VERDICT r4 task 7: a capped tree continues via the next_offset
    cursor instead of re-running — successive pages over the stable
    (count desc, fields asc) order, folded with merge_hierarchy, equal
    the unpaged tree exactly (counts, structure, and completion
    flag)."""
    from bigsdb_spark.operators.breakdown import (
        explore_hierarchy,
        merge_hierarchy,
    )

    df = spark.range(500).select(
        (F.col("id") % 7).cast("string").alias("a"),
        (F.col("id") % 30).cast("string").alias("b"),
    )  # 210 combinations with non-uniform counts (2 or 3 each)
    full = explore_hierarchy(df, ["a", "b"], max_rows=1000)
    assert full["truncated"] is False

    acc = explore_hierarchy(df, ["a", "b"], max_rows=64)
    assert acc["truncated"] is True and acc["next_offset"] == 64
    pages = 1
    while acc["truncated"]:
        page = explore_hierarchy(
            df, ["a", "b"], max_rows=64, offset=acc["next_offset"]
        )
        merge_hierarchy(acc, page)
        pages += 1
        assert pages < 10  # terminates

    def canon(node):
        out = {"count": node["count"]}
        if "children" in node:
            out["children"] = {
                (c["field"], c["value"]): canon(c) for c in node["children"]
            }
        return out

    assert pages == 4  # 210 combinations / 64 per page
    assert acc["count"] == full["count"] == 500
    assert acc["next_offset"] is None
    assert canon(acc) == canon(full)
