"""Client-database count/breakdown queries (operators/clientdb.py) vs
ClientDB.pm semantics: public-current universe, DISTINCT counting,
frequency ordering, array-prefix LIN matching."""

import pytest

from bigsdb_spark.operators.clientdb import (
    allele_field_breakdown,
    count_isolates_in_classification_group,
    count_isolates_with_allele,
    count_isolates_with_lincode_prefix,
    count_matching_profiles_by_pk,
    isolates_with_allele_per_allele,
)


@pytest.fixture()
def clientdb(spark):
    view = spark.createDataFrame(
        [(1, "UK"), (2, "UK"), (3, "FR"), (4, "FR")], "id int, country string"
    )
    private = spark.createDataFrame([(4,)], "isolate_id int")
    des = spark.createDataFrame(
        [
            (1, "abcZ", "7"),
            (1, "abcZ", "7"),   # double designation: DISTINCT isolates
            (2, "abcZ", "7"),
            (3, "abcZ", "8"),
            (4, "abcZ", "7"),   # private: excluded
        ],
        "isolate_id int, locus string, allele_id string",
    )
    cache = spark.createDataFrame(
        [(1, "11"), (2, "11"), (3, "12"), (4, "11")], "id int, ST string"
    )
    return view, private, des, cache


def test_count_isolates_with_allele(spark, clientdb):
    view, private, des, _ = clientdb
    assert count_isolates_with_allele(des, view, private, "abcZ", "7") == 2
    assert count_isolates_with_allele(des, view, None, "abcZ", "7") == 3


def test_per_allele_batch_counts(spark, clientdb):
    view, private, des, _ = clientdb
    got = {
        (r["locus"], r["allele_id"]): r["n_isolates"]
        for r in isolates_with_allele_per_allele(des, view, private).collect()
    }
    assert got == {("abcZ", "7"): 2, ("abcZ", "8"): 1}


def test_count_matching_profiles_by_pk(spark, clientdb):
    view, private, _, cache = clientdb
    assert count_matching_profiles_by_pk(cache, view, private, "ST", "11") == 2


def test_allele_field_breakdown(spark, clientdb):
    view, private, des, _ = clientdb
    rows = [
        (r["country"], r["frequency"])
        for r in allele_field_breakdown(
            des, view, "country", "abcZ", "7", private=private
        ).collect()
    ]
    # the private isolate 4 (FR) must NOT leak into the public table
    assert rows == [("UK", 2)]
    # without a private table the view is the universe
    rows_all = [
        (r["country"], r["frequency"])
        for r in allele_field_breakdown(des, view, "country", "abcZ", "7").collect()
    ]
    assert rows_all == [("UK", 2), ("FR", 1)]


def test_classification_group_and_lincode_counts(spark, clientdb):
    view, private, _, cache = clientdb
    cgp = spark.createDataFrame(
        [(5, "11"), (5, "99")], "group_id int, profile_id string"
    )
    assert (
        count_isolates_in_classification_group(cache, cgp, view, private, 5) == 2
    )
    lincodes = spark.createDataFrame(
        [("11", [1, 2, 3]), ("12", [1, 9, 9])], "profile_id string, lincode array<int>"
    )
    assert (
        count_isolates_with_lincode_prefix(cache, lincodes, view, private, [1]) == 3
    )
    assert (
        count_isolates_with_lincode_prefix(cache, lincodes, view, private, [1, 2]) == 2
    )
