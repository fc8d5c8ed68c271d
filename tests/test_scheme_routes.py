"""Remaining scheme REST routes (plans/rest.py): list, breakdown,
field record, and the POST sequence/designation scheme queries."""

from __future__ import annotations

import pytest

from bigsdb_spark.plans.rest import (
    BadRequest,
    NotFound,
    route_scheme_designations_query,
    route_scheme_field_record,
    route_scheme_sequence_query,
    route_schemes_breakdown,
    route_schemes_list,
)

BASE = "http://x/db/seqdef"


def test_schemes_list():
    got = route_schemes_list([(1, "MLST"), (3, "cgMLST")], BASE)
    assert got["records"] == 2
    assert got["schemes"][0] == {
        "scheme": f"{BASE}/schemes/1", "description": "MLST",
    }


def test_schemes_breakdown_whitelist_and_counts(spark):
    profiles = spark.createDataFrame(
        [
            ("2024-01-01", 1), ("2024-01-01", 1), ("2024-02-01", 3),
        ],
        "date_entered string, scheme_id int",
    )
    schemes = spark.createDataFrame(
        [(1, "MLST"), (3, "cgMLST")], "id int, name string"
    )
    got = route_schemes_breakdown(profiles, schemes, "date_entered")
    assert {
        (r["date_entered"], r["scheme_id"], r["name"], r["count"])
        for r in got
    } == {("2024-01-01", 1, "MLST", 2), ("2024-02-01", 3, "cgMLST", 1)}
    with pytest.raises(BadRequest, match="Invalid field"):
        route_schemes_breakdown(profiles, schemes, "scheme_id; DROP")


def test_scheme_field_record_shape():
    got = route_scheme_field_record(
        {"field": "ST", "type": "integer", "primary_key": 1,
         "description": None, "dropdown": 0}
    )
    assert got == {
        "field": "ST", "type": "integer",
        "primary_key": True, "index": False, "dropdown": False,
    }
    with pytest.raises(NotFound):
        route_scheme_field_record(None)


@pytest.fixture()
def scheme_frames(spark):
    alleles = spark.createDataFrame(
        [
            ("abcZ", "1", "ACGTACGTACGT"),
            ("abcZ", "2", "TTGTACGTACGA"),
            ("adk", "1", "CCCCGGGGAAAA"),
        ],
        "locus string, allele_id string, sequence string",
    )
    profiles = spark.createDataFrame(
        [("17", ["1", "1"]), ("42", ["2", "1"])],
        "st string, profile array<string>",
    )
    return alleles, profiles


def test_scheme_sequence_query_resolves_st(spark, scheme_frames):
    alleles, profiles = scheme_frames
    body = {"sequence": ">c1\nACGTACGTACGT\n>c2\nCCCCGGGGAAAA\n"}
    got = route_scheme_sequence_query(
        spark, body, alleles, ["abcZ", "adk"], profiles, BASE
    )
    assert got["exact_matches"]["abcZ"] == [
        {"allele_id": "1", "href": f"{BASE}/loci/abcZ/alleles/1"}
    ]
    assert got["fields"] == {"ST": "17"}
    # one locus only: exact matches but NO fields
    partial = route_scheme_sequence_query(
        spark, {"sequence": "ACGTACGTACGT"}, alleles, ["abcZ", "adk"],
        profiles, BASE,
    )
    assert "fields" not in partial and "abcZ" in partial["exact_matches"]
    with pytest.raises(BadRequest, match="Required field missing"):
        route_scheme_sequence_query(
            spark, {}, alleles, ["abcZ", "adk"], profiles, BASE
        )


def test_scheme_designations_query(spark, scheme_frames):
    _, profiles = scheme_frames
    got = route_scheme_designations_query(
        spark, {"designations": {"abcZ": "2", "adk": "1"}},
        ["abcZ", "adk"], profiles,
    )
    assert got == {"fields": {"ST": "42"}}
    # unknown combination: empty result, not an error
    assert route_scheme_designations_query(
        spark, {"designations": {"abcZ": "9", "adk": "9"}},
        ["abcZ", "adk"], profiles,
    ) == {}
    with pytest.raises(BadRequest, match="Required field missing"):
        route_scheme_designations_query(spark, {}, ["abcZ"], profiles)


def test_lincode_nicknames_route(spark):
    from bigsdb_spark.plans.rest import route_lincode_nicknames

    prefixes = spark.createDataFrame(
        [
            (1, "3_1", "name", "ST-17 cluster", "2024-03-01"),
            (1, "2", "name", "lineage 2", "2024-01-01"),
            (9, "5", "name", "other scheme", "2024-02-01"),
        ],
        "scheme_id int, prefix string, field string, value string, datestamp string",
    )
    got = route_lincode_nicknames(prefixes, 1, BASE)
    assert got["records"] == 2
    assert got["last_updated"] == "2024-03-01"
    assert [n["prefix"] for n in got["nicknames"]] == ["2", "3_1"]
    assert got["nicknames"][0]["nickname"] == "lineage 2"
    with pytest.raises(NotFound, match="does not have a LIN code scheme"):
        route_lincode_nicknames(prefixes, 2, BASE, has_lincode_scheme=False)
