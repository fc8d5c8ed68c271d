"""Export / SequenceExport semantics: wide dataset export with sorted
multi-designations, concatenated sequences, XMFA blocks."""

from __future__ import annotations

from bigsdb_spark.operators.export_dataset import (
    concatenated_sequences,
    dataset_export,
    to_xmfa,
)


def _frames(spark):
    isolates = spark.createDataFrame(
        [(1, "France", 2020), (2, "Kenya", 2021)],
        "isolate_id int, country string, year int",
    )
    desig = spark.createDataFrame(
        [
            (1, "abcZ", "10"),
            (1, "abcZ", "2"),  # multi-designation: numeric sort -> 2;10
            (1, "adk", "B1"),
            (1, "adk", "A2"),  # non-integer ids: lexical sort -> A2;B1
            (2, "abcZ", "7"),
            (2, "fumC", "0"),  # missing designation
        ],
        "isolate_id int, locus string, allele_id string",
    )
    alleles = spark.createDataFrame(
        [
            ("abcZ", "2", "AAAA"),
            ("abcZ", "7", "CCCC"),
            ("abcZ", "10", "GGGG"),
            ("adk", "A2", "TTTT"),
            ("fumC", "1", "ACGT"),
        ],
        "locus string, allele_id string, sequence string",
    )
    return isolates, desig, alleles


def test_dataset_export_wide(spark):
    isolates, desig, _ = _frames(spark)
    cache = spark.createDataFrame(
        [(1, "ST-11")], "isolate_id int, ST string"
    )
    got = {
        r["isolate_id"]: r
        for r in dataset_export(
            isolates,
            ["country", "year"],
            designations=desig,
            loci=["abcZ", "adk", "fumC"],
            scheme_cache=cache,
            scheme_fields=["ST"],
        ).collect()
    }
    r1 = got[1]
    assert r1["country"] == "France"
    assert r1["abcZ"] == "2;10"  # numeric multi-designation sort
    assert r1["adk"] == "A2;B1"  # lexical sort for non-integer ids
    assert r1["fumC"] == "" and r1["ST"] == "ST-11"  # blank cell, as the reference prints
    r2 = got[2]
    assert r2["abcZ"] == "7" and r2["ST"] is None


def test_concatenated_sequences_order_and_placeholder(spark):
    _, desig, alleles = _frames(spark)
    got = {
        r["isolate_id"]: r["sequence"]
        for r in concatenated_sequences(
            desig, alleles, ["abcZ", "adk", "fumC"]
        ).collect()
    }
    # isolate 1: abcZ multi-designation -> one of the designated alleles'
    # sequences is used per locus slot; adk = TTTT or N (B1 unknown), fumC
    # undesignated -> N. abcZ slot takes one matched designation row.
    assert got[2] == "CCCC" + "N" + "N"  # abcZ=7, adk absent, fumC='0'
    assert got[1].endswith("N")  # fumC undesignated -> placeholder


def test_xmfa_blocks(spark):
    _, desig, alleles = _frames(spark)
    one = desig.filter("allele_id in ('2','7','0') or locus='adk'")
    out = to_xmfa(
        one.filter("allele_id in ('2','7','0')"),
        alleles,
        ["abcZ", "fumC"],
    )
    lines = out.splitlines()
    # block 1: abcZ, offsets 1-4 for both isolates
    assert lines[0] == ">1:1-4 + abcZ" and lines[1] == "AAAA"
    assert lines[2] == ">2:1-4 + abcZ" and lines[3] == "CCCC"
    assert lines[4] == "="
    # block 2: fumC starts after abcZ (cumulative offset 5)
    assert lines[5] == ">1:5-5 + fumC" and lines[6] == "N"
    assert lines[7] == ">2:5-5 + fumC" and lines[8] == "N"
    assert lines[9] == "="


def test_xmfa_wraps_long_sequences(spark):
    desig = spark.createDataFrame(
        [(1, "L", "1")], "isolate_id int, locus string, allele_id string"
    )
    alleles = spark.createDataFrame(
        [("L", "1", "A" * 130)], "locus string, allele_id string, sequence string"
    )
    lines = to_xmfa(desig, alleles, ["L"]).splitlines()
    assert lines[0] == ">1:1-130 + L"
    assert lines[1] == "A" * 60 and lines[2] == "A" * 60 and lines[3] == "A" * 10


def test_concatenated_sequences_single_segment_per_locus(spark):
    """Regression: a multi-designated locus contributes exactly ONE
    segment (the lowest allele id), like the reference's single
    get_profile_allele_designation lookup."""
    desig = spark.createDataFrame(
        [(1, "abcZ", "10"), (1, "abcZ", "2")],
        "isolate_id int, locus string, allele_id string",
    )
    alleles = spark.createDataFrame(
        [("abcZ", "2", "AAAA"), ("abcZ", "10", "GGGG")],
        "locus string, allele_id string, sequence string",
    )
    got = concatenated_sequences(desig, alleles, ["abcZ"]).collect()
    assert len(got) == 1 and got[0]["sequence"] == "AAAA"  # numeric min: 2


def test_xmfa_per_record_offsets(spark):
    """Regression: header end offsets are per-record (the reference
    recomputes $end per sequence), so an 'N' placeholder row claims
    1-1, not the block maximum."""
    desig = spark.createDataFrame(
        [(1, "L", "1"), (2, "L", "0")],
        "isolate_id int, locus string, allele_id string",
    )
    alleles = spark.createDataFrame(
        [("L", "1", "ACGT")], "locus string, allele_id string, sequence string"
    )
    lines = to_xmfa(desig, alleles, ["L"]).splitlines()
    assert lines[0] == ">1:1-4 + L" and lines[1] == "ACGT"
    assert lines[2] == ">2:1-1 + L" and lines[3] == "N"


def test_isolate_json_bundles(spark):
    import json

    from bigsdb_spark.operators.export_dataset import isolate_json_bundles

    iso = spark.createDataFrame(
        [(1, "France", 2020), (2, "Spain", None)],
        "id int, country string, year int",
    )
    des = spark.createDataFrame(
        [(1, "abcZ", "10"), (1, "abcZ", "2"), (1, "adk", "1")],
        "isolate_id int, locus string, allele_id string",
    )
    cache = spark.createDataFrame([(1, "11")], "id int, ST string")
    ar = spark.createDataFrame(
        [(1, "Kleborate", '{"fields":[{"ST":258}]}')],
        "isolate_id int, name string, results string",
    )
    rows = isolate_json_bundles(
        iso, ["country", "year"],
        designations=des, scheme_cache=cache, scheme_fields=["ST"],
        analysis_results=ar,
    ).collect()
    b1 = json.loads(rows[0]["json"])
    assert b1["provenance"] == {"country": "France", "year": 2020}
    # numeric-aware multi-designation sort: 2 before 10 (Export.pm:1159)
    assert b1["allele_designations"] == {"abcZ": ["2", "10"], "adk": ["1"]}
    assert b1["schemes"] == {"ST": "11"}
    assert json.loads(b1["analysis"]["Kleborate"]) == {"fields": [{"ST": 258}]}
    b2 = json.loads(rows[1]["json"])
    # NULL year omitted by to_json; absent joins omitted entirely
    assert b2["provenance"] == {"country": "Spain"}
    assert "allele_designations" not in b2
