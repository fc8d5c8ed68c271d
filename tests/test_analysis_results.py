"""Analysis-results family: candidate selection, annotation runners,
JSONPath cache normalization, breakdowns, embargo lifecycle and the
profile/allele table exports.

Reference semantics pinned here:
- update_kleborate.pl:146-161 candidate query, :216-252 TSV->JSON
- sql/isolatedb.sql:2177-2213 normalize_analysis_jsonb
- DataExplorerPage.pm:969 value breakdown
- check_embargoes.pl:95-125 embargo publish sweep
- ProfileExport.pm:180-280 / SeqTableExport.pm:100-127 exports
"""

import datetime as dt
import json
import sys

import pytest
import pyspark.sql.functions as F

from bigsdb_spark.operators.analysis import (
    analysis_field_breakdown,
    annotation_candidates,
    assembly_stats_analysis,
    normalize_analysis_json,
    run_annotation_tool,
)
from bigsdb_spark.sources.sinks import allele_table_frame, profile_export_frame
from bigsdb_spark.views import publish_embargoed


TODAY = dt.date(2026, 8, 14)


@pytest.mark.slow
def test_annotation_candidates_staleness(spark):
    ss = spark.createDataFrame(
        [(1, 2_500_000), (2, 900_000), (3, 2_500_000), (4, 2_500_000), (5, 2_500_000)],
        "isolate_id long, total_length long",
    )
    ar = spark.createDataFrame(
        [
            (3, "Kleborate", dt.date(2026, 8, 1)),   # fresh
            (4, "Kleborate", dt.date(2025, 1, 1)),   # stale
            (1, "Kaptive", dt.date(2020, 1, 1)),     # other tool: ignored
        ],
        "isolate_id long, name string, datestamp date",
    )
    lr = spark.createDataFrame(
        [(5, "Kleborate", dt.date(2026, 8, 13))],    # tried yesterday
        "isolate_id long, name string, timestamp date",
    )
    # no refresh: only missing results count; recent attempts excluded
    got = annotation_candidates(ss, ar, lr, "Kleborate", 1_000_000, TODAY)
    assert [r[0] for r in got.collect()] == [1]
    # refresh_days brings stale id-4 back; last_run_days re-admits id-5
    got = annotation_candidates(
        ss, ar, lr, "Kleborate", 1_000_000, TODAY, refresh_days=90, last_run_days=0
    )
    assert [r[0] for r in got.collect()] == [1, 4, 5]


def test_run_annotation_tool_contract(spark):
    contigs = spark.createDataFrame(
        [(1, "ACGT"), (1, "GGCC"), (2, "AAAA")],
        "isolate_id long, sequence string",
    )
    # a deterministic stand-in tool: emits a 2-line TSV with the
    # reference's placeholder values mixed in (update_kleborate.pl:238-247)
    tool = [
        sys.executable,
        "-c",
        (
            "import sys; data=sys.stdin.read();"
            "n=data.count('>');"
            "print('ST\\tK_locus\\tcontigs\\tO_locus');"
            "print('\\t'.join(['258','-',str(n),'Not Tested']))"
        ),
    ]
    rows = {
        r["isolate_id"]: json.loads(r["results"])
        for r in run_annotation_tool(contigs, tool, "Kleborate", "v2.3").collect()
    }
    assert rows[1] == {"version": "v2.3", "fields": [{"ST": 258}, {"contigs": 2}]}
    assert rows[2]["fields"] == [{"ST": 258}, {"contigs": 1}]


def test_assembly_stats_analysis_values(spark):
    contigs = spark.createDataFrame(
        [(1, "GGGGCCCCAA"), (1, "ATATAT")], "isolate_id long, sequence string"
    )
    row = assembly_stats_analysis(contigs).collect()[0]
    assert row["name"] == "AssemblyStats"
    payload = json.loads(row["results"])
    assert payload["fields"] == {
        "contigs": 2,
        "total_length": 16,
        "max_contig": 10,
        "gc_percent": 50.0,
    }


@pytest.fixture()
def analysis_tables(spark):
    results = spark.createDataFrame(
        [
            (1, "Kleborate",
             '{"version":"v2","fields":[{"ST":"258"},{"K_locus":"KL106"},{"score":3}]}'),
            (2, "Kleborate", '{"version":"v2","fields":[{"ST":"11"}]}'),
            (1, "AssemblyStats",
             '{"version":"a1","fields":{"contigs":42,"gc_percent":51.2}}'),
            (3, "Kleborate", '{"version":"v2","fields":[{"K_locus":"KL1"}]}'),
        ],
        "isolate_id long, name string, results string",
    )
    fields = spark.createDataFrame(
        [
            ("Kleborate", "$.fields[*].ST"),
            ("Kleborate", "$.fields[*].K_locus"),
            ("AssemblyStats", "$.fields.contigs"),
            ("AssemblyStats", "$.fields.absent"),
        ],
        "analysis_name string, json_path string",
    )
    return results, fields


def test_normalize_analysis_json(spark, analysis_tables):
    results, fields = analysis_tables
    cache = normalize_analysis_json(results, fields)
    got = {
        (r["isolate_id"], r["analysis_name"], r["json_path"], r["value"])
        for r in cache.collect()
    }
    assert got == {
        (1, "Kleborate", "$.fields[*].ST", "258"),
        (1, "Kleborate", "$.fields[*].K_locus", "KL106"),
        (2, "Kleborate", "$.fields[*].ST", "11"),
        (3, "Kleborate", "$.fields[*].K_locus", "KL1"),
        (1, "AssemblyStats", "$.fields.contigs", "42"),
    }


def test_normalize_multi_match_wildcard(spark):
    """A wildcard path matching several values emits one cache row per
    value — the no-PK multi-value case the reference comments on at
    isolatedb.sql:2166."""
    results = spark.createDataFrame(
        [(7, "T", '{"fields":[{"gene":"blaKPC"},{"gene":"blaOXA"}]}')],
        "isolate_id long, name string, results string",
    )
    fields = spark.createDataFrame(
        [("T", "$.fields[*].gene")], "analysis_name string, json_path string"
    )
    vals = sorted(
        r["value"] for r in normalize_analysis_json(results, fields).collect()
    )
    assert vals == ["blaKPC", "blaOXA"]


def test_analysis_field_breakdown(spark, analysis_tables):
    results, fields = analysis_tables
    cache = normalize_analysis_json(results, fields)
    view = spark.createDataFrame([(1,), (2,), (3,), (4,)], "id long")
    got = {
        (r["label"], r["count"])
        for r in analysis_field_breakdown(view, cache, "Kleborate", "$.fields[*].ST").collect()
    }
    # 3 and 4 have no cached ST -> 'No value'
    assert got == {("258", 1), ("11", 1), ("No value", 2)}


def test_publish_embargoed(spark):
    priv = spark.createDataFrame(
        [
            (1, 10, dt.date(2026, 8, 1)),    # due
            (2, 10, dt.date(2026, 8, 14)),   # due today (<=)
            (3, 11, None),                    # private forever
            (4, 11, dt.date(2027, 1, 1)),    # future
        ],
        "isolate_id long, owner_id long, embargo_date date",
    )
    out = publish_embargoed(priv, "2026-08-14")
    assert [r["isolate_id"] for r in out["published"].collect()] == [1, 2]
    assert sorted(r["isolate_id"] for r in out["remaining_private"].collect()) == [3, 4]
    hist = out["history"].collect()
    assert len(hist) == 2
    assert all(
        r["action"] == "Record made public (embargo date reached)"
        and r["curator"] == 0
        and r["embargo"] is None
        for r in hist
    )


def test_profile_export_frame(spark):
    profiles = spark.createDataFrame(
        [("1", ["1", "2", "3"], "clonal"), ("2", ["1", "2", "4"], None)],
        "profile_key string, profile array<string>, species string",
    )
    cg = spark.createDataFrame(
        [("cgST_group", 5, "1")], "cg_name string, group_id int, profile_id string"
    )
    lincodes = spark.createDataFrame(
        [("1", [1, 2, 0]), ("2", [1, 3, 4])], "profile_id string, lincode array<int>"
    )
    prefixes = spark.createDataFrame(
        [("1_2", "lineage", "L2"), ("1", "sublineage", "S9"), ("1", "sublineage", "S10")],
        "prefix string, field string, value string",
    )
    out = profile_export_frame(
        profiles,
        loci=["abcZ", "adk", "aroE"],
        field_cols=["species"],
        class_groups=cg,
        lincodes=lincodes,
        lincode_prefixes=prefixes,
    )
    assert out.columns == [
        "profile_key", "abcZ", "adk", "aroE", "species",
        "cgST_group", "LINcode", "lineage", "sublineage",
    ]
    r1, r2 = out.collect()
    assert (r1["abcZ"], r1["aroE"]) == ("1", "3")
    assert r1["cgST_group"] == 5 and r2["cgST_group"] is None
    assert r1["LINcode"] == "1_2_0" and r2["LINcode"] == "1_3_4"
    # prefix 1_2 matches 1_2_0 only at the _ boundary; prefix 1 matches both
    assert r1["lineage"] == "L2" and r2["lineage"] is None
    # string-typed field: distinct values string-sorted, '; '-joined
    assert r1["sublineage"] == "S10; S9" and r2["sublineage"] == "S10; S9"


def test_profile_export_lincode_int_sort(spark):
    """Integer-typed prefix fields sort numerically (9 before 10) —
    ProfileExport.pm:361-364's CAST(value AS integer) ORDER BY."""
    profiles = spark.createDataFrame(
        [("1", ["1"])], "profile_key string, profile array<string>"
    )
    lincodes = spark.createDataFrame(
        [("1", [1])], "profile_id string, lincode array<int>"
    )
    prefixes = spark.createDataFrame(
        [("1", "rank", "10"), ("1", "rank", "9")],
        "prefix string, field string, value string",
    )
    out = profile_export_frame(
        profiles, loci=["abcZ"], lincodes=lincodes, lincode_prefixes=prefixes,
        lincode_field_types={"rank": "integer"},
    ).collect()[0]
    assert out["rank"] == "9; 10"


def test_allele_table_frame(spark):
    seqs = spark.createDataFrame(
        [("abcZ", "1", "ACGT", "confirmed"), ("abcZ", "2", "ACGTT", "provisional")],
        "locus string, allele_id string, sequence string, status string",
    )
    ext = spark.createDataFrame(
        [("abcZ", "1", "mutation", "K76T")],
        "locus string, allele_id string, attribute string, value string",
    )
    flags = spark.createDataFrame(
        [("abcZ", "2", "atypical"), ("abcZ", "2", "ambiguous read")],
        "locus string, allele_id string, flag string",
    )
    refs = spark.createDataFrame(
        [("abcZ", "1", 31231345), ("abcZ", "1", 12345)],
        "locus string, allele_id string, pubmed_id long",
    )
    rows = allele_table_frame(seqs, ext, flags, refs).collect()
    r1, r2 = rows
    assert r1["length"] == 4 and r2["length"] == 5
    assert r1["mutation"] == "K76T" and r2["mutation"] is None
    assert r1["PubMed"] == "12345; 31231345"
    assert r2["flags"] == "ambiguous read atypical"


def test_run_annotation_tool_failure_isolation(spark):
    """One genome whose tool run fails must not abort the job: it
    yields a NULL-results row with the error, and every attempted
    genome appears (the last_run log contract)."""
    contigs = spark.createDataFrame(
        [(1, "ACGT"), (2, "FAIL")], "isolate_id long, sequence string"
    )
    tool = [
        sys.executable,
        "-c",
        (
            "import sys; d=sys.stdin.read();\n"
            "if 'FAIL' in d: sys.exit(3)\n"
            "print('contigs'); print(d.count('>'))"
        ),
    ]
    rows = {r["isolate_id"]: r for r in run_annotation_tool(contigs, tool, "T", "v1").collect()}
    assert set(rows) == {1, 2}
    assert json.loads(rows[1]["results"])["fields"] == [{"contigs": 1}]
    assert rows[1]["err"] is None
    assert rows[2]["results"] is None and "3" in rows[2]["err"]
