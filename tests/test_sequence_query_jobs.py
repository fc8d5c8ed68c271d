"""Sequence-query service path, alias matching, and job persistence."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigsdb_spark.jobs import JobService
from bigsdb_spark.predicates import match_with_aliases
from bigsdb_spark.sequence_query import sequence_query


def test_sequence_query_service(spark):
    alleles = spark.createDataFrame(
        [("abcZ", "1", "ACGT"), ("abcZ", "2", "AAAA"), ("adk", "1", "ACGT")],
        "locus string, allele_id string, sequence string",
    )
    designations = spark.createDataFrame(
        [(10, "abcZ", "1"), (11, "abcZ", "1"), (12, "abcZ", "2")],
        "isolate_id int, locus string, allele_id string",
    )
    scheme = spark.createDataFrame(
        [("1", ["1", "1"]), ("2", ["2", "1"])], "st string, profile array<string>"
    )
    out = sequence_query(
        spark,
        [("q1", "acgt")],
        alleles,
        designations=designations,
        scheme_profiles=scheme,
        scheme_loci=["abcZ", "adk"],
    )
    # exact match hits BOTH loci that share the sequence
    m = {(r.locus, r.allele_id) for r in out["matches"].collect()}
    assert m == {("abcZ", "1"), ("adk", "1")}
    isolates = {r.isolate_id for r in out["isolates"].collect()}
    assert isolates == {10, 11}
    sts = {(r.locus, r.st) for r in out["profiles"].collect()}
    assert sts == {("abcZ", "1"), ("adk", "1"), ("adk", "2")}


def test_alias_matching(spark):
    iso = spark.createDataFrame(
        [(1, "iso-one"), (2, "iso-two"), (3, "iso-three")], "id int, isolate string"
    )
    aliases = spark.createDataFrame(
        [(2, "STRAIN-X"), (3, "other")], "isolate_id int, alias string"
    )
    got = match_with_aliases(iso, aliases, "isolate", "id", "strain-x")
    assert [r.id for r in got.collect()] == [2]
    both = match_with_aliases(iso, aliases, "isolate", "id", "ISO-ONE")
    assert [r.id for r in both.collect()] == [1]


def test_job_persistence_restart(tmp_path):
    svc = JobService()
    a = svc.add_job("A", {"x": 1}, user="u1", priority=3)
    b = svc.add_job("B", {"y": 2}, user="u2", priority=1)
    started = svc.next_job()  # b (priority 1)
    assert started.job_id == b.job_id
    path = str(tmp_path / "jobs.json")
    svc.save(path)

    revived = JobService.load(path)
    # the in-flight job was requeued; priority order preserved
    nxt = revived.next_job()
    assert nxt.job_id == b.job_id
    assert revived.next_job().job_id == a.job_id
    # new ids continue after the highest persisted id
    c = revived.add_job("C", {}, user="u3")
    assert c.job_id > a.job_id


def test_sequence_query_partial_tier(spark):
    """Queries with no exact hit fall through to the partial tier and
    come back as closest matches with identity/mismatch records
    (SequenceQueryPage.pm:376-653, Blast.pm:196)."""
    from bigsdb_spark.sequence_query import sequence_query

    alleles = spark.createDataFrame(
        [("abcZ", "1", "ACGTACGTACGTACGTACGT")],
        "locus string, allele_id string, sequence string",
    )
    res = sequence_query(
        spark,
        [("q_exact", "ACGTACGTACGTACGTACGT"),
         ("q_near", "ACGTACGTACGTACGTACGA")],  # 1 mismatch
        alleles,
        partial=True,
    )
    assert {r.query_id for r in res["matches"].collect()} == {"q_exact"}
    partial = res["partial_matches"].collect()
    assert len(partial) == 1
    p = partial[0]
    assert p.query_id == "q_near" and p.allele_id == "1"
    assert p.mismatches == 1 and p.identity == 95.0
