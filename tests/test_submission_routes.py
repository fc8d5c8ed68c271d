"""REST submission routes (plans/submission_routes.py): the
Submissions.pm route table — list/create/get/delete, messages, files —
over the batch validation operators."""

from __future__ import annotations

import base64

import pytest

from bigsdb_spark.plans.rest import BadRequest, NotFound
from bigsdb_spark.plans.submission_routes import (
    Forbidden,
    SubmissionStore,
    TooManyRequests,
    route_submission_add_message,
    route_submission_create,
    route_submission_delete,
    route_submission_delete_file,
    route_submission_files,
    route_submission_get_file,
    route_submission_messages,
    route_submission_record,
    route_submission_upload_file,
    route_submissions_list,
)

BASE = "http://x/db/seqdef"
TODAY = "2026-08-14"


@pytest.fixture()
def store(tmp_path):
    return SubmissionStore(files_dir=str(tmp_path / "subs"))


@pytest.fixture()
def alleles(spark):
    return spark.createDataFrame(
        [("abcZ", "1", "ACGTACGTACGT"), ("abcZ", "2", "TTGTACGTACGA")],
        "locus string, allele_id string, sequence string",
    )


def _create_allele_sub(spark, store, alleles, user="alice", seqs=None):
    body = {
        "type": "alleles",
        "locus": "abcZ",
        "technology": "Sanger",
        "assembly": "de novo",
        "software": "SPAdes",
        "sequences": seqs or ">s1\nCCGTACGTACGG\n",
    }
    return route_submission_create(
        store, user, BASE, body, TODAY,
        spark=spark, existing_alleles=alleles,
    )


def test_create_and_get_allele_submission(spark, store, alleles):
    out = _create_allele_sub(spark, store, alleles)
    sid = out["submission"].rsplit("/", 1)[1]
    assert sid.startswith("BIGSdb_")
    rec = route_submission_record(store, "alice", sid, BASE)
    assert rec["type"] == "alleles" and rec["status"] == "pending"
    assert rec["locus"] == "abcZ" and rec["technology"] == "Sanger"
    assert rec["seqs"] == [
        {
            "seq_id": "s1",
            "sequence": "CCGTACGTACGG",
            "status": "pending",
            "assigned_id": None,
        }
    ]
    # the opening correspondence message is recorded (REST client note)
    assert "REST interface" in rec["correspondence"][0]["message"]


def test_create_rejects_invalid_payloads(spark, store, alleles):
    base = {
        "type": "alleles", "locus": "abcZ", "technology": "Sanger",
        "assembly": "a", "software": "s", "sequences": ">s1\nACGT\n",
    }
    with pytest.raises(BadRequest, match="Required field"):
        route_submission_create(
            store, "u", BASE, {k: v for k, v in base.items() if k != "locus"},
            TODAY, spark=spark, existing_alleles=alleles,
        )
    with pytest.raises(BadRequest, match="Invalid value for technology"):
        route_submission_create(
            store, "u", BASE, dict(base, technology="abacus"), TODAY,
            spark=spark, existing_alleles=alleles,
        )
    # Illumina requires read_length and coverage
    with pytest.raises(BadRequest, match="read_length must be provided"):
        route_submission_create(
            store, "u", BASE, dict(base, technology="Illumina"), TODAY,
            spark=spark, existing_alleles=alleles,
        )
    with pytest.raises(BadRequest, match="Invalid value for coverage"):
        route_submission_create(
            store, "u", BASE,
            dict(base, technology="Illumina", read_length="100-199",
                 coverage="heaps"),
            TODAY, spark=spark, existing_alleles=alleles,
        )
    # a sequence failing the batch allele check is the route's 400
    with pytest.raises(BadRequest, match="already been defined"):
        route_submission_create(
            store, "u", BASE, dict(base, sequences=">s1\nACGTACGTACGT\n"),
            TODAY, spark=spark, existing_alleles=alleles,
        )
    with pytest.raises(NotFound, match="not supported"):
        route_submission_create(
            store, "u", BASE, {"type": "isolates"}, TODAY, spark=spark,
        )


def test_headerless_fasta_and_type_check(spark, store, alleles):
    out = _create_allele_sub(spark, store, alleles, seqs="CCGTACGTACGG")
    sid = out["submission"].rsplit("/", 1)[1]
    rec = route_submission_record(store, "alice", sid, BASE)
    assert rec["seqs"][0]["seq_id"] == "seq"  # Submissions.pm:406


@pytest.mark.slow
def test_create_profile_submission(spark, store, alleles):
    ex_profiles = spark.createDataFrame(
        [("17", ["1", "1"])], "st string, profile array<string>"
    )
    pair_alleles = spark.createDataFrame(
        [("abcZ", "1"), ("abcZ", "2"), ("adk", "1")],
        "locus string, allele_id string",
    )
    body = {
        "type": "profiles",
        "scheme_id": 1,
        "profiles": [("r1", "abcZ", "2"), ("r1", "adk", "1")],
    }
    out = route_submission_create(
        store, "alice", BASE, body, TODAY, spark=spark,
        existing_alleles=pair_alleles, existing_profiles=ex_profiles,
        scheme_loci=["abcZ", "adk"],
    )
    sid = out["submission"].rsplit("/", 1)[1]
    rec = route_submission_record(store, "alice", sid, BASE)
    assert rec["scheme"] == f"{BASE}/schemes/1"
    assert rec["profiles"][0]["designations"] == ["2", "1"]
    with pytest.raises(BadRequest, match="Scheme id must be an integer"):
        route_submission_create(
            store, "alice", BASE, dict(body, scheme_id="one"), TODAY,
            spark=spark, existing_alleles=pair_alleles,
            scheme_loci=["abcZ", "adk"],
        )
    with pytest.raises(BadRequest, match="already been defined as ST-17"):
        route_submission_create(
            store, "alice", BASE,
            dict(body, profiles=[("r1", "abcZ", "1"), ("r1", "adk", "1")]),
            TODAY, spark=spark, existing_alleles=pair_alleles,
            existing_profiles=ex_profiles, scheme_loci=["abcZ", "adk"],
        )


def test_list_filters_owner_type_status(spark, store, alleles):
    _create_allele_sub(spark, store, alleles, user="alice")
    _create_allele_sub(spark, store, alleles, user="bob")
    got = route_submissions_list(store, "alice", BASE)
    assert got["records"] == 1 and len(got["submissions"]) == 1
    # status vocabulary is closed
    with pytest.raises(BadRequest, match="Invalid status value"):
        route_submissions_list(store, "alice", BASE, status="open")
    # type validated against the db flavor
    with pytest.raises(NotFound, match="not supported"):
        route_submissions_list(store, "alice", BASE, type="genomes")
    assert (
        route_submissions_list(store, "alice", BASE, status="closed")["records"]
        == 0
    )


def test_daily_quota_429(spark, store, alleles):
    store.daily_limit = 2
    _create_allele_sub(spark, store, alleles)
    _create_allele_sub(spark, store, alleles)
    with pytest.raises(TooManyRequests, match="too many separate submissions"):
        _create_allele_sub(spark, store, alleles)


def test_owner_and_delete_rules(spark, store, alleles):
    sid = _create_allele_sub(spark, store, alleles)["submission"].rsplit(
        "/", 1
    )[1]
    with pytest.raises(Forbidden, match="not the owner"):
        route_submission_record(store, "mallory", sid, BASE)
    with pytest.raises(Forbidden, match="cannot delete a pending"):
        route_submission_delete(store, "alice", sid)
    store.get(sid).status = "closed"
    assert route_submission_delete(store, "alice", sid) == {
        "message": "Submission deleted."
    }
    with pytest.raises(NotFound):
        route_submission_record(store, "alice", sid, BASE)


def test_messages_roundtrip(spark, store, alleles):
    sid = _create_allele_sub(spark, store, alleles)["submission"].rsplit(
        "/", 1
    )[1]
    route_submission_add_message(store, "alice", sid, "any news?", TODAY)
    msgs = route_submission_messages(store, "alice", sid, BASE)
    assert msgs[-1]["message"] == "any news?"
    assert msgs[-1]["user"] == f"{BASE}/users/alice"
    with pytest.raises(BadRequest, match="No message included"):
        route_submission_add_message(store, "alice", sid, "", TODAY)


def test_files_roundtrip_and_traversal_guard(spark, store, alleles):
    sid = _create_allele_sub(spark, store, alleles)["submission"].rsplit(
        "/", 1
    )[1]
    payload = base64.b64encode(b"contig data").decode()
    route_submission_upload_file(store, "alice", sid, "c.fasta", payload)
    assert route_submission_files(store, "alice", sid, BASE) == [
        f"{BASE}/submissions/{sid}/files/c.fasta"
    ]
    assert (
        route_submission_get_file(store, "alice", sid, "c.fasta")
        == b"contig data"
    )
    with pytest.raises(BadRequest, match="already uploaded"):
        route_submission_upload_file(store, "alice", sid, "c.fasta", payload)
    for bad in ("../etc/passwd", "a/b", "a\\b"):
        with pytest.raises(BadRequest, match="invalid characters"):
            route_submission_get_file(store, "alice", sid, bad)
    route_submission_delete_file(store, "alice", sid, "c.fasta")
    with pytest.raises(NotFound, match="File does not exist"):
        route_submission_get_file(store, "alice", sid, "c.fasta")
