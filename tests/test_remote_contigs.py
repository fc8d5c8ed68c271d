"""S5: remote-contig resolution + fragment extraction
(ContigManager.pm semantics)."""

from __future__ import annotations

import hashlib

import pytest

from bigsdb_spark.sources.contigs import (
    contig_fragment,
    resolve_remote_contigs,
    uri_fetcher,
)

SEQ = "ACGTACGTAAGGCCTTACGT"


@pytest.fixture()
def remote_file(tmp_path):
    p = tmp_path / "contig1.seq"
    p.write_text("acgt acgt\naagg cctt\nacgt\n")  # whitespace + case noise
    return f"file://{p}"


def test_resolve_file_uri_with_checksum(spark, remote_file):
    md5 = hashlib.md5(SEQ.encode()).hexdigest()
    seqbin = spark.createDataFrame(
        [
            (1, "TTTT", None, None),  # local row passes through
            (2, None, remote_file, md5),  # good checksum
            (3, None, remote_file, "0" * 32),  # stale checksum
            (4, None, "file:///nonexistent", None),  # fetch failure
        ],
        "id int, sequence string, remote_uri string, checksum string",
    )
    out = {
        r["id"]: r
        for r in resolve_remote_contigs(seqbin, fetcher=uri_fetcher).collect()
    }
    assert out[1]["sequence"] == "TTTT" and out[1]["fetch_error"] is None
    assert out[2]["sequence"] == SEQ and out[2]["fetch_error"] is None
    # reference logs checksum drift but still returns the sequence
    assert out[3]["sequence"] == SEQ
    assert out[3]["fetch_error"] == "checksum_mismatch"
    assert out[4]["sequence"] is None
    assert out[4]["fetch_error"].startswith("fetch_failed")


def test_http_scheme_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        uri_fetcher("https://rest.example.org/db/x/contigs/1")


def test_fragment_flanking_and_clamps(spark):
    seqbin = spark.createDataFrame([(1, SEQ)], "id int, sequence string")
    pos = spark.createDataFrame(
        [
            (1, 5, 8),  # interior
            (1, -3, 4),  # start clamped to 1, no upstream
            (1, 18, 99),  # end clamped to contig length
        ],
        "seqbin_id int, start_pos int, end_pos int",
    )
    rows = {
        (r["start_pos"], r["end_pos"]): r
        for r in contig_fragment(seqbin, pos, flanking=3).collect()
    }
    r = rows[(5, 8)]
    assert (r["seq"], r["upstream"], r["downstream"]) == ("ACGT", "CGT", "AAG")
    r = rows[(1, 4)]
    assert (r["seq"], r["upstream"], r["downstream"]) == ("ACGT", "", "ACG")
    r = rows[(18, 20)]
    assert (r["seq"], r["upstream"], r["downstream"]) == ("CGT", "TTA", "")


def test_fragment_reverse_complement_swaps_flanks(spark):
    seqbin = spark.createDataFrame([(1, SEQ)], "id int, sequence string")
    pos = spark.createDataFrame(
        [(1, 5, 8)], "seqbin_id int, start_pos int, end_pos int"
    )
    r = contig_fragment(seqbin, pos, flanking=3, reverse=True).collect()[0]
    # forward: seq=ACGT up=CGT down=AAG -> revcomp + swapped flanks
    assert r["seq"] == "ACGT"  # revcomp(ACGT) == ACGT (palindrome)
    assert r["upstream"] == "CTT"  # revcomp(AAG)
    assert r["downstream"] == "ACG"  # revcomp(CGT)
