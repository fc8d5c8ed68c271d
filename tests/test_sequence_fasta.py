"""F1-F9 sequence functions + FASTA reader round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigsdb_spark.functions.sequence import (
    gc_content,
    is_complete_cds,
    is_valid_dna,
    n_count,
    reverse_complement,
    sequence_type,
    translate_dna,
)
from bigsdb_spark.sources.fasta import read_fasta, to_fasta


def one(df, col):
    return df.select(col.alias("v")).collect()[0].v


def test_reverse_complement(spark):
    df = spark.createDataFrame([("ATGC",)], "seq string")
    assert one(df, reverse_complement(F.col("seq"))) == "GCAT"


def test_valid_dna_and_type(spark):
    df = spark.createDataFrame([("ACGTACGT",), ("MKLV",)], "seq string")
    got = df.select(
        is_valid_dna(F.col("seq")).alias("dna"), sequence_type(F.col("seq")).alias("t")
    ).collect()
    assert [r.dna for r in got] == [True, False]
    assert [r.t for r in got] == ["DNA", "peptide"]


def test_gc_and_n(spark):
    df = spark.createDataFrame([("GGCCAANN",)], "seq string")
    assert one(df, gc_content(F.col("seq"))) == round(4 / 6 * 100, 4)
    assert one(df, n_count(F.col("seq"))) == 2


def test_translate_and_cds(spark):
    df = spark.createDataFrame([("ATGAAATAA",), ("ATGTAAAAA",)], "seq string")
    pep = [r.p for r in df.select(translate_dna(F.col("seq")).alias("p")).collect()]
    assert pep == ["MK*", "M*K"]
    cds = [r.c for r in df.select(is_complete_cds(F.col("seq")).alias("c")).collect()]
    assert cds == [True, False]  # internal stop fails the second


def test_fasta_roundtrip(spark, tmp_path):
    p = tmp_path / "test.fasta"
    p.write_text(">seq1 locus=abcZ\nACGT\nACGT\n>seq2\nTTTT\n")
    df = read_fasta(spark, str(p))
    got = {r.seq_id: r.sequence for r in df.collect()}
    assert got == {"seq1": "ACGTACGT", "seq2": "TTTT"}
    out = to_fasta(df, "seq_id", "sequence").collect()
    assert any(r.fasta.startswith(">seq1\n") for r in out)


def test_fasta_crlf_headers(spark, tmp_path):
    """CRLF FASTA: a bare-id header must not keep its '\\r' (it would
    silently join-match nothing downstream)."""
    p = tmp_path / "crlf.fasta"
    p.write_bytes(b">seq1\r\nACGT\r\n>seq2 desc here\r\nTTTT\r\n")
    got = {r.seq_id: r.sequence for r in read_fasta(spark, str(p)).collect()}
    assert got == {"seq1": "ACGT", "seq2": "TTTT"}


def test_to_fasta_no_trailing_blank_line(spark):
    """A sequence of exactly width*k chars must not wrap into a
    trailing newline (blank record lines break strict parsers)."""
    df = spark.createDataFrame([("s1", "ACGTACGT")], "seq_id string, sequence string")
    rec = to_fasta(df, "seq_id", "sequence", width=4).collect()[0].fasta
    assert rec == ">s1\nACGT\nACGT"


def test_gc_and_type_guards(spark):
    """All-N contigs and empty strings must not DIVIDE_BY_ZERO under
    ANSI mode: gc is NULL without unambiguous bases, empty -> peptide."""
    df = spark.createDataFrame([("NNNN",), ("",)], "seq string")
    got = df.select(
        gc_content(F.col("seq")).alias("gc"),
        sequence_type(F.col("seq")).alias("t"),
    ).collect()
    assert got[0].gc is None and got[1].gc is None
    assert [r.t for r in got] == ["DNA", "peptide"]  # NNNN is 100% ACGTN
