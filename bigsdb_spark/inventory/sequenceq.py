"""Inventory: sequence-domain scalar functions (SURVEY §2.8 F1-F9)
exercised over pseudo-DNA derived deterministically from documents.text
(the driver tables carry no real sequences; the domain fixtures in
tests/ cover the genomic semantics on hand-built contigs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigsdb_spark.inventory.registry import DNA_SQL, dna_expr, register, tbl
from bigsdb_spark.functions.sequence import (
    gc_content,
    is_valid_dna,
    reverse_complement,
    sequence_md5,
)

# pseudo-DNA: the shared registry spelling (oracle + Spark expression)
_DNA_SQL = DNA_SQL


def _pseudo_dna(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        dna_expr("text").alias("seq"),
    ).filter(F.length("seq") > 0)


@register(
    "f10_partial_match",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DNA_SQL} AS seq FROM documents),
    alleles AS (
        SELECT doc_id AS allele_id, substr(seq, 1, 60) AS aseq
        FROM d WHERE length(seq) >= 60),
    queries AS (
        -- deterministic point mutations at positions 5 and 20
        SELECT allele_id AS query_id,
               concat(substr(aseq, 1, 4),
                      translate(substr(aseq, 5, 1), 'ACGT', 'CGTA'),
                      substr(aseq, 6, 14),
                      translate(substr(aseq, 20, 1), 'ACGT', 'CGTA'),
                      substr(aseq, 21)) AS qseq
        FROM alleles WHERE allele_id % 10 = 0),
    mm AS (
        SELECT q.query_id, a.allele_id,
               CAST(60 AS BIGINT) AS alignment,
               CAST((SELECT count(*) FROM UNNEST(range(1, 61)) AS u(i)
                     WHERE substr(q.qseq, i, 1) != substr(a.aseq, i, 1))
                    AS BIGINT) AS mismatches
        FROM queries q, alleles a)
    SELECT query_id, 'locus1' AS locus, CAST(allele_id AS VARCHAR) AS allele_id,
           alignment, mismatches, CAST(0 AS BIGINT) AS gaps,
           round((60 - mismatches) * 100.0 / 60, 4) AS identity
    FROM mm WHERE round((60 - mismatches) * 100.0 / 60, 4) >= 95.0
    """,
)
def f10_partial(spark, sf_dir):
    """F10 inexact tier: sequence -> allele PARTIAL matching — the
    k-mer-prefilter + ungapped-scoring path
    (operators/seqmatch.py::ungapped_partial_matches), reproducing the
    partial-match record of Offline/Blast.pm:443-502 (identity,
    mismatches, gaps, alignment; the identity threshold knob of :452).

    Fixture: alleles = 60-mers of pseudo-DNA; queries = every 10th
    allele with deterministic point mutations at positions 5 and 20
    (2 mismatches -> identity 96.7). The oracle scores ALL pairs
    directly, so it also proves the k-mer prefilter loses no
    within-threshold candidate: identity >= 95 over 60 bp means <= 3
    mismatches, whose longest exact run is >= ceil(57/4) = 15 >= k=10. The
    gapped/banded tier (seqmatch.banded_align) is pytest-covered —
    alignment scoring is not expressible in one SQL pass.
    """
    docs = tbl(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", dna_expr("text").alias("seq")
    ).filter(F.length("seq") >= 60)
    alleles = d.select(
        F.lit("locus1").alias("locus"),
        F.col("doc_id").cast("string").alias("allele_id"),
        F.substring("seq", 1, 60).alias("sequence"),
    )
    mut = F.concat(
        F.substring("sequence", 1, 4),
        F.translate(F.substring("sequence", 5, 1), "ACGT", "CGTA"),
        F.substring("sequence", 6, 14),
        F.translate(F.substring("sequence", 20, 1), "ACGT", "CGTA"),
        F.expr("substring(sequence, 21)"),
    )
    queries = alleles.filter(F.col("allele_id").cast("long") % 10 == 0).select(
        F.col("allele_id").cast("long").alias("query_id"),
        mut.alias("sequence"),
    )
    from bigsdb_spark.operators.seqmatch import ungapped_partial_matches

    return ungapped_partial_matches(
        queries, alleles, k=10, min_identity=95.0, min_alignment_pct=50.0
    )


@register(
    "f_sequence_suite",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DNA_SQL} AS seq FROM documents)
    SELECT doc_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           md5(seq) AS seq_md5,
           reverse(translate(seq, 'ACGT', 'TGCA')) AS revcomp,
           CASE WHEN regexp_matches(seq, '^[ACGT]+$') THEN 1 ELSE 0 END
               AS valid_dna,
           round(length(regexp_replace(seq, '[^GC]', '', 'g'))
                 / length(regexp_replace(seq, '[^ACGT]', '', 'g'))
                 * 100.0, 4) AS gc_pct
    FROM d WHERE length(seq) > 0
    """,
)
def f_suite(spark, sf_dir):
    """F1/F2/F5/F6: reverse-complement (translate+reverse, Utils.pm:39),
    DNA validity regex (Utils.pm:50), GC%% (SeqbinBreakdown.pm:488-530),
    md5 sequence identity (sql/seqdef.sql:358) — all expression-only."""
    d = _pseudo_dna(spark, sf_dir)
    return d.select(
        "doc_id",
        F.length("seq").cast("long").alias("seq_len"),
        sequence_md5(F.col("seq")).alias("seq_md5"),
        reverse_complement(F.col("seq")).alias("revcomp"),
        is_valid_dna(F.col("seq")).cast("int").alias("valid_dna"),
        gc_content(F.col("seq")).alias("gc_pct"),
    )
