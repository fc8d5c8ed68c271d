"""Inventory: sequence-domain scalar functions (SURVEY §2.8 F1-F9)
exercised over pseudo-DNA derived deterministically from documents.text
(the driver tables carry no real sequences; the domain fixtures in
tests/ cover the genomic semantics on hand-built contigs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigsdb_spark.inventory.registry import register, tbl
from bigsdb_spark.functions.sequence import (
    gc_content,
    is_valid_dna,
    reverse_complement,
    sequence_md5,
)

# pseudo-DNA: keep only a/c/g/t chars from the text, uppercased
_DNA_SQL = "upper(regexp_replace(text, '[^acgt]', '', 'g'))"


def _pseudo_dna(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.regexp_replace("text", "[^acgt]", "")).alias("seq"),
    ).filter(F.length("seq") > 0)


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
