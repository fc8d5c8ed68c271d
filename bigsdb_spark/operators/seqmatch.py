"""Exact sequence-match family — the BLAST-free paths (SURVEY §2.8
F10/F11, D11).

The reference's sequence query has two tiers: exact match (md5 lookup
against the allele definitions — Offline/Blast.pm:191 exact path backed
by the UNIQUE (locus, md5(sequence)) index, sql/seqdef.sql:358) and
inexact (external BLAST). Everything exact stays pure Spark:

- ``exact_allele_lookup``: query sequences -> (locus, allele_id) by
  md5 equi-join. Broadcast the query side (it is user input, small).
- ``scan_contigs_exact``: the autotagger's exact path — for each locus
  with fixed-length alleles, slide a window of that length over every
  contig, md5 each window, join against the allele table. The window
  explode is the UDTF shape; the join is a hash join on (locus-length,
  md5) — this is how a 100 TB contig store gets scanned without BLAST.
- ``mutation_scan``: D11 — substring compare at stored offsets against
  a mutation-definition dimension (sequences_peptide_mutations,
  sql/seqdef.sql:1698; Datastore.pm:1703-1815 temp variation tables).

The inexact tier is isolated behind ``ExternalTool`` below (pipe
interface; BLAST itself is not in this container).
"""

from __future__ import annotations

import shutil
import subprocess
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_allele_lookup(
    queries: DataFrame,
    alleles: DataFrame,
    query_id: str = "query_id",
    query_seq: str = "sequence",
) -> DataFrame:
    """Exact sequence -> allele designation via md5 join.

    ``alleles``: (locus, allele_id, sequence). Uppercase-normalized md5
    on both sides (the reference stores md5(sequence) uppercased the
    same way). Returns (query_id, locus, allele_id).
    """
    q = F.broadcast(
        queries.select(F.col(query_id), F.md5(F.upper(F.col(query_seq))).alias("_md5"))
    )
    a = alleles.select(
        "locus", "allele_id", F.md5(F.upper(F.col("sequence"))).alias("_md5")
    )
    return q.join(a, on="_md5").select(query_id, "locus", "allele_id")


def scan_contigs_exact(
    contigs: DataFrame,
    alleles: DataFrame,
    contig_id: str = "id",
    contig_seq: str = "sequence",
) -> DataFrame:
    """F11 exact autotag: find every allele occurrence in every contig.

    Alleles are grouped by length; for each distinct allele length L the
    contigs are exploded into their L-windows (start, md5(window)) and
    hash-joined against the alleles of that length. Work is
    O(total contig bases x distinct lengths) map-side + one shuffle on
    the md5 key; no quadratic sequence comparison, no external tool.

    Returns (contig_id, locus, allele_id, start_pos, end_pos) — the
    allele_sequences tag shape (sql/isolatedb.sql:861).
    """
    lengths = [
        r.L for r in alleles.select(
            F.length("sequence").alias("L")
        ).distinct().collect()
    ]
    a = alleles.select(
        "locus",
        "allele_id",
        F.length("sequence").alias("_len"),
        F.md5(F.upper(F.col("sequence"))).alias("_md5"),
    )
    results = None
    for L in lengths:
        windows = (
            contigs.select(
                F.col(contig_id).alias("_cid"), F.upper(F.col(contig_seq)).alias("_seq")
            )
            .filter(F.length("_seq") >= L)
            .select(
                "_cid",
                F.posexplode(
                    F.expr(
                        f"transform(sequence(1, length(_seq) - {L} + 1),"
                        f" i -> md5(substring(_seq, i, {L})))"
                    )
                ).alias("_pos0", "_md5"),
            )
            .select(
                "_cid", (F.col("_pos0") + 1).alias("start_pos"), "_md5"
            )
        )
        hits = windows.join(
            F.broadcast(a.filter(F.col("_len") == L)), on="_md5"
        ).select(
            F.col("_cid").alias(contig_id),
            "locus",
            "allele_id",
            "start_pos",
            (F.col("start_pos") + L - 1).alias("end_pos"),
        )
        results = hits if results is None else results.unionByName(hits)
    if results is None:
        return contigs.sparkSession.createDataFrame(
            [], f"{contig_id} long, locus string, allele_id string, "
            "start_pos int, end_pos int"
        )
    return results


def mutation_scan(
    alleles: DataFrame,
    mutations: DataFrame,
) -> DataFrame:
    """D11: flag defined mutations per allele — substring compare at the
    stored offset. ``mutations``: (locus, position, wild_type, variant)
    1-based position. Returns (locus, allele_id, position, observed,
    is_variant, is_wild_type)."""
    m = F.broadcast(mutations)
    j = alleles.join(m, on="locus")
    observed = F.substring(
        F.upper(F.col("sequence")), F.col("position"), F.lit(1)
    )
    return j.select(
        "locus",
        "allele_id",
        "position",
        observed.alias("observed"),
        (observed == F.upper(F.col("variant"))).alias("is_variant"),
        (observed == F.upper(F.col("wild_type"))).alias("is_wild_type"),
    )


@dataclass
class ExternalTool:
    """Pipe interface for external aligners/BLAST (SURVEY §2.10).

    Wraps a command as a per-partition subprocess transform
    (``df.rdd.pipe``-style but via mapPartitions so we keep schemas).
    ``available()`` gates usage — this container has no BLAST binary, so
    callers fall back to the exact tier and tests use ``cat``/``sort``.
    """

    command: list[str]

    def available(self) -> bool:
        return shutil.which(self.command[0]) is not None

    def pipe_lines(self, df: DataFrame, line_col: str, out_col: str = "line") -> DataFrame:
        cmd = self.command
        out_schema = f"{out_col} string"

        def _run(part):
            lines = [r[0] for r in part]
            if not lines:
                return
            proc = subprocess.run(
                cmd, input="\n".join(lines), capture_output=True, text=True,
                check=True,
            )
            for line in proc.stdout.splitlines():
                yield (line,)

        return df.select(line_col).rdd.mapPartitions(_run).toDF(out_schema)
