"""BLAST tabular-output contract (SURVEY §2.10 external tools).

The reference shells out to BLAST+ and parses its 12-column tabular
output (``-outfmt 6``: qseqid sseqid pident length mismatch gapopen
qstart qend sstart send evalue bitscore) into exact / partial match
records (lib/BIGSdb/Offline/Blast.pm: ``_parse_blast_exact`` :379-441,
``_parse_blast_partial`` :443-524, helpers :614-683). This container
has no BLAST binary, so the adapter contract is pinned instead: these
transforms consume the same tabular lines — from ``ExternalTool``
(operators/seqmatch.py) when a binary exists, or from recorded golden
fixtures in tests — and reproduce the reference's record semantics:

- subject headers are ``locus|allele_id|length`` (``||`` for the
  v1.48.x cache era — both accepted, Blast.pm:459-461);
- exact match (:614-628): alignment spans the full reference allele
  (sstart==1 and send==len, or reversed sstart==len and send==1) with
  record[4]==0, deduplicated per (locus, allele, start) keeping the
  first record in file order (:363-364);
- reverse (:671-677): subject and query directions disagree;
- start/end (:630-640): min/max of qstart/qend;
- partial (:443-524): identity >= identity threshold AND alignment >=
  alignment% of the allele length; when a threshold is unset the BEST
  record of a locus with no passing records is kept anyway
  (return_best_poor_*, :449-452) — BLAST emits records best-first, so
  "first in file order" is the reference's "best";
- predicted allele ends (:642-668): extrapolate where the full allele
  would start/end on the query from the matched fragment; a gapped
  over-length alignment (alignment > allele length and gapopen > 0)
  emits a SECOND record with the gap-aware prediction (:498-505).

All transforms are column expressions (one window for the exact-tier
dedup) — the parse scales with the BLAST output, which at 100 TB is
the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_COLS = [
    ("query", "string"),
    ("subject", "string"),
    ("identity", "double"),
    ("alignment", "long"),
    ("mismatches", "long"),
    ("gaps", "long"),
    ("qstart", "long"),
    ("qend", "long"),
    ("sstart", "long"),
    ("send", "long"),
    ("evalue", "double"),
    ("bitscore", "double"),
]


def parse_blast_tabular(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """-outfmt 6 lines -> typed columns + (locus, allele, length) split
    from the subject header (both '|' and the v1.48.x '||' separator,
    Blast.pm:459-461). ``_file_order`` preserves input order for the
    order-dependent dedup/best-poor rules."""
    parts = F.split(F.trim(F.col(line_col)), r"\s+")
    df = lines.select(
        F.monotonically_increasing_id().alias("_file_order"),
        *[
            parts.getItem(i).cast(typ).alias(name)
            for i, (name, typ) in enumerate(_COLS)
        ],
    )
    sep = F.when(F.col("subject").contains("||"), F.lit(r"\|\|")).otherwise(
        F.lit(r"\|")
    )
    hdr = F.split(F.col("subject"), sep, 3)
    return df.select(
        "*",
        hdr.getItem(0).alias("locus"),
        hdr.getItem(1).alias("allele"),
        hdr.getItem(2).cast("long").alias("length"),
    ).drop("subject")


def _reverse() -> F.Column:
    return (
        (F.col("sstart") > F.col("send")) & (F.col("qend") > F.col("qstart"))
    ) | ((F.col("sstart") < F.col("send")) & (F.col("qend") < F.col("qstart")))


def _with_ends(df: DataFrame) -> DataFrame:
    return df.withColumns(
        {
            "start": F.least("qstart", "qend"),
            "end": F.greatest("qstart", "qend"),
            "reverse": _reverse(),
        }
    )


def blast_exact_matches(parsed: DataFrame) -> DataFrame:
    """_parse_blast_exact: full-allele-span, zero record[4], first
    record per (locus, allele, start) in file order wins."""
    full_span = (
        (F.col("sstart") == 1) & (F.col("send") == F.col("length"))
    ) | ((F.col("sstart") == F.col("length")) & (F.col("send") == 1))
    hits = _with_ends(parsed.filter(full_span & (F.col("mismatches") == 0)))
    w = Window.partitionBy("locus", "allele", "start").orderBy("_file_order")
    return (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "query", "locus", "allele", "identity", "alignment", "length",
            "start", "end", "reverse", "evalue",
        )
    )


def blast_partial_matches(
    parsed: DataFrame,
    identity: float | None = None,
    alignment: float | None = None,
    exact: DataFrame | None = None,
    program: str = "blastn",
) -> DataFrame:
    """_parse_blast_partial: threshold filter + best-poor fallback +
    predicted allele ends + the gap-split second record.

    ``identity`` / ``alignment`` None mirrors the reference's unset
    option: the numeric default applies (90 / 50, Blast.pm:452-453)
    AND the locus's best record is kept even when nothing passes
    (return_best_poor_*, :449-451). ``exact`` (the blast_exact_matches
    frame) drops loci that already matched exactly — the reference's
    ``next if $exact_matches->{$locus}`` (:464) — via a broadcast
    anti-join on the (small) exactly-matched locus list.

    ``program`` is the reference's per-run selection matrix
    (_determine_blast_program, Blast.pm:904-911: DNA db x DNA query ->
    blastn, peptide query -> tblastn; peptide db x DNA query ->
    blastx, peptide query -> blastp).  The only program-dependent
    parse rule is the tblast* residue->nucleotide factor: alignment
    lengths come back in residues while the subject header carries the
    locus's NUCLEOTIDE length, so record[3] is tripled BEFORE the
    alignment threshold (:466-468) and emitted tripled.  blastx needs
    no factor — a peptide locus's header length is in residues, the
    same unit blastx reports (only the query coords are nucleotide).
    The legacy ``$params->{'tblastx'}`` re-multiplication at :495 is a
    dead calling convention superseded by the :466 program check and
    is not reproduced.
    """
    keep_poor = identity is None or alignment is None
    id_thr = 90.0 if identity is None else float(identity)
    al_thr = 50.0 if alignment is None else float(alignment)
    if "tblast" in program:
        parsed = parsed.withColumn("alignment", F.col("alignment") * 3)
    if exact is not None:
        parsed = parsed.join(
            F.broadcast(exact.select("locus").distinct()),
            on="locus",
            how="left_anti",
        )
    base = _with_ends(parsed)
    passes = (F.col("identity") >= id_thr) & (
        F.col("alignment") >= al_thr * 0.01 * F.col("length")
    )
    flagged = base.withColumn("_pass", passes)
    if keep_poor:
        w = Window.partitionBy("locus").orderBy("_file_order")
        npass = Window.partitionBy("locus")
        flagged = flagged.withColumn(
            "_keep",
            F.col("_pass")
            | (
                (F.sum(F.col("_pass").cast("int")).over(npass) == 0)
                & (F.row_number().over(w) == 1)
            ),
        )
    else:
        flagged = flagged.withColumn("_keep", F.col("_pass"))
    kept = flagged.filter(F.col("_keep"))

    # _predict_allele_ends (:642-668): where the full allele would sit
    # on the query. Forward: count back to the allele's position-1;
    # reverse: count back from the allele's far end.
    smin = F.least("sstart", "send")
    smax = F.greatest("sstart", "send")
    pstart = F.when(
        F.col("length") == F.col("alignment"), F.col("start")
    ).otherwise(
        F.when(
            F.col("reverse"), F.col("start") - F.col("length") + smax
        ).otherwise(F.col("start") - smin + 1)
    )
    pend_full = F.when(
        F.col("length") == F.col("alignment"), F.col("end")
    ).otherwise(pstart + F.col("length") - 1)
    pend_gaps = F.when(
        F.col("length") == F.col("alignment"), F.col("end")
    ).otherwise(pstart + F.col("alignment") - 1)

    out_cols = [
        "query", "locus", "allele", "identity", "alignment", "length",
        "mismatches", "gaps", "start", "end", "reverse", "evalue",
        "bitscore",
    ]
    primary = kept.select(
        *out_cols,
        pstart.alias("predicted_start"),
        pend_full.alias("predicted_end"),
        F.lit(False).alias("gap_adjusted"),
    )
    # a gapped alignment longer than the allele also emits the
    # gap-aware prediction as a second record (:502-505)
    extra = kept.filter(
        (F.col("alignment") > F.col("length")) & (F.col("gaps") > 0)
    ).select(
        *out_cols,
        pstart.alias("predicted_start"),
        pend_gaps.alias("predicted_end"),
        F.lit(True).alias("gap_adjusted"),
    )
    return primary.unionByName(extra)
