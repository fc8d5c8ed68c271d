"""In-silico PCR (SURVEY §2.8 F12).

The reference shells out to ipcress (Plugins/PCR.pm; pcr/probes tables
sql/isolatedb.sql:786-860) to find regions amplified by primer pairs.
The exact-match (0-mismatch) tier is pure Spark: locate every forward
primer occurrence and every reverse-complement-of-reverse-primer
occurrence on a contig, join occurrences per contig, keep pairs whose
product length falls within bounds. Occurrence discovery is the same
windowed-substring explode as the exact autotagger; the pairing is a
range-predicate join on the contig key.

Mismatch-tolerant matching belongs to the ExternalTool pipe tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigsdb_spark.functions.sequence import reverse_complement


def _occurrences(contigs: DataFrame, primer_col: str, primers: DataFrame,
                 contig_id: str, contig_seq: str, out: str) -> DataFrame:
    """All (contig, primer, position) exact occurrences; one explode per
    distinct primer length (bounded — primers are short). Returns an
    empty typed frame when there are no primers (ipcress exits cleanly
    on an empty primer file; so do we)."""
    lengths = [r.L for r in primers.select(F.length(primer_col).alias("L")).distinct().collect()]
    if not lengths:
        # empty frame with the contigs' REAL id type — a hardcoded long
        # would make a per-scheme empty result un-unionable with a
        # populated one over string-id contigs
        id_type = dict(contigs.dtypes)[contig_id]
        return contigs.sparkSession.createDataFrame(
            [], f"_cid {id_type}, primer_id string, {out} int"
        )
    p = primers.select(
        F.col("primer_id"), F.upper(F.col(primer_col)).alias("_p"),
        F.length(primer_col).alias("_len"),
    )
    result = None
    for L in lengths:
        windows = (
            contigs.select(F.col(contig_id).alias("_cid"), F.upper(F.col(contig_seq)).alias("_seq"))
            .filter(F.length("_seq") >= L)
            .select(
                "_cid",
                F.posexplode(
                    F.expr(
                        f"transform(sequence(1, length(_seq) - {L} + 1),"
                        f" i -> substring(_seq, i, {L}))"
                    )
                ).alias("_pos0", "_win"),
            )
            .select("_cid", (F.col("_pos0") + 1).alias(out), F.col("_win"))
        )
        hits = windows.join(
            F.broadcast(p.filter(F.col("_len") == L)), windows["_win"] == p["_p"]
        ).select("_cid", "primer_id", out)
        result = hits if result is None else result.unionByName(hits)
    return result


def insilico_pcr(
    contigs: DataFrame,
    primer_pairs: DataFrame,
    contig_id: str = "id",
    contig_seq: str = "sequence",
    max_product: int = 5000,
) -> DataFrame:
    """``primer_pairs``: (pair_id, forward, reverse). Returns
    (contig id, pair_id, start_pos, end_pos, product_len, orientation)
    for every amplicon, BOTH orientations (ipcress reports both):

    - 'F': forward primer on the + strand followed, within
      ``max_product`` bases, by the reverse complement of the reverse
      primer;
    - 'R': the pair binds the opposite strand — on the + strand that
      reads as the reverse primer followed by the reverse complement of
      the forward primer.
    """

    # ONE window-scan over the contigs for all four primer roles (the
    # naive shape — one _occurrences call per role — re-explodes every
    # contig per role per primer length, 4x the dominant cost at scale,
    # and pays four lengths-collect jobs instead of one). The role is
    # encoded into the primer id and split back out after the scan.
    roles = [
        ("F", "first", F.col("forward")),
        ("F", "second", reverse_complement(F.col("reverse"))),
        ("R", "first", F.col("reverse")),
        ("R", "second", reverse_complement(F.col("forward"))),
    ]
    prim = None
    for orientation, role, expr in roles:
        part = primer_pairs.select(
            # unit-separator delimiter: cannot appear in real pair ids
            F.concat(
                F.col("pair_id"), F.lit(f"\x1f{orientation}\x1f{role}")
            ).alias("primer_id"),
            expr.alias("p"),
        )
        prim = part if prim is None else prim.unionByName(part)
    occ = _occurrences(contigs, "p", prim, contig_id, contig_seq, "pos").select(
        "_cid",
        F.substring_index("primer_id", "\x1f", 1).alias("pair_id"),
        F.substring_index(
            F.substring_index("primer_id", "\x1f", 2), "\x1f", -1
        ).alias("_ori"),
        F.substring_index("primer_id", "\x1f", -1).alias("_role"),
        "pos",
    )

    def one_orientation(orientation, second):
        a_occ = occ.filter(
            (F.col("_ori") == orientation) & (F.col("_role") == "first")
        ).select("_cid", "pair_id", F.col("pos").alias("f_pos"))
        b_occ = occ.filter(
            (F.col("_ori") == orientation) & (F.col("_role") == "second")
        ).select("_cid", "pair_id", F.col("pos").alias("r_pos"))
        b_len = primer_pairs.select(
            "pair_id", F.length(second).alias("_rlen")
        )
        joined = (
            a_occ.join(b_occ, on=["_cid", "pair_id"])
            .join(F.broadcast(b_len), on="pair_id")
            .filter(
                (F.col("r_pos") > F.col("f_pos"))
                & (F.col("r_pos") + F.col("_rlen") - F.col("f_pos") <= max_product)
            )
        )
        return joined.select(
            F.col("_cid").alias(contig_id),
            "pair_id",
            F.col("f_pos").alias("start_pos"),
            (F.col("r_pos") + F.col("_rlen") - 1).alias("end_pos"),
            (F.col("r_pos") + F.col("_rlen") - F.col("f_pos")).alias("product_len"),
            F.lit(orientation).alias("orientation"),
        )

    fwd_strand = one_orientation("F", reverse_complement(F.col("reverse")))
    rev_strand = one_orientation("R", reverse_complement(F.col("forward")))
    return fwd_strand.unionByName(rev_strand)
