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


def _kmer_array_sql(k: int) -> str:
    """SQL expression producing the k-mer array of a ``_seq`` column —
    empty when the sequence is shorter than k. Shared by the positional
    (seed-and-extend) and distinct (prefilter) k-mer paths."""
    return (
        "transform("
        f" CASE WHEN length(_seq) >= {k}"
        f"  THEN sequence(1, length(_seq) - {k - 1})"
        "   ELSE CAST(array() AS array<int>) END,"
        f" i -> substring(_seq, i, {k}))"
    )


def _seeded_windows(
    contigs: DataFrame,
    alleles: DataFrame,
    k: int,
    contig_id: str,
    contig_seq: str,
) -> DataFrame:
    """Seed-and-extend core (the word-hit idea of BLAST, word_size=k:
    Offline/ScanNew.pm:29 DEFAULT_WORD_SIZE): positional k-mers of
    contigs equi-join positional k-mers of alleles; each shared k-mer
    predicts an ungapped placement start = contig_pos - allele_pos + 1.
    Distinct placements inside the contig are then scored by direct
    substring comparison. Off-contig-end placements are rejected
    (ScanNew.pm:326 _off_end_of_contig).

    Returns one row per distinct (contig, locus, allele, start) with
    the extracted window and its mismatch count.
    """
    def positional_kmers(named, id_names, pos_name):
        # ``named``: already projected to (id_names..., _seq)
        return (
            named.select(
                *id_names,
                F.length("_seq").alias(f"{pos_name}_len"),
                F.posexplode(F.expr(_kmer_array_sql(k))).alias(
                    f"{pos_name}0", "kmer"
                ),
            )
            .select(
                *id_names,
                f"{pos_name}_len",
                (F.col(f"{pos_name}0") + 1).alias(pos_name),
                "kmer",
            )
        )

    ck = positional_kmers(
        contigs.select(
            F.col(contig_id).alias("_cid"), F.upper(F.col(contig_seq)).alias("_seq")
        ),
        ["_cid"],
        "cpos",
    )
    ak = positional_kmers(
        alleles.select(
            "locus", "allele_id", F.upper(F.col("sequence")).alias("_seq")
        ),
        ["locus", "allele_id"],
        "apos",
    )
    placements = (
        ck.join(ak, on="kmer")
        .select(
            "_cid",
            "locus",
            "allele_id",
            (F.col("cpos") - F.col("apos") + 1).alias("start_pos"),
            F.col("cpos_len").alias("_clen"),
            F.col("apos_len").alias("_alen"),
        )
        .filter(
            (F.col("start_pos") >= 1)
            & (F.col("start_pos") + F.col("_alen") - 1 <= F.col("_clen"))
        )
        .distinct()
    )
    cseq = contigs.select(
        F.col(contig_id).alias("_cid"), F.upper(F.col(contig_seq)).alias("_cseq")
    )
    aseq = alleles.select(
        "locus", "allele_id", F.upper(F.col("sequence")).alias("_aseq")
    )
    scored = (
        placements.join(cseq, on="_cid")
        .join(aseq, on=["locus", "allele_id"])
        .withColumn(
            "window", F.expr("substring(_cseq, start_pos, _alen)")
        )
        .withColumn(
            "mismatches",
            F.aggregate(
                F.zip_with(
                    F.split(F.col("window"), ""),
                    F.split(F.col("_aseq"), ""),
                    lambda x, y: (x != y).cast("int"),
                ),
                F.lit(0),
                lambda acc, v: acc + v,
            ).cast("long"),
        )
    )
    return scored.select(
        "_cid", "locus", "allele_id", "start_pos",
        (F.col("start_pos") + F.col("_alen") - 1).alias("end_pos"),
        "window", "mismatches",
        F.round((F.col("_alen") - F.col("mismatches")) * 100.0 / F.col("_alen"), 4)
            .alias("identity"),
    )


def scan_contigs_partial(
    contigs: DataFrame,
    alleles: DataFrame,
    k: int = 15,
    min_identity: float = 99.0,
    contig_id: str = "id",
    contig_seq: str = "sequence",
) -> DataFrame:
    """F11 partial-coverage autotagging: tag contig regions that match a
    locus allele ABOVE the identity threshold but not necessarily
    exactly (Offline/AutoTag.pm; defaults identity=99, full-length
    alignment — ScanNew.pm:27-28). Per placement, only the best allele
    is kept (fewest mismatches, ties to the smallest allele id — the
    reference keeps BLAST's best bitscore the same way).

    Returns (contig_id, locus, start_pos, end_pos, allele_id,
    mismatches, identity).
    """
    scored = _seeded_windows(contigs, alleles, k, contig_id, contig_seq).filter(
        F.col("identity") >= min_identity
    )
    w = Window.partitionBy("_cid", "locus", "start_pos").orderBy(
        F.asc("mismatches"), F.asc("allele_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("_cid").alias(contig_id),
            "locus",
            "start_pos",
            "end_pos",
            "allele_id",
            "mismatches",
            "identity",
        )
    )


def paralogous_loci(
    matches: DataFrame,
    contigs: DataFrame,
    contig_id: str = "id",
    contig_seq: str = "sequence",
    isolate_col: str | None = None,
) -> DataFrame:
    """Paralogy detection (Plugins/Helpers/GCHelper.pm:296-312
    _is_paralogous): a locus is paralogous when MORE THAN ONE distinct
    matched sequence passes the identity/alignment thresholds — two
    placements that extract the same sequence count once.

    ``matches`` is scan_contigs_partial output (already
    threshold-filtered, best allele per placement); the matched windows
    are re-extracted by joining the contig sequences (equi join on the
    contig id). Grouping is per isolate when ``isolate_col`` names an
    isolate column on ``contigs``, else per contig. Returns
    (group col, locus, n_distinct_matches, paralogous)."""
    group = isolate_col or contig_id
    cseq = contigs.select(
        F.col(contig_id),
        *([F.col(isolate_col)] if isolate_col else []),
        F.upper(F.col(contig_seq)).alias("_cseq"),
    )
    seqs = matches.join(cseq, on=contig_id).withColumn(
        "_mseq",
        F.expr("substring(_cseq, start_pos, end_pos - start_pos + 1)"),
    )
    return (
        seqs.groupBy(group, "locus")
        .agg(F.count_distinct(F.col("_mseq")).alias("n_distinct_matches"))
        .withColumn("paralogous", F.col("n_distinct_matches") > 1)
    )


def discover_new_alleles(
    contigs: DataFrame,
    alleles: DataFrame,
    k: int = 15,
    min_identity: float = 99.0,
    contig_id: str = "id",
    contig_seq: str = "sequence",
) -> DataFrame:
    """F11 new-allele discovery (Offline/ScanNew.pm:176-324): contig
    regions that align to a locus above the identity threshold but are
    NOT an existing allele become candidate new alleles:

    - dedupe candidates by md5 of the extracted sequence (:187-189);
    - reject sequences equal to an existing allele of the locus, and
      sub/super-sequences of existing alleles (:229-237
      _check_sub_or_super_seq);
    - reject sequences with non-GATC characters (:192);
    - provisional ids continue from the locus's max numeric allele id
      (get_next_allele_id — the W5 max+1 semantics), ordered by first
      (contig, position) appearance for determinism.

    Returns (locus, new_allele_id, sequence, seq_md5, n_placements).
    """
    scored = _seeded_windows(contigs, alleles, k, contig_id, contig_seq).filter(
        (F.col("identity") >= min_identity)
        & (F.col("mismatches") > 0)
        & (~F.col("window").rlike("[^GATC]"))
    )
    # one row per distinct candidate sequence per locus
    cands = scored.groupBy("locus", F.col("window").alias("sequence")).agg(
        F.count(F.lit(1)).alias("n_placements"),
        F.min(F.struct("_cid", "start_pos")).alias("_first_seen"),
    )
    existing = alleles.select(
        "locus", F.md5(F.upper(F.col("sequence"))).alias("_md5")
    )
    cands = cands.withColumn("seq_md5", F.md5("sequence")).join(
        existing,
        (cands["locus"] == existing["locus"]) & (F.col("seq_md5") == F.col("_md5")),
        "left_anti",
    )
    # sub/super-sequence rejection: same-locus containment either way
    a = alleles.select(
        F.col("locus").alias("_l"), F.upper(F.col("sequence")).alias("_aseq")
    )
    contained = (
        cands.join(a, cands["locus"] == a["_l"])
        .filter(
            F.col("_aseq").contains(F.col("sequence"))
            | F.col("sequence").contains(F.col("_aseq"))
        )
        .select("locus", "sequence")
        .distinct()
    )
    cands = cands.join(contained, on=["locus", "sequence"], how="left_anti")
    # provisional numeric ids: max existing numeric id per locus + rank
    max_ids = alleles.groupBy("locus").agg(
        F.max(
            F.when(
                F.col("allele_id").rlike("^[0-9]+$"),
                F.col("allele_id").cast("long"),
            )
        ).alias("_max_id")
    )
    w = Window.partitionBy("locus").orderBy("_first_seen", "sequence")
    return (
        cands.join(F.broadcast(max_ids), on="locus", how="left")
        .withColumn(
            "new_allele_id",
            (F.coalesce(F.col("_max_id"), F.lit(0)) + F.row_number().over(w)).cast(
                "string"
            ),
        )
        .select("locus", "new_allele_id", "sequence", "seq_md5", "n_placements")
    )


def curate_allele_submissions(
    submissions: DataFrame,
    existing: DataFrame,
    min_identity: float = 98.0,
    cds_loci: list[str] | None = None,
) -> DataFrame:
    """Automatic allele-submission curation
    (scripts/automation/allele_curator.pl:91-183). Per submitted
    sequence (cleaned of gaps/dots/whitespace, :113):

    1. loci requiring a complete CDS reject non-CDS sequences (:114-123);
    2. an md5 match against an existing allele of the locus -> status
       'assigned' with the EXISTING id (:125-135);
    3. otherwise, identity >= ``min_identity`` vs ANY same-length
       existing allele (:150-171, are_sequences_similar) -> 'assigned'
       with a new sequential id (max numeric id + 1, :259-263 /
       get_next_allele_id) — identical new sequences across submissions
       share one new id, exactly as the reference's insert-then-match
       sequence produces;
    4. else 'rejected' ('too dissimilar', :171-172).

    ``submissions``: (submission_id, seq_id, locus, sequence).
    ``existing``: (locus, allele_id, sequence). Returns
    (submission_id, seq_id, locus, status, allele_id, reason).
    All checks are equi-joins (md5; locus+length) + expression
    aggregation — no per-row SQL round-trips.
    """
    from bigsdb_spark.functions.sequence import is_complete_cds

    cds_loci = cds_loci or []
    subs = submissions.select(
        "submission_id",
        "seq_id",
        "locus",
        F.upper(
            F.regexp_replace(F.col("sequence"), r"[-.\s]", "")
        ).alias("_seq"),
    ).withColumn("_md5", F.md5("_seq"))
    cds_fail = (
        F.col("locus").isin(*cds_loci) & ~is_complete_cds(F.col("_seq"))
        if cds_loci
        else F.lit(False)
    )
    subs = subs.withColumn("_cds_fail", cds_fail)
    ex = existing.select(
        "locus",
        F.col("allele_id").alias("_ex_id"),
        F.upper(F.col("sequence")).alias("_ex_seq"),
    ).withColumn("_ex_md5", F.md5("_ex_seq"))
    # tier 2: exact match -> existing id. The reference store enforces
    # UNIQUE (locus, md5(sequence)) (seqdef.sql:358) so duplicates are
    # impossible there; caller-supplied allele frames may carry the same
    # sequence under several ids, which would fan one submission out
    # into conflicting 'assigned' rows — keep the smallest id per md5.
    exact = subs.join(
        ex.select("locus", F.col("_ex_md5").alias("_md5"), "_ex_id")
        .groupBy("locus", "_md5")
        .agg(F.min("_ex_id").alias("_ex_id")),
        on=["locus", "_md5"],
        how="left",
    )
    # tier 3: same-length similarity (only for non-exact, non-cds-failed)
    need_sim = exact.filter(
        F.col("_ex_id").isNull() & ~F.col("_cds_fail")
    ).withColumn("_len", F.length("_seq"))
    pairs = need_sim.join(
        ex.withColumn("_len", F.length("_ex_seq")).select(
            "locus", "_len", "_ex_seq"
        ),
        on=["locus", "_len"],
        how="left",
    )
    ident = F.lit(100.0) - F.lit(100.0) * F.aggregate(
        F.zip_with(
            F.split(F.col("_seq"), ""),
            F.split(F.col("_ex_seq"), ""),
            lambda a, b: ((a != b) & (a != "") & (b != "")).cast("int"),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.col("_len")
    best = (
        pairs.withColumn(
            "_ident", F.when(F.col("_ex_seq").isNotNull(), ident)
        )
        .groupBy("submission_id", "seq_id", "locus", "_seq")
        .agg(F.max("_ident").alias("_best_ident"))
        .withColumn("_similar", F.col("_best_ident") >= min_identity)
    )
    # new sequential ids: one per distinct accepted new sequence per
    # locus, from max numeric existing id, in first-submission order
    max_ids = ex.groupBy("locus").agg(
        F.max(F.col("_ex_id").try_cast("long")).alias("_max_id")
    )
    new_ids = (
        best.filter(F.col("_similar"))
        .groupBy("locus", "_seq")
        .agg(F.min(F.struct("submission_id", "seq_id")).alias("_first"))
        .withColumn(
            "_rank",
            F.row_number().over(
                Window.partitionBy("locus").orderBy("_first")
            ),
        )
        .join(F.broadcast(max_ids), on="locus", how="left")
        .select(
            "locus",
            "_seq",
            (F.coalesce(F.col("_max_id"), F.lit(0)) + F.col("_rank"))
            .cast("string")
            .alias("_new_id"),
        )
    )
    sim_out = best.join(new_ids, on=["locus", "_seq"], how="left").select(
        "submission_id",
        "seq_id",
        "locus",
        F.when(F.col("_similar"), F.lit("assigned"))
        .otherwise(F.lit("rejected"))
        .alias("status"),
        F.when(F.col("_similar"), F.col("_new_id")).alias("allele_id"),
        F.when(F.col("_similar"), F.lit("new allele"))
        .otherwise(F.lit("too dissimilar to existing allele"))
        .alias("reason"),
    )
    cds_out = subs.filter(F.col("_cds_fail")).select(
        "submission_id",
        "seq_id",
        "locus",
        F.lit("rejected").alias("status"),
        F.lit(None).cast("string").alias("allele_id"),
        F.lit("not complete CDS").alias("reason"),
    )
    exact_out = exact.filter(F.col("_ex_id").isNotNull() & ~F.col("_cds_fail")).select(
        "submission_id",
        "seq_id",
        "locus",
        F.lit("assigned").alias("status"),
        F.col("_ex_id").cast("string").alias("allele_id"),
        F.lit("already exists").alias("reason"),
    )
    return cds_out.unionByName(exact_out).unionByName(sim_out)


def find_exemplars(
    alleles: DataFrame,
    variation: float = 10.0,
) -> DataFrame:
    """Exemplar-allele selection (scripts/maintenance/find_exemplars.pl
    :95-155): per (locus, length), the first allele in id order is an
    exemplar, and each further allele joins the exemplar set when it
    differs by >= ``variation``% from EVERY current exemplar of that
    length (per-position XOR count, :125-127). Ids sort numerically
    when integer-formatted, else lexically (:160-162); '0'/'N'/'P'
    placeholder records are excluded (:161).

    The greedy scan is order-dependent WITHIN a (locus, length) group,
    but groups are independent — so the scan runs as one Arrow-batched
    applyInPandas task per group (numpy byte-compare inner loop), which
    is exactly how the per-locus script parallelizes at scale.
    Returns (locus, allele_id, length) exemplar rows.
    """
    import numpy as np
    import pandas as pd

    base = alleles.filter(~F.col("allele_id").isin("0", "N", "P")).select(
        "locus",
        "allele_id",
        F.upper(F.col("sequence")).alias("sequence"),
        F.length("sequence").alias("length"),
        F.col("allele_id").try_cast("long").alias("_num"),
    )
    # numeric-vs-lexical id order is a PER-LOCUS property in the
    # reference (loci.allele_id_format drives the ORDER BY,
    # find_exemplars.pl:160-162) — inferring it per (locus, length)
    # group would sort an all-numeric length group numerically even
    # when the locus as a whole is text-formatted, choosing different
    # first exemplars. Infer it over the whole locus instead.
    base = base.withColumn(
        "_locus_numeric",
        F.min(F.col("_num").isNotNull().cast("int")).over(
            Window.partitionBy("locus")
        ) == 1,
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["_locus_numeric"].iloc[0]:
            pdf = pdf.sort_values("_num", kind="stable")
        else:
            pdf = pdf.sort_values("allele_id", kind="stable")
        length = int(pdf["length"].iloc[0])
        exemplars: list[np.ndarray] = []
        ids: list = []
        rows = list(zip(pdf["allele_id"], pdf["sequence"]))
        arrs = {
            aid: np.frombuffer(seq.encode(), dtype=np.uint8)
            for aid, seq in rows
        }
        first_id = rows[0][0]
        exemplars.append(arrs[first_id])
        ids.append(first_id)
        for aid, _seq in rows:
            if aid == first_id:
                continue
            a = arrs[aid]
            for ex in exemplars:
                diff = 100.0 * int((a != ex).sum()) / length
                if diff < variation:
                    break
            else:
                exemplars.append(a)
                ids.append(aid)
        return pd.DataFrame(
            {
                "locus": pdf["locus"].iloc[0],
                "allele_id": ids,
                "length": length,
            }
        )

    return base.groupBy("locus", "length").applyInPandas(
        scan, "locus string, allele_id string, length int"
    )


def sequence_diffs(
    pairs: DataFrame,
    seq1: str = "seq1",
    seq2: str = "seq2",
) -> DataFrame:
    """Pairwise sequence comparison (Plugins/SequenceComparison.pm:
    160-175): per-position differences for SAME-LENGTH pairs — one row
    per differing position with 1-based ``pos``, ``base1`` -> ``base2``.
    Pairs of unequal length are excluded (the reference switches to an
    aligner there — use banded_align). Pure expressions: zip_with +
    posexplode, no Python."""
    other = [c for c in pairs.columns if c not in (seq1, seq2)]
    same_len = pairs.filter(F.length(seq1) == F.length(seq2))
    zipped = F.zip_with(
        F.split(F.upper(F.col(seq1)), ""),
        F.split(F.upper(F.col(seq2)), ""),
        lambda a, b: F.struct(a.alias("b1"), b.alias("b2")),
    )
    return (
        same_len.select(*other, F.posexplode(zipped).alias("_p", "_z"))
        .filter(
            (F.col("_z.b1") != F.col("_z.b2"))
            & (F.col("_z.b1") != "")
            & (F.col("_z.b2") != "")
        )
        .select(
            *other,
            (F.col("_p") + 1).alias("pos"),
            F.col("_z.b1").alias("base1"),
            F.col("_z.b2").alias("base2"),
        )
    )


def sequence_diff_summary(
    pairs: DataFrame,
    seq1: str = "seq1",
    seq2: str = "seq2",
) -> DataFrame:
    """Difference count + identity%, 2dp (SequenceComparison.pm:176
    ``100 - 100*numdiffs/length``), per same-length pair."""
    other = [c for c in pairs.columns if c not in (seq1, seq2)]
    n = F.aggregate(
        F.zip_with(
            F.split(F.upper(F.col(seq1)), ""),
            F.split(F.upper(F.col(seq2)), ""),
            lambda a, b: ((a != b) & (a != "") & (b != "")).cast("int"),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return pairs.filter(F.length(seq1) == F.length(seq2)).select(
        *other,
        n.cast("long").alias("differences"),
        F.round(
            F.lit(100.0) - F.lit(100.0) * n / F.length(seq1), 2
        ).alias("identity"),
    )


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


def _kmer_explode(df: DataFrame, id_cols: list[str], seq_col: str, k: int) -> DataFrame:
    """Distinct k-mers per row as exploded (id..., kmer) rows — empty
    when the sequence is shorter than k. (The positional variant used by
    the seed-and-extend path is _seeded_windows.positional_kmers; both
    build on _kmer_array_sql.)"""
    return (
        df.select(*id_cols, F.upper(F.col(seq_col)).alias("_seq"))
        .select(
            *id_cols,
            F.explode(
                F.array_distinct(F.expr(_kmer_array_sql(k)))
            ).alias("kmer"),
        )
    )


def kmer_candidates(
    queries: DataFrame,
    alleles: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_seq: str = "sequence",
) -> DataFrame:
    """F10 inexact tier, stage 1: k-mer prefilter.

    Explodes distinct k-mers of queries and alleles and equi-joins on
    the k-mer — the BLAST seeding idea (word hits) as a Spark hash join
    (Offline/Blast.pm:247 _run_blast word_size). Any alignment with at
    most m mismatches over length L shares a k-mer when
    k <= ceil((L - m)/(m + 1)) (pigeonhole over the m+1 exact runs), so
    the candidate set provably covers every within-threshold pair.

    Returns distinct (query_id, locus, allele_id) candidates.
    """
    q = _kmer_explode(queries, [query_id], query_seq, k)
    a = _kmer_explode(alleles, ["locus", "allele_id"], "sequence", k)
    return q.join(a, on="kmer").select(query_id, "locus", "allele_id").distinct()


def ungapped_partial_matches(
    queries: DataFrame,
    alleles: DataFrame,
    k: int = 10,
    min_identity: float = 90.0,
    min_alignment_pct: float = 50.0,
    query_id: str = "query_id",
    query_seq: str = "sequence",
) -> DataFrame:
    """F10 inexact tier, stage 2 (ungapped): score equal-length
    candidates by positional mismatch count — expression-only, so the
    whole path stays JVM-side and DuckDB-checkable.

    Mirrors the partial-match record of Offline/Blast.pm:443-502
    (_parse_blast_partial): identity / mismatches / gaps / alignment,
    filtered by ``identity >= min_identity`` (:468, default 90) and
    ``alignment >= min_alignment_pct * allele length`` (:482, default
    50%). Gapped/unequal-length candidates go to ``banded_align`` (the
    pandas-UDF tier) or a real BLAST behind ExternalTool.

    Returns (query_id, locus, allele_id, alignment, mismatches, gaps,
    identity).
    """
    cand = kmer_candidates(queries, alleles, k, query_id, query_seq)
    q = queries.select(F.col(query_id), F.upper(F.col(query_seq)).alias("qseq"))
    a = alleles.select("locus", "allele_id", F.upper(F.col("sequence")).alias("aseq"))
    scored = (
        cand.join(q, on=query_id)
        .join(a, on=["locus", "allele_id"])
        .filter(F.length("qseq") == F.length("aseq"))
    )
    mm = F.aggregate(
        F.zip_with(
            F.split(F.col("qseq"), ""),
            F.split(F.col("aseq"), ""),
            lambda x, y: (x != y).cast("int"),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("long")
    out = scored.select(
        query_id,
        "locus",
        "allele_id",
        F.length("aseq").alias("_allele_len"),
        F.length("aseq").cast("long").alias("alignment"),
        mm.alias("mismatches"),
        F.lit(0).cast("long").alias("gaps"),
        F.round(
            (F.length("aseq") - mm) * 100.0 / F.length("aseq"), 4
        ).alias("identity"),
    )
    return out.filter(
        (F.col("identity") >= min_identity)
        & (F.col("alignment") >= min_alignment_pct * 0.01 * F.col("_allele_len"))
    ).drop("_allele_len")


def banded_align(
    pairs: DataFrame,
    q_col: str = "qseq",
    a_col: str = "aseq",
    band: int = 16,
) -> DataFrame:
    """F10 inexact tier, stage 2 (gapped): banded global alignment as an
    Arrow-batched pandas UDF for candidates whose lengths differ — the
    fallback when no external aligner is available (ExternalTool wraps a
    real BLAST when present; Offline/Blast.pm:247).

    Scoring: match 0 / mismatch 1 / gap 1 (edit distance) inside a band
    of width ``band`` around the diagonal. Emits the same record shape
    BLAST's tabular output feeds into _parse_blast_partial
    (Blast.pm:486-495): alignment length, mismatches, gaps, identity.
    """
    import pandas as pd

    other = [c for c in pairs.columns if c not in (q_col, a_col)]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pairs.schema.fields if f.name not in (q_col, a_col)
    ) + ", alignment long, mismatches long, gaps long, identity double"

    def _align(q: str, a: str):
        # banded edit-distance DP; align_to_reference._project keeps a
        # deliberately separate copy with a different traceback (it
        # emits the projected alignment STRING, not the stats) — change
        # band/boundary rules in BOTH places
        n, m = len(q), len(a)
        w = max(band, abs(n - m) + 1)
        INF = 10 ** 9
        prev = {j: j for j in range(0, min(m, w) + 1)}
        back: dict = {}
        for i in range(1, n + 1):
            cur = {}
            lo, hi = max(0, i - w), min(m, i + w)
            for j in range(lo, hi + 1):
                best, op = INF, None
                if i > 0 and j > 0 and (j - 1) in prev:
                    c = prev[j - 1] + (0 if q[i - 1] == a[j - 1] else 1)
                    if c < best:
                        best, op = c, "D"  # diagonal
                if j in prev:
                    c = prev[j] + 1
                    if c < best:
                        best, op = c, "U"  # gap in allele
                if (j - 1) in cur:
                    c = cur[j - 1] + 1
                    if c < best:
                        best, op = c, "L"  # gap in query
                if j == 0:
                    best, op = i, "U"
                cur[j] = best
                back[(i, j)] = op
            prev = cur
        # traceback
        i, j = n, m
        mism = gaps = length = 0
        while i > 0 or j > 0:
            op = back.get((i, j))
            if op == "D" or (op is None and i > 0 and j > 0):
                mism += 0 if q[i - 1] == a[j - 1] else 1
                i, j = i - 1, j - 1
            elif op == "U" or (op is None and i > 0):
                gaps += 1
                i -= 1
            else:
                gaps += 1
                j -= 1
            length += 1
        ident = round((length - mism - gaps) * 100.0 / length, 4) if length else 0.0
        return length, mism, gaps, ident

    def _batches(batches):
        for pdf in batches:
            res = [
                _align(str(q).upper(), str(a).upper())
                for q, a in zip(pdf[q_col], pdf[a_col])
            ]
            out = pdf[other].copy()
            out["alignment"] = [r[0] for r in res]
            out["mismatches"] = [r[1] for r in res]
            out["gaps"] = [r[2] for r in res]
            out["identity"] = [r[3] for r in res]
            yield out

    return pairs.mapInPandas(_batches, schema)


def align_to_reference(
    pairs: DataFrame,
    q_col: str = "qseq",
    ref_col: str = "refseq",
    band: int = 16,
) -> DataFrame:
    """D9 for variable-length loci: project each sequence into REFERENCE
    coordinates via banded global alignment (same DP as banded_align) —
    deletions become '-', insertions relative to the reference are
    dropped. A star alignment against one reference allele is the
    scalable stand-in for the reference's MUSCLE/MAFFT multiple
    alignment (LocusExplorer.pm:334 _snp aligns exactly when allele
    lengths differ); per-position SNP frequencies then run on the
    projected strings with the ordinary fixed-length operator.

    Adds an ``aligned`` column (length == reference length) to
    ``pairs``.
    """
    import pandas as pd

    other = [c for c in pairs.columns if c != q_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pairs.schema.fields if f.name != q_col
    ) + ", aligned string"

    def _project(q: str, ref: str) -> str:
        n, m = len(q), len(ref)
        if q == ref:
            return q
        w = max(band, abs(n - m) + 1)
        INF = 10 ** 9
        prev = {j: j for j in range(0, min(m, w) + 1)}
        back: dict = {}
        for i in range(1, n + 1):
            cur = {}
            lo, hi = max(0, i - w), min(m, i + w)
            for j in range(lo, hi + 1):
                best, op = INF, None
                if j > 0 and (j - 1) in prev:
                    c = prev[j - 1] + (0 if q[i - 1] == ref[j - 1] else 1)
                    if c < best:
                        best, op = c, "D"
                if j in prev:
                    c = prev[j] + 1
                    if c < best:
                        best, op = c, "U"  # insertion in query
                if (j - 1) in cur:
                    c = cur[j - 1] + 1
                    if c < best:
                        best, op = c, "L"  # deletion (gap in query)
                cur[j] = best
                back[(i, j)] = op
            prev = cur
        out = ["-"] * m
        i, j = n, m
        while i > 0 or j > 0:
            op = back.get((i, j))
            if op == "D" or (op is None and i > 0 and j > 0):
                out[j - 1] = q[i - 1]
                i, j = i - 1, j - 1
            elif op == "U" or (op is None and i > 0):
                i -= 1  # query char has no reference column
            else:
                j -= 1  # out[j-1] stays '-'
        return "".join(out)

    def _batches(batches):
        for pdf in batches:
            res = [
                _project(str(q).upper(), str(r).upper())
                for q, r in zip(pdf[q_col], pdf[ref_col])
            ]
            out = pdf[other].copy()
            out["aligned"] = res
            yield out

    return pairs.mapInPandas(_batches, schema)


def polymorphic_sites_aligned(
    alleles: DataFrame,
    locus_col: str = "locus",
    allele_col: str = "allele_id",
    seq_col: str = "sequence",
) -> DataFrame:
    """D9 on variable-length alleles: pick a per-locus reference (the
    smallest allele id of the longest length — deterministic), project
    every allele into its coordinates (star alignment), then compute
    per-position residue frequencies ('-' rows are real deletion
    states, as in the reference's aligned SNP table,
    LocusExplorer.pm:811 get_freq_table).

    Returns (locus, pos, residue, n, pct).
    """
    longest = Window.partitionBy(locus_col).orderBy(
        F.desc(F.length(seq_col)), F.asc(allele_col)
    )
    refs = (
        alleles.withColumn("_rn", F.row_number().over(longest))
        .filter(F.col("_rn") == 1)
        .select(F.col(locus_col), F.upper(F.col(seq_col)).alias("refseq"))
    )
    pairs = alleles.select(
        locus_col, allele_col, F.upper(F.col(seq_col)).alias("qseq")
    ).join(F.broadcast(refs), on=locus_col)
    projected = align_to_reference(pairs, "qseq", "refseq")
    long = projected.select(
        locus_col,
        F.posexplode(F.split(F.col("aligned"), "(?!^)")).alias("pos0", "residue"),
    ).select(locus_col, (F.col("pos0") + 1).alias("pos"), "residue")
    freq = long.groupBy(locus_col, "pos", "residue").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(locus_col, "pos")
    return freq.select(
        locus_col, "pos", "residue", "n",
        F.round(F.col("n") * 100.0 / F.sum("n").over(w), 4).alias("pct"),
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
