"""Submission-validation operators: batch checks of submitted alleles
and profiles before curation.

Reference behavior (WHAT): ``lib/BIGSdb/SubmissionHandler.pm``
- :476-560 ``check_new_alleles_fasta`` — per-sequence ERROR checks
  (blank/duplicate identifiers, invalid DNA/peptide characters after
  stripping gaps, fixed/min/max length violations, already-defined
  allele via the (locus, md5(sequence)) identity) and INFO checks
  (incomplete CDS, sub-/super-sequence of an existing allele,
  dissimilar to every existing allele);
- :597-680 ``check_new_profiles`` — per-row checks of a submitted
  profile table (duplicate row identifiers, empty designations, the
  N/0 policy, undefined alleles, already-defined profiles).

HOW here: the reference loops sequence-by-sequence running one SQL
probe per check; every check below is a column expression or an
equi-join against the definitions tables evaluated once for the whole
batch.  Submission batches are download-sized but the allele/profile
definition sides are not — all joins are keyed on (locus, md5) /
(locus, allele_id) hashes so the same plan serves a bulk historical
re-validation at warehouse scale.

The similarity INFO tier uses shared-k-mer screening (either strand)
in place of the reference's BLAST identity rule
(SubmissionHandler.pm:570 _check_sequence_similarity); ExternalTool
(operators/seqmatch.py) remains the full-fidelity path when a BLAST
binary exists.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from bigsdb_spark.functions.sequence import (
    is_valid_dna,
    is_valid_peptide,
    reverse_complement,
    sequence_md5,
)

__all__ = ["check_new_alleles", "check_new_profiles"]


def _kmer_rows(df: DataFrame, keep: list[str], seq_expr, k: int) -> DataFrame:
    """One row per k-mer of ``seq_expr``, exploded index-first so the
    (possibly computed) sequence is materialized once per row by the
    Generate — an array-transform lambda over a computed input would
    re-evaluate it per ELEMENT after projection collapse (quadratic
    per sequence; the word_shingles/lm.py trap)."""
    d = df.select(*keep, seq_expr.alias("_s")).filter(F.length("_s") >= k)
    return d.select(
        *keep,
        "_s",
        F.explode(F.sequence(F.lit(1), F.length("_s") - (k - 1))).alias("_i"),
    ).select(*keep, F.substring(F.col("_s"), F.col("_i").cast("int"), k).alias("_km"))


def check_new_alleles(
    seqs: DataFrame,
    existing: DataFrame,
    locus: str,
    data_type: str = "DNA",
    length: int | None = None,
    length_varies: bool = True,
    min_length: int | None = None,
    max_length: int | None = None,
    diploid: bool = False,
    check_similarity: bool = True,
    kmer: int = 11,
) -> DataFrame:
    """Validate a submitted allele batch for one locus.

    ``seqs``: (seq_id, sequence); ``existing``: the definitions table
    (locus, allele_id, sequence).  Returns one row per submitted
    sequence: cleaned sequence, ``errors`` / ``infos`` string arrays
    (reference message shapes) and ``status`` — ``pending`` when
    error-free (the state written to allele_submission_sequences,
    REST/Routes/Submissions.pm:420), else ``rejected``.
    """
    cleaned = F.regexp_replace(F.col("sequence"), r"[\-\.\s]", "")
    sid = F.trim(F.col("seq_id"))
    df = seqs.select(
        sid.alias("seq_id"),
        F.upper(cleaned).alias("sequence"),
    )
    dup_w = Window.partitionBy("seq_id")
    df = df.withColumn("_dup", F.count(F.lit(1)).over(dup_w) > 1)

    mine = existing.filter(F.col("locus") == locus).select(
        F.col("allele_id").alias("_ex_id"),
        F.upper(F.col("sequence")).alias("_ex_seq"),
        sequence_md5(F.col("sequence")).alias("_ex_md5"),
    )
    # already-defined: one hash join on the md5 identity
    # (seqdef.sql:358's UNIQUE (locus, md5(sequence)))
    df = df.join(
        mine.select(F.col("_ex_md5"), F.col("_ex_id").alias("_defined_as")),
        F.md5(F.col("sequence")) == F.col("_ex_md5"),
        "left",
    ).drop("_ex_md5")

    if data_type == "DNA":
        valid = is_valid_dna(F.col("sequence"), allow_ambiguous=diploid)
        invalid_msg = 'is not a valid unambiguous DNA sequence.'
        units = "bp"
    else:
        valid = is_valid_peptide(F.col("sequence"))
        invalid_msg = 'is not a valid unambiguous peptide sequence.'
        units = "residues"

    ln = F.length("sequence")
    errs = F.array(
        F.when(F.col("seq_id") == "", F.lit("Sequence identifier is missing.")),
        F.when(
            F.col("_dup"),
            F.concat(
                F.lit('Sequence identifier "'), F.col("seq_id"),
                F.lit('" is used more than once in submission.'),
            ),
        ),
        F.when(
            ~valid,
            F.concat(
                F.lit('Sequence "'), F.col("seq_id"), F.lit(f'" {invalid_msg}')
            ),
        ),
        (
            F.when(
                F.lit(not length_varies and length is not None) & (ln != F.lit(length or 0)),
                F.concat(
                    F.lit('Sequence "'), F.col("seq_id"),
                    F.lit('" has a length of '), ln.cast("string"),
                    F.lit(f" {units} while this locus has a non-variable length of "),
                    F.lit(str(length)), F.lit(f" {units}."),
                ),
            )
            if not length_varies and length is not None
            else F.lit(None).cast("string")
        ),
        (
            F.when(
                ln < F.lit(min_length or 0),
                F.concat(
                    F.lit('Sequence "'), F.col("seq_id"),
                    F.lit('" has a length of '), ln.cast("string"),
                    F.lit(f" {units} while this locus has a minimum length of "),
                    F.lit(str(min_length)), F.lit(f" {units}."),
                ),
            )
            if length_varies and min_length is not None
            else F.lit(None).cast("string")
        ),
        (
            F.when(
                ln > F.lit(max_length or 0),
                F.concat(
                    F.lit('Sequence "'), F.col("seq_id"),
                    F.lit('" has a length of '), ln.cast("string"),
                    F.lit(f" {units} while this locus has a maximum length of "),
                    F.lit(str(max_length)), F.lit(f" {units}."),
                ),
            )
            if length_varies and max_length is not None
            else F.lit(None).cast("string")
        ),
        F.when(
            F.col("_defined_as").isNotNull(),
            F.concat(
                F.lit('Sequence "'), F.col("seq_id"),
                F.lit('" has already been defined as '),
                F.lit(f"{locus}-"), F.col("_defined_as"), F.lit("."),
            ),
        ),
    )
    df = df.withColumn("errors", F.filter(errs, lambda e: e.isNotNull()))

    # INFO tier: sub-/super-sequence and similarity vs the locus'
    # definitions.  Candidate pairs come from a shared-k-mer equi-join
    # (both strands), then containment is an expression on the pair.
    infos = F.array().cast("array<string>")
    if check_similarity:
        q = df.select(
            F.col("seq_id").alias("_q_id"), F.col("sequence").alias("_q_seq")
        )
        qk = (
            _kmer_rows(q, ["_q_id", "_q_seq"], F.col("_q_seq"), kmer)
            .unionByName(
                _kmer_rows(
                    q,
                    ["_q_id", "_q_seq"],
                    reverse_complement(F.col("_q_seq")),
                    kmer,
                )
            )
            .select("_q_id", "_q_seq", "_km")
            .dropDuplicates(["_q_id", "_km"])
        )
        ek = _kmer_rows(mine, ["_ex_id", "_ex_seq"], F.col("_ex_seq"), kmer).select(
            "_ex_id", "_ex_seq", "_km"
        )
        pairs = (
            qk.join(ek, "_km")
            .select("_q_id", "_q_seq", "_ex_id", "_ex_seq")
            .distinct()
        )
        rel = pairs.groupBy("_q_id").agg(
            F.max(
                F.when(
                    (F.length("_q_seq") < F.length("_ex_seq"))
                    & F.col("_ex_seq").contains(F.col("_q_seq")),
                    F.col("_ex_id"),
                )
            ).alias("_sub_of"),
            F.max(
                F.when(
                    (F.length("_q_seq") > F.length("_ex_seq"))
                    & F.col("_q_seq").contains(F.col("_ex_seq")),
                    F.col("_ex_id"),
                )
            ).alias("_super_of"),
            F.count(F.lit(1)).alias("_n_similar"),
        )
        df = df.join(rel, df["seq_id"] == rel["_q_id"], "left").drop("_q_id")
        infos = F.filter(
            F.array(
                F.when(
                    F.col("_sub_of").isNotNull(),
                    F.concat(
                        F.lit('Sequence "'), F.col("seq_id"),
                        F.lit('" is a sub-sequence of allele-'), F.col("_sub_of"),
                        F.lit("."),
                    ),
                ),
                F.when(
                    F.col("_super_of").isNotNull(),
                    F.concat(
                        F.lit('Sequence "'), F.col("seq_id"),
                        F.lit('" is a super-sequence of allele '), F.col("_super_of"),
                        F.lit("."),
                    ),
                ),
                F.when(
                    F.coalesce(F.col("_n_similar"), F.lit(0)) == 0,
                    F.concat(
                        F.lit('Sequence "'), F.col("seq_id"),
                        F.lit('" is dissimilar (or in reverse orientation compared) to other '),
                        F.lit(locus), F.lit(" sequences."),
                    ),
                ),
            ),
            lambda e: e.isNotNull(),
        )
    out = df.withColumn("infos", infos).select(
        "seq_id",
        "sequence",
        "errors",
        "infos",
        F.when(F.size("errors") == 0, F.lit("pending"))
        .otherwise(F.lit("rejected"))
        .alias("status"),
    )
    return out.orderBy("seq_id")


def check_new_profiles(
    rows: DataFrame,
    scheme_loci: list[str],
    existing_alleles: DataFrame,
    existing_profiles: DataFrame | None = None,
    allow_missing_loci: bool = False,
) -> DataFrame:
    """Validate a submitted profile table for one scheme.

    ``rows``: long form (row_id, locus, allele_id — one row per
    designation); ``existing_alleles``: (locus, allele_id);
    ``existing_profiles``: (st, profile array<string>) in
    ``scheme_loci`` order.  Returns one row per submission row:
    ``errors`` array and the assembled ``profile`` array.  Checks
    (SubmissionHandler.pm:624-674): values for
    unknown loci, missing/empty designations, the N/0 policy
    (arbitrary/missing markers rejected unless the scheme allows
    them), undefined alleles, and already-defined profiles via the
    md5 identity (sql/seqdef.sql:1151).
    """
    des = rows.select(
        "row_id", "locus", F.trim(F.regexp_replace("allele_id", '"', "")).alias("allele_id")
    )
    known = des.filter(F.col("locus").isin(scheme_loci))
    unknown = des.filter(~F.col("locus").isin(scheme_loci)).select(
        "row_id",
        F.concat(
            F.lit("Value provided for unknown locus "), F.col("locus"), F.lit(".")
        ).alias("err"),
    )
    nz = F.col("allele_id").isin("N", "0")
    marker_errs = known.filter(F.lit(not allow_missing_loci) & nz).select(
        "row_id",
        F.concat(
            F.when(F.col("allele_id") == "N", F.lit("Arbitrary values (N) are not allowed for locus "))
            .otherwise(F.lit("Missing values (0) are not allowed for locus ")),
            F.col("locus"),
            F.lit("."),
        ).alias("err"),
    )
    empty_errs = known.filter(F.col("allele_id") == "").select(
        "row_id",
        F.concat(F.lit("No value for locus "), F.col("locus"), F.lit(".")).alias("err"),
    )
    # undefined alleles: anti-join the definitions. N/0 markers are
    # excluded here either way: disallowed schemes already rejected
    # them above, allowing schemes auto-define them (:659-662)
    candidates = known.filter((F.col("allele_id") != "") & ~nz)
    undefined = (
        candidates.join(
            existing_alleles.select("locus", "allele_id"), ["locus", "allele_id"], "left_anti"
        )
        .select(
            "row_id",
            F.concat(
                F.col("locus"), F.lit(": "), F.col("allele_id"),
                F.lit(" has not been defined."),
            ).alias("err"),
        )
    )
    # duplicate (row, locus) designations: reported like the reference's
    # duplicate-header-column error (:607-612) and collapsed to the
    # first value below — without the dedup, map_from_arrays would
    # abort the whole batch with a duplicate-map-key RuntimeException
    dup_errs = (
        known.groupBy("row_id", "locus")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .select(
            "row_id",
            F.concat(
                F.lit("Duplicate value provided for locus "),
                F.col("locus"), F.lit("."),
            ).alias("err"),
        )
    )
    first_per_locus = known.groupBy("row_id", "locus").agg(
        F.min("allele_id").alias("allele_id")
    )
    # a locus with NO row at all is as missing as an empty cell
    # (SubmissionHandler.pm:649: every scheme locus must have a value)
    row_ids = des.select("row_id").distinct()
    expected = row_ids.select(
        "row_id",
        F.explode(F.array(*[F.lit(l) for l in scheme_loci])).alias("locus"),
    )
    absent_errs = expected.join(known, ["row_id", "locus"], "left_anti").select(
        "row_id",
        F.concat(F.lit("No value for locus "), F.col("locus"), F.lit(".")).alias("err"),
    )
    # assemble the profile array in scheme-locus order per row
    prof = (
        first_per_locus.groupBy("row_id")
        .agg(
            F.map_from_arrays(
                F.collect_list("locus"), F.collect_list("allele_id")
            ).alias("_m")
        )
        .select(
            "row_id",
            F.array(
                *[F.coalesce(F.col("_m").getItem(l), F.lit("")) for l in scheme_loci]
            ).alias("profile"),
        )
    )
    errs = (
        unknown.unionByName(marker_errs)
        .unionByName(empty_errs)
        .unionByName(undefined)
        .unionByName(dup_errs)
        .unionByName(absent_errs)
    )
    agg_errs = errs.groupBy("row_id").agg(
        F.array_sort(F.collect_list("err")).alias("errors")
    )
    # base on the full row-id set: a row whose designations were ALL
    # unknown loci still needs its (all-empty) profile and its errors
    out = (
        row_ids.join(prof, "row_id", "left")
        .withColumn(
            "profile",
            F.coalesce(
                F.col("profile"), F.array(*[F.lit("") for _ in scheme_loci])
            ),
        )
        .join(agg_errs, "row_id", "left")
        .withColumn(
            "errors", F.coalesce(F.col("errors"), F.array().cast("array<string>"))
        )
    )
    if existing_profiles is not None:
        ex = existing_profiles.select(
            F.col("st").alias("_st"),
            F.md5(F.array_join("profile", ",")).alias("_pmd5"),
        )
        out = out.join(
            ex, F.md5(F.array_join("profile", ",")) == F.col("_pmd5"), "left"
        ).drop("_pmd5")
        out = out.withColumn(
            "errors",
            F.when(
                F.col("_st").isNotNull() & (F.size("errors") == 0),
                F.array(
                    F.concat(
                        F.lit("Profile has already been defined as ST-"),
                        F.col("_st"), F.lit("."),
                    )
                ),
            ).otherwise(F.col("errors")),
        ).drop("_st")
    return out.orderBy("row_id")
