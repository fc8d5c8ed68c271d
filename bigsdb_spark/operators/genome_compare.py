"""Genome-comparison analysis (the reference's GenomeComparator plugin,
lib/BIGSdb/Plugins/GenomeComparator.pm) — isolate-by-locus comparison
over a long-form designation frame.

Input shape everywhere: one row per (isolate_id, locus) with the
designation value — an allele id string, ``'missing'``, or
``'incomplete'`` (the scan statuses GenomeComparator.pm:890-891 renders
as 'X' and 'I'). The scan itself is seqmatch.scan_contigs_exact /
scan_contigs_partial; these operators consume its output.

Spark-first shapes:
- locus categorization = ONE groupBy over the long frame (map-side
  combined; no per-locus loops — the reference iterates locus × isolate
  in Perl, GenomeComparator.pm:2370-2434);
- pairwise distances = locus-key equi self-join + count aggregation
  (hash join; same scale shape as the D1 profile-distance family);
- the displayed matrix = a pivot of the (bounded, user-selected) locus
  set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NOT_COUNTED = ("missing", "incomplete")


def locus_attributes(
    designations: DataFrame,
    by_ref: bool = False,
    id_col: str = "isolate_id",
    locus_col: str = "locus",
    allele_col: str = "allele_id",
) -> DataFrame:
    """Per-locus categorization (GenomeComparator.pm:2370-2434
    _get_locus_attributes): one aggregation pass producing

    - ``n_variants``        distinct designations among the isolates;
    - ``variable``          >1 distinct designation (:2430);
    - ``missing_in_all``    every isolate 'missing' (:2429);
    - ``identical_in_all``  exactly one designation and it is a real
      allele (not missing/incomplete, :2413-2427); with ``by_ref`` the
      reference genome contributes variant '1' (:2394-2396), so a locus
      is only identical when every isolate equals the reference —
      matching ``identical_in_all_except_ref`` vs ``identical_in_all``;
    - ``identical_except_ref``  one designation ignoring the reference;
    - ``incomplete_in_some`` any isolate 'incomplete' (:2431);
    - ``frequency``          isolates with a non-missing designation.
    """
    a = F.col(allele_col)
    agg = designations.groupBy(locus_col).agg(
        F.count_distinct(a).alias("n_variants"),
        F.max(a).alias("_any"),
        F.max((a != "missing").cast("int")).alias("_present"),
        F.max((a == "incomplete").cast("int")).alias("_incomplete"),
        F.sum((a != "missing").cast("int")).alias("frequency"),
        F.max((a == F.lit("1")).cast("int")).alias("_has_ref"),
    )
    one_real = (F.col("n_variants") == 1) & (~F.col("_any").isin(*NOT_COUNTED))
    # |variants ∪ {ref '1'}| — the reference seeds variants_including_ref
    # with '1' when comparing against an annotated genome (:2394-2396)
    n_with_ref = F.col("n_variants") + F.when(
        F.lit(by_ref) & (F.col("_has_ref") == 0), 1
    ).otherwise(0)
    return agg.select(
        locus_col,
        "n_variants",
        (F.col("n_variants") > 1).alias("variable"),
        (F.col("_present") == 0).alias("missing_in_all"),
        (one_real & (n_with_ref == 1)).alias("identical_in_all"),
        one_real.alias("identical_except_ref"),
        (F.col("_incomplete") == 1).alias("incomplete_in_some"),
        F.col("frequency").cast("long").alias("frequency"),
    )


def pairwise_distances(
    designations: DataFrame,
    exclude_missing: bool = False,
    truncated_pairwise_same: bool = False,
    id_col: str = "isolate_id",
    locus_col: str = "locus",
    allele_col: str = "allele_id",
) -> DataFrame:
    """Isolate-pair difference counts (GenomeComparator.pm:119-151
    count_differences): loci where both sides have a designation and the
    values differ. ``exclude_missing`` skips loci where either side is
    'missing' (:133-135). ``truncated_pairwise_same`` treats
    'incomplete' as compatible with any real allele — a difference is
    only counted when neither side is 'incomplete', or when one side is
    'incomplete' and the other 'missing' (:138-146, the distance-matrix
    option "pairwise same" for truncated loci).

    Locus-key equi self-join -> hash join; per-pair counts map-side
    combine. Returns (id1, id2, differences).
    """
    left = designations.select(
        F.col(id_col).alias("id1"),
        F.col(locus_col).alias("_locus"),
        F.col(allele_col).alias("_a1"),
    )
    right = designations.select(
        F.col(id_col).alias("id2"),
        F.col(locus_col).alias("_locus"),
        F.col(allele_col).alias("_a2"),
    )
    pairs = left.join(right, on="_locus").filter(F.col("id1") < F.col("id2"))
    a1, a2 = F.col("_a1"), F.col("_a2")
    diff = a1 != a2
    if exclude_missing:
        diff = diff & (a1 != "missing") & (a2 != "missing")
    if truncated_pairwise_same:
        diff = diff & (
            ((a1 == "incomplete") & (a2 == "missing"))
            | ((a1 == "missing") & (a2 == "incomplete"))
            | ((a1 != "incomplete") & (a2 != "incomplete"))
        )
    return (
        pairs.groupBy("id1", "id2")
        .agg(F.sum(diff.cast("int")).alias("differences"))
        .select("id1", "id2", F.col("differences").cast("long").alias("differences"))
    )


def comparison_matrix(
    designations: DataFrame,
    loci: list[str],
    id_col: str = "isolate_id",
    locus_col: str = "locus",
    allele_col: str = "allele_id",
) -> DataFrame:
    """The displayed isolate × locus matrix with the reference's render
    codes — 'X' for missing, 'I' for incomplete
    (GenomeComparator.pm:1206-1207). ``loci`` is the (user-selected,
    bounded) column set — pivots with an explicit value list so no
    discovery pass runs."""
    coded = designations.withColumn(
        "_v",
        F.when(F.col(allele_col) == "missing", "X")
        .when(F.col(allele_col) == "incomplete", "I")
        .otherwise(F.col(allele_col)),
    )
    return (
        coded.groupBy(id_col)
        .pivot(locus_col, loci)
        .agg(F.first("_v"))
        .orderBy(id_col)
    )


def gene_presence(
    designations: DataFrame,
    loci: list[str],
    db_designations: DataFrame | None = None,
    tags: DataFrame | None = None,
    id_col: str = "isolate_id",
    locus_col: str = "locus",
    allele_col: str = "allele_id",
) -> DataFrame:
    """Gene presence/absence analysis (Plugins/GenePresence.pm:500-534
    _get_data, :444-450 _create_tsv_output): one row per
    (isolate, locus) over the full grid with the five per-cell flags —

    - ``presence``      a designation exists and is not 'missing';
    - ``complete``      not 'missing'/'incomplete';
    - ``known_allele``  a real, already-defined allele (not a scan-new
      'New#' provisional, not missing/incomplete);
    - ``designated``    the locus has a designation row in the database
      (vs scan-derived) — from ``db_designations`` (isolate_id, locus);
    - ``tagged``        a sequence tag exists — from ``tags``.

    The grid is distinct isolates × the (bounded) locus list, built with
    a broadcast literal frame; absent designations read as 'missing'
    (the scan always emits a status, so absence only occurs for loci
    outside the scanned set). Feed the long frame to comparison_matrix
    or a pivot for the heatmap/pivot-table views.
    """
    spark = designations.sparkSession
    loci_df = F.broadcast(
        spark.createDataFrame([(l,) for l in loci], f"{locus_col} string")
    )
    grid = designations.select(id_col).distinct().crossJoin(loci_df)
    d = designations.select(id_col, locus_col, F.col(allele_col).alias("_v"))
    cell = grid.join(d, on=[id_col, locus_col], how="left").withColumn(
        "_v", F.coalesce(F.col("_v"), F.lit("missing"))
    )
    real = ~F.col("_v").isin(*NOT_COUNTED)
    # a locus can carry several designations (paralogs, updates): the
    # cell's flag is the best evidence any of them provides, and the
    # grid contract (ONE row per isolate × locus) holds regardless
    out = (
        cell.select(
            id_col,
            locus_col,
            (F.col("_v") != "missing").cast("int").alias("presence"),
            real.cast("int").alias("complete"),
            (real & ~F.col("_v").startswith("New")).cast("int").alias(
                "known_allele"
            ),
        )
        .groupBy(id_col, locus_col)
        .agg(
            F.max("presence").alias("presence"),
            F.max("complete").alias("complete"),
            F.max("known_allele").alias("known_allele"),
        )
    )
    for name, frame in (("designated", db_designations), ("tagged", tags)):
        if frame is None:
            out = out.withColumn(name, F.lit(0))
        else:
            flagged = frame.select(id_col, locus_col).distinct().withColumn(
                name, F.lit(1)
            )
            out = out.join(flagged, on=[id_col, locus_col], how="left").withColumn(
                name, F.coalesce(F.col(name), F.lit(0))
            )
    return out


def unique_strains(
    designations: DataFrame,
    id_col: str = "isolate_id",
    locus_col: str = "locus",
    allele_col: str = "allele_id",
) -> DataFrame:
    """Group isolates with identical designations at every locus
    (GenomeComparator.pm:1229 _get_unique_strain_html_table; the A13
    unique-strains semantics): strain fingerprint = md5 over the
    locus-sorted designation list. Returns (strain_fp, n_isolates,
    isolate_ids array) with members sorted for determinism."""
    fp = (
        designations.groupBy(id_col)
        .agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.flatten(
                        F.array_sort(
                            F.collect_list(
                                F.array(F.col(locus_col), F.col(allele_col))
                            )
                        )
                    ),
                )
            ).alias("strain_fp")
        )
    )
    return (
        fp.groupBy("strain_fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_isolates"),
            F.array_sort(F.collect_list(id_col)).alias("isolate_ids"),
        )
    )
