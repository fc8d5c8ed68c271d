"""Dataset / sequence exporters (the reference's Export and
SequenceExport plugins).

- ``dataset_export`` — Plugins/Export.pm:816-1095 _write_tab_text: one
  wide row per isolate with selected provenance fields, allele
  designations per locus (multi-designations sorted numerically when
  every id is an integer, else lexically — :1159-1165 _sort_alleles —
  and joined with ';'), and scheme fields from the derived cache.
- ``concatenated_sequences`` — SequenceExport.pm concatenated FASTA:
  allele sequences joined per record in locus order; missing
  designations ('0'/'N'/'P') contribute the placeholder 'N' (:449-452).
- ``to_xmfa`` — SequenceExport.pm:824-872 _append_sequences: per-locus
  blocks with ``>id:start-end + locus`` headers, cumulative start
  offsets, 60-column wrapping, '=' block terminators. Alignment is an
  ExternalTool concern (MAFFT/MUSCLE in the reference); unaligned
  export works without it, which is also the reference's fallback
  (:853-854).

The joins/pivots are the distributed part; XMFA assembly is driver-side
(it is a download artifact bounded by the reference's own align_limit,
:378-382).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _allele_cmp(l: Column, r: Column) -> Column:
    """Export.pm:1159 _sort_alleles: numeric compare when both ids are
    integers, else string compare."""
    ln, rn = l.try_cast("long"), r.try_cast("long")
    both = ln.isNotNull() & rn.isNotNull()
    return F.when(both, F.signum(ln - rn).cast("int")).otherwise(
        F.when(l < r, F.lit(-1)).when(l > r, F.lit(1)).otherwise(F.lit(0))
    )


def dataset_export(
    isolates: DataFrame,
    fields: list[str],
    designations: DataFrame | None = None,
    loci: list[str] | None = None,
    scheme_cache: DataFrame | None = None,
    scheme_fields: list[str] | None = None,
    id_col: str = "isolate_id",
    locus_col: str = "locus",
    allele_col: str = "allele_id",
) -> DataFrame:
    """The Export-plugin wide table: id + provenance fields, then one
    column per selected locus (sorted multi-designations ';'-joined),
    then scheme fields left-joined from the derived cache (absent ->
    NULL, the reference prints blanks). Column order matches the
    reference's field-then-loci-then-scheme layout (:1040-1072)."""
    out = isolates.select(F.col(id_col), *[F.col(f) for f in fields])
    if designations is not None and loci:
        alleles_wide = (
            designations.groupBy(F.col(id_col))
            .pivot(locus_col, loci)
            .agg(
                F.array_join(
                    F.array_sort(F.collect_list(F.col(allele_col)), _allele_cmp),
                    ";",
                )
            )
        )
        out = out.join(alleles_wide, on=id_col, how="left")
    if scheme_cache is not None and scheme_fields:
        out = out.join(
            scheme_cache.select(id_col, *scheme_fields), on=id_col, how="left"
        )
    return out


MISSING_DESIGNATIONS = ("0", "N", "P")


def _record_sequences(
    designations: DataFrame,
    alleles: DataFrame,
    loci: list[str],
    id_col: str,
    locus_col: str,
    allele_col: str,
) -> DataFrame:
    """(id, locus, seq) for every record × selected locus: allele
    sequence via the (locus, allele_id) equi join; missing designations
    and unknown alleles -> 'N' (SequenceExport.pm:449-452)."""
    spark = designations.sparkSession
    loci_df = F.broadcast(
        spark.createDataFrame(
            [(l, i) for i, l in enumerate(loci)], f"{locus_col} string, _ord int"
        )
    )
    grid = designations.select(id_col).distinct().crossJoin(loci_df)
    # ONE designation per (record, locus) slot — the reference's
    # get_profile_allele_designation returns a single allele; multiple
    # designations take the lowest id (numeric-aware), matching
    # _sort_alleles order. Without this reduction the grid join fans
    # out and a multi-designated locus would emit two sequence segments.
    d = (
        designations.filter(F.col(locus_col).isin(loci))
        .groupBy(id_col, locus_col)
        .agg(
            F.min(
                F.struct(
                    F.coalesce(
                        F.col(allele_col).try_cast("long"),
                        F.lit(2**62),
                    ).alias("_k"),
                    F.col(allele_col).alias("_a"),
                )
            ).alias("_pick")
        )
        .select(id_col, locus_col, F.col("_pick._a").alias("_aid"))
    )
    seqs = alleles.select(
        F.col(locus_col),
        F.col(allele_col).alias("_aid"),
        F.upper(F.col("sequence")).alias("_seq"),
    )
    return (
        grid.join(d, on=[id_col, locus_col], how="left")
        .join(seqs, on=[locus_col, "_aid"], how="left")
        .select(
            id_col,
            locus_col,
            "_ord",
            F.when(
                F.col("_aid").isNull()
                | F.col("_aid").isin(*MISSING_DESIGNATIONS)
                | F.col("_seq").isNull(),
                F.lit("N"),
            )
            .otherwise(F.col("_seq"))
            .alias("seq"),
        )
    )


def concatenated_sequences(
    designations: DataFrame,
    alleles: DataFrame,
    loci: list[str],
    id_col: str = "isolate_id",
    locus_col: str = "locus",
    allele_col: str = "allele_id",
) -> DataFrame:
    """Concatenated FASTA frame: (id, sequence) with allele sequences
    joined in the given locus order — feed to sources/fasta.to_fasta.
    Fully distributed: locus-ordered struct sort inside collect_list."""
    rec = _record_sequences(
        designations, alleles, loci, id_col, locus_col, allele_col
    )
    return (
        rec.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_ord", "seq"))),
                    lambda s: s["seq"],
                ),
                "",
            ).alias("sequence")
        )
    )


def to_xmfa(
    designations: DataFrame,
    alleles: DataFrame,
    loci: list[str],
    id_col: str = "isolate_id",
    locus_col: str = "locus",
    allele_col: str = "allele_id",
    wrap: int = 60,
) -> str:
    """XMFA export (SequenceExport.pm:824-872): one block per locus in
    order, ``>id:start-end + locus`` headers with cumulative start
    offsets, sequences wrapped at 60 columns, '=' after each block.
    Unaligned (the reference's no-aligner fallback); per-locus blocks
    assume equal-length alleles per locus for the offsets to be
    meaningful, as the reference's aligned output guarantees."""
    rows = (
        _record_sequences(designations, alleles, loci, id_col, locus_col, allele_col)
        .orderBy("_ord", id_col)
        .collect()
    )
    by_locus: dict[str, list] = {}
    for r in rows:
        by_locus.setdefault(r[locus_col], []).append(r)
    out: list[str] = []
    start = 1
    for locus in loci:
        block = by_locus.get(locus, [])
        if not block:
            continue
        # per-record end offsets, exactly as the reference computes them
        # (SequenceExport.pm:860-862: $end = $start + length - 1 per
        # sequence); the next block starts after the LAST record's end.
        end = start
        for r in block:
            seq = r["seq"]
            end = start + len(seq) - 1
            out.append(f">{r[id_col]}:{start}-{end} + {locus}")
            for i in range(0, len(seq), wrap):
                out.append(seq[i : i + wrap])
        out.append("=")
        start = end + 1
    return "\n".join(out) + "\n"


def isolate_json_bundles(
    isolates: DataFrame,
    fields: list[str],
    designations: DataFrame | None = None,
    scheme_cache: DataFrame | None = None,
    scheme_fields: list[str] | None = None,
    analysis_results: DataFrame | None = None,
    id_col: str = "id",
    des_id_col: str = "isolate_id",
) -> DataFrame:
    """One self-contained JSON document per isolate — the record
    bundle behind the reference's isolate report/record surfaces
    (Plugins/Reports.pm templates and REST/Routes/Isolates.pm:115-204
    _get_isolate render the same composition record-at-a-time; here it
    is one declarative plan emitting (id, json) for the whole view, so
    a full-corpus report export is a distributed scan, not N queries).

    Bundle shape: ``provenance`` (selected fields, NULLs omitted by
    to_json), ``allele_designations`` as {locus: [allele_id...]}
    (sorted, multi-designations preserved), ``schemes`` (the derived
    cache fields), ``analysis`` as {name: results-json-string}.  Every
    join is keyed on the isolate id; designation/analysis sides
    aggregate to one row per isolate before joining (no fan-out)."""
    out = isolates.select(
        F.col(id_col),
        F.struct(*[F.col(f) for f in fields]).alias("provenance"),
    )
    if designations is not None:
        # canonical designation frames key on isolate_id (clientdb,
        # dataset_export's callers) — alias to the isolates key here;
        # allele ids sort numeric-aware like dataset_export/_sort_alleles
        des = (
            designations.withColumnRenamed(des_id_col, id_col)
            .groupBy(F.col(id_col), "locus")
            .agg(
                F.array_sort(F.collect_list("allele_id"), _allele_cmp).alias("_ids")
            )
            .groupBy(id_col)
            .agg(
                F.map_from_entries(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("locus"), F.col("_ids")))
                    )
                ).alias("allele_designations")
            )
        )
        out = out.join(des, id_col, "left")
    if scheme_cache is not None and scheme_fields:
        sc = scheme_cache.select(
            F.col(id_col),
            F.struct(*[F.col(f) for f in scheme_fields]).alias("schemes"),
        )
        out = out.join(sc, id_col, "left")
    if analysis_results is not None:
        ar = (
            analysis_results.groupBy(F.col("isolate_id").alias(id_col))
            .agg(
                F.map_from_entries(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("name"), F.col("results")))
                    )
                ).alias("analysis")
            )
        )
        out = out.join(ar, id_col, "left")
    payload_cols = [c for c in out.columns if c != id_col]
    return out.select(
        id_col,
        F.to_json(F.struct(*payload_cols)).alias("json"),
    ).orderBy(id_col)
