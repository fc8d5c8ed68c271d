"""Export sinks (SURVEY §2.1 S6).

The reference exports result tables as TSV/Excel/FASTA/EMBL
(Utils.pm:407 text2excel, Plugins/Export.pm:816 _write_tab_text,
SeqbinToEMBL.pm). Spark-side: distributed writers for the scalable
formats; Excel is a driver-side pandas conversion (inherently
single-file) gated behind an import-try since openpyxl may be absent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_tsv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S6: tab-separated export with header (the reference's
    _write_tab_text). ``single_file`` coalesces for download-sized
    results; leave False for lakehouse-scale output."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("sep", "\t").option("header", True).csv(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_fasta(df: DataFrame, id_col: str, seq_col: str, path: str) -> None:
    """S6/F7: FASTA export via the formatter in sources/fasta.py."""
    from bigsdb_spark.sources.fasta import to_fasta

    to_fasta(df, id_col, seq_col).coalesce(1).write.mode("overwrite").text(path)


def to_excel(df: DataFrame, path: str, max_rows: int = 1_048_575) -> bool:
    """Driver-side xlsx export (Utils.pm text2excel). Returns False when
    no xlsx engine is available — callers fall back to TSV."""
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        return False
    pdf = df.limit(max_rows).toPandas()
    pdf.to_excel(path, index=False)
    return True


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Lakehouse-style partitioned parquet export — the scale path for
    any result meant to be re-queried (partition pruning for free)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


# ------------------------------------------------- D8 phylogeny exports

def to_nexus_distances(
    pair_dist: DataFrame,
    nodes: list | None = None,
    id1: str = "id1",
    id2: str = "id2",
    dist_col: str = "hamming",
    labels: dict | None = None,
    comment: str | None = None,
) -> str:
    """D8: NEXUS distance-matrix export — the SplitsTree input the
    reference builds in GenomeComparator.pm:1497-1560 (_make_nexus_file):
    lower-triangle matrix with diagonal and labels, ``missing=?`` for
    absent pairs, taxa sorted by id.

    ``pair_dist``: one row per unordered pair (id1 < id2) as produced by
    profiles.profile_pair_distances. ``nodes`` adds taxa with no pair row
    (singletons). The matrix is download-sized by construction (ntaxa
    export), so assembly is driver-side — the distance computation
    itself is the distributed part.

    Byte-stable (no timestamp) unless ``comment`` is passed — golden
    tests pin the exact output.
    """
    rows = pair_dist.select(id1, id2, dist_col).collect()
    dist = {}
    ids = set(nodes or [])
    for r in rows:
        a, b = r[0], r[1]
        ids.add(a)
        ids.add(b)
        dist[(a, b)] = r[2]
        dist[(b, a)] = r[2]
    ordered = sorted(ids)
    labels = labels or {}
    ntax = len(ordered)
    lines = [
        "#NEXUS",
        "[Distance matrix calculated by bigsdb_spark"
        + (f" ({comment})" if comment else "")
        + "]",
        "[Jolley & Maiden 2010 BMC Bioinformatics 11:595]",
        "",
        "BEGIN taxa;",
        f"   DIMENSIONS ntax = {ntax};",
        "",
        "END;",
        "",
        "BEGIN distances;",
        f"   DIMENSIONS ntax = {ntax};",
        "   FORMAT",
        "      triangle=LOWER",
        "      diagonal",
        "      labels",
        "      missing=?",
        "   ;",
        "MATRIX",
    ]
    for i, a in enumerate(ordered):
        cells = [str(labels.get(a, a))]
        for j in range(i + 1):
            b = ordered[j]
            if a == b:
                cells.append("0")
            else:
                d = dist.get((a, b))
                cells.append("?" if d is None else str(d))
        lines.append("\t".join(cells))
    lines.append("   ;")
    lines.append("END;")
    return "\n".join(lines) + "\n"


def to_grapetree_profiles(
    profiles: DataFrame,
    loci: list[str],
    id_col: str = "profile_key",
    profile_col: str = "profile",
) -> str:
    """D8: GrapeTree/MSTree profile file
    (GrapeTree.pm:324-380 generate_profile_file): header
    ``#isolate<TAB>locus...``, one row per isolate, missing designations
    as ``-``, incomplete as ``I``, multi-designations take the lowest
    (first) value. Raises when every profile is identical — GrapeTree
    cannot build a tree from one point (the reference throws the same
    way, :382-388).
    """
    rows = profiles.select(id_col, profile_col).orderBy(id_col).collect()
    out = ["#isolate\t" + "\t".join(loci)]
    seen = set()
    for r in rows:
        vals = []
        for v in list(r[1])[: len(loci)]:
            if v is None or v == "missing":
                v = "-"
            elif v == "incomplete":
                v = "I"
            elif isinstance(v, str) and ";" in v:
                v = v.split(";")[0]
            vals.append(str(v))
        while len(vals) < len(loci):
            vals.append("-")
        seen.add(tuple(vals))
        out.append(str(r[0]) + "\t" + "\t".join(vals))
    # any input without >= 2 DISTINCT profiles cannot build a tree —
    # including the single-isolate and empty cases (GrapeTree.pm:382-388
    # raises the typed error for all of them, not just identical rows)
    if len(seen) <= 1:
        raise ValueError(
            "All isolates are identical at selected loci. Cannot generate tree."
        )
    return "\n".join(out) + "\n"


def _all_ints(values) -> bool:
    """Numeric-aware sort guard (Utils.pm:853 all_ints): ITOL legends
    sort numerically when every distinct value is an integer string."""
    try:
        for v in values:
            int(str(v))
        return True
    except (TypeError, ValueError):
        return False


def _rainbow_colour(i: int, n: int) -> str:
    """i-th of n colours on a red->violet rainbow ramp as ``#rrggbb``.

    Functional equivalent of Utils.pm:581 get_rainbow_gradient_colour
    (which interpolates a fixed 256-step ramp); computed here from HSV
    so every distinct value gets an evenly-spaced, deterministic hue.
    """
    import colorsys

    frac = (i / n) if n else 0.0
    r, g, b = colorsys.hsv_to_rgb(0.83 * frac, 1.0, 1.0)
    return "#{:02x}{:02x}{:02x}".format(int(r * 255), int(g * 255), int(b * 255))


def to_itol_dataset(
    df: DataFrame,
    id_col: str,
    value_col: str,
    dataset_type: str = "text_label",
    label: str | None = None,
    colour: str = "#000000",
) -> str:
    """D8: iTOL annotation-dataset export (ITOL.pm:811-1035
    _create_itol_dataset): DATASET_TEXT / DATASET_COLORSTRIP header,
    tab separator, one rainbow colour per distinct value (numeric-aware
    value ordering), LEGEND block for colour strips, then DATA rows —
    ``id<TAB>value<TAB>-1<TAB>colour<TAB>normal<TAB>1`` for text labels
    (ITOL.pm:1028 text_label_output) and ``id<TAB>colour<TAB>value``
    for strips (:1033 colour_strips_output). Null values are skipped
    (:980). Annotation files are per-tree download artifacts, so row
    assembly is driver-side; the distinct-value scan is the Spark part.
    """
    kinds = {"text_label": "TEXT", "colour_strips": "COLORSTRIP"}
    if dataset_type not in kinds:
        raise ValueError(f"dataset_type must be one of {sorted(kinds)}")
    label = label or value_col
    distinct = [
        r[0]
        for r in df.select(value_col).dropna().distinct().collect()
    ]
    distinct.sort(key=(lambda v: int(str(v))) if _all_ints(distinct) else str)
    value_colour = {
        v: _rainbow_colour(i + 1, len(distinct)) for i, v in enumerate(distinct)
    }
    lines = [
        f"DATASET_{kinds[dataset_type]}",
        "SEPARATOR TAB",
        f"DATASET_LABEL\t{label}",
        f"COLOR\t{colour}",
    ]
    if dataset_type == "colour_strips":
        # ITOL.pm:1009 colour_strips_init
        lines.append(f"LEGEND_TITLE\t{label}")
        lines.append("LEGEND_SHAPES\t" + "\t".join(["2"] * len(distinct)))
        lines.append(
            "LEGEND_COLORS\t" + "\t".join(value_colour[v] for v in distinct)
        )
        lines.append("LEGEND_LABELS\t" + "\t".join(str(v) for v in distinct))
        lines.append("BORDER_WIDTH\t1")
    lines.append("DATA")
    rows = df.select(id_col, value_col).dropna().orderBy(id_col).collect()
    for r in rows:
        ident = str(r[0]).replace(",", "_")  # ITOL.pm:999
        if dataset_type == "text_label":
            lines.append(
                f"{ident}\t{r[1]}\t-1\t{value_colour[r[1]]}\tnormal\t1"
            )
        else:
            lines.append(f"{ident}\t{value_colour[r[1]]}\t{r[1]}")
    return "\n".join(lines) + "\n"


def to_microreact_tsv(
    df: DataFrame,
    id_col: str,
    fields: list[str],
    country_col: str | None = None,
    iso3166: dict | None = None,
    geo_col: str | None = None,
) -> str:
    """D8: Microreact metadata TSV (Microreact.pm:198-310
    _create_tsv_file): selected provenance fields with underscores
    rendered as spaces in the header, an ``iso3166`` column when a
    country field is mapped (the reference carries a country->ISO code
    table; pass the deployment's mapping), and ``__latitude`` /
    ``__longitude`` split from a geography point struct column."""
    cols = [F.col(id_col)] + [F.col(f) for f in fields]
    header = [id_col.replace("_", " ")] + [f.replace("_", " ") for f in fields]
    if country_col is not None:
        cols.append(F.col(country_col).alias("_country"))
        header.append("iso3166")
    if geo_col is not None:
        cols.append(F.col(f"{geo_col}.lat").alias("__latitude"))
        cols.append(F.col(f"{geo_col}.lon").alias("__longitude"))
        header += ["__latitude", "__longitude"]
    rows = df.select(*cols).orderBy(id_col).collect()
    iso3166 = iso3166 or {}
    out = ["\t".join(header)]
    for r in rows:
        vals = [("" if v is None else str(v)) for v in r]
        if country_col is not None:
            ci = 1 + len(fields)
            vals[ci] = iso3166.get(r[ci], "") if r[ci] is not None else ""
        out.append("\t".join(vals))
    return "\n".join(out) + "\n"


def microreact_payload(
    tsv: str,
    newick: str,
    name: str,
    description: str = "",
    website: str = "",
    email: str | None = None,
) -> dict:
    """D8: the Microreact project-upload JSON body
    (Microreact.pm:124-131 _microreact_upload). The HTTP POST itself is
    a deployment concern (network + access token); this returns the
    payload the uploader sends."""
    payload = {
        "name": name,
        "description": description,
        "website": website,
        "data": tsv,
        "tree": newick,
    }
    if email:
        payload["email"] = email
    return payload


def to_newick_upgma(
    pair_dist: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    dist_col: str = "hamming",
    labels: dict | None = None,
    max_taxa: int = 10_000,
) -> str:
    """D8: UPGMA dendrogram over a pair-distance frame, as Newick with
    branch lengths — the tree the reference builds single-node from the
    same distances (ITOL.pm:442 _generate_tree_files_from_profiles;
    Microreact NJ via clustalw). The distance matrix is the distributed
    part (profiles.profile_pair_distances); tree assembly is O(n²)
    driver-side over the (download-sized) taxa set, guarded by
    ``max_taxa``. Deterministic: merge ties break on sorted member ids.
    """
    rows = pair_dist.select(id1, id2, dist_col).collect()
    dist: dict = {}
    ids: set = set()
    for r in rows:
        a, b = str(r[0]), str(r[1])
        ids.add(a)
        ids.add(b)
        key = (a, b) if a < b else (b, a)
        dist[key] = float(r[2])
    if len(ids) > max_taxa:
        raise ValueError(
            f"{len(ids)} taxa exceeds max_taxa={max_taxa}; "
            "aggregate to distinct profiles first"
        )
    labels = {str(k): v for k, v in (labels or {}).items()}
    # cluster state: name -> (newick, height, n_members). Distances kept
    # as a running matrix with Lance-Williams average-linkage updates
    # (d(a∪b, c) = (na·d(a,c) + nb·d(b,c)) / (na+nb)) — exact UPGMA,
    # O(n) update per merge instead of re-averaging member pairs.
    clusters = {i: (labels.get(i, i), 0.0, 1) for i in sorted(ids)}

    def d(x, y):
        return dist.get((x, y) if x < y else (y, x), float("inf"))

    while len(clusters) > 1:
        names = sorted(clusters)
        best = None
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                dd = d(names[i], names[j])
                if best is None or dd < best[0]:
                    best = (dd, names[i], names[j])
        dd, na, nb = best
        if dd == float("inf"):
            # a missing pair distance would otherwise flow through the
            # Lance-Williams updates and emit ':inf' branch lengths
            raise ValueError(
                f"no distance between clusters {na!r} and {nb!r}: "
                "UPGMA needs a complete pairwise distance input"
            )
        (ta, ha, ca), (tb, hb, cb) = clusters.pop(na), clusters.pop(nb)
        h = dd / 2.0
        new = min(na, nb)
        for other in clusters:
            merged_d = (ca * d(na, other) + cb * d(nb, other)) / (ca + cb)
            dist[(new, other) if new < other else (other, new)] = merged_d
        clusters[new] = (
            f"({ta}:{h - ha:g},{tb}:{h - hb:g})",
            h,
            ca + cb,
        )
    return next(iter(clusters.values()))[0] + ";\n"


# ------------------------------------------ S6 seqbin EMBL/GFF3 exports

def _orf_to_phase(orf_col):
    """BIGSdb stores ORF as 1-6; EMBL/GFF expect frame/phase 0-2
    (SeqbinToEMBL.pm:133-137, SeqbinToGFF3.pm:120-124): 2/5 -> 1,
    3/6 -> 2, else 0."""
    o = F.coalesce(orf_col.cast("int"), F.lit(0))
    return (
        F.when(o.isin(2, 5), F.lit(1))
        .when(o.isin(3, 6), F.lit(2))
        .otherwise(F.lit(0))
    )


def _opt(df: DataFrame, name: str, default):
    return F.col(name) if name in df.columns else default


def gff3_feature_lines(
    contigs: DataFrame,
    tags: DataFrame,
    source: str = "bigsdb_spark",
    igv: bool = False,
) -> DataFrame:
    """S6/D8: tag-annotated contig export, GFF3 feature rows
    (SeqbinToGFF3.pm:56-150 _write_gff3). One output row per tag:
    (seqbin_id, start_pos, line) — entirely column expressions, so the
    rendering scales with the tag table (no driver loop, no UDF).

    Reference semantics: positions clamped to [1, contig length]; ORF
    1-6 -> phase 0-2; strand '-' when reverse; attributes
    ``locus_tag=`` (``locus=`` for IGV), ``;incomplete=1`` when the tag
    is partial, ``;product=`` with [;|=] -> '_', ``;Alias=`` joined
    with ','; type CDS when the locus is a complete CDS else '.'.
    Reference quirk kept deliberately: Alias is nested under the
    product branch (SeqbinToGFF3.pm:133-138 only appends ``;Alias=``
    inside ``if ($locus_desc->{'product'})``), so a tag with aliases
    but no product emits no Alias attribute — pinned by test.

    ``contigs``: (seqbin_id, sequence). ``tags``: (seqbin_id, locus,
    start_pos, end_pos, reverse, complete) + optional orf, product,
    aliases array<string>, complete_cds.
    """
    lens = contigs.select(
        F.col("seqbin_id"), F.length("sequence").alias("_seq_len")
    )
    t = tags.join(lens, on="seqbin_id")
    start = F.greatest(F.col("start_pos"), F.lit(1))
    end = F.least(F.col("end_pos"), F.col("_seq_len"))
    product = _opt(t, "product", F.lit(None).cast("string"))
    aliases = _opt(t, "aliases", F.lit(None).cast("array<string>"))
    att_key = "locus" if igv else "locus_tag"
    att = F.concat(
        F.lit(att_key + "="), F.col("locus"),
        F.when(~F.col("complete"), F.lit(";incomplete=1")).otherwise(F.lit("")),
        F.when(
            product.isNotNull(),
            F.concat(
                F.lit(";product="),
                F.regexp_replace(product, "[;|=]", "_"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            product.isNotNull() & (F.size(F.coalesce(aliases, F.array())) > 0),
            F.concat(F.lit(";Alias="), F.array_join(aliases, ",")),
        ).otherwise(F.lit("")),
    )
    ftype = F.when(
        _opt(t, "complete_cds", F.lit(False)), F.lit("CDS")
    ).otherwise(F.lit("."))
    line = F.concat_ws(
        "\t",
        F.col("seqbin_id").cast("string"),
        F.lit(source),
        ftype,
        start.cast("string"),
        end.cast("string"),
        F.lit("."),
        F.when(F.col("reverse"), F.lit("-")).otherwise(F.lit("+")),
        _orf_to_phase(_opt(t, "orf", F.lit(0))).cast("string"),
        att,
    )
    return t.select("seqbin_id", start.alias("start_pos"), line.alias("line"))


def to_gff3(
    contigs: DataFrame,
    tags: DataFrame,
    source: str = "bigsdb_spark",
    igv: bool = False,
) -> str:
    """Assembled GFF3 document: ##gff-version 3 header, one
    ##sequence-region per contig, features ordered by
    (seqbin_id, start_pos) — the reference's per-isolate download
    (SeqbinToGFF3.pm print_content). Download-sized by contract (one
    isolate's contigs); the line rendering above is the distributed
    part, this collects it."""
    regions = {
        r["seqbin_id"]: r["_seq_len"]
        for r in contigs.select(
            "seqbin_id", F.length("sequence").alias("_seq_len")
        ).collect()
    }
    feats = gff3_feature_lines(contigs, tags, source=source, igv=igv)
    by_contig: dict = {}
    for r in feats.orderBy("seqbin_id", "start_pos", "line").collect():
        by_contig.setdefault(r["seqbin_id"], []).append(r["line"])
    out = ["##gff-version 3"]
    for sid in sorted(regions):
        out.append(f"##sequence-region {sid} 1 {regions[sid]}")
        out.extend(by_contig.get(sid, []))
    return "\n".join(out) + "\n"


def embl_records(
    contigs: DataFrame, tags: DataFrame, fmt: str = "embl"
) -> DataFrame:
    """S6: EMBL or GenBank flat-file records, one per contig, rendered
    distributed (SeqbinToEMBL.pm:107-202 _write_embl builds a Bio::Seq
    with one CDS feature per tag and streams Bio::SeqIO output in the
    requested format — ``format=genbank`` selects GenBank, :33-37; here
    the record text is assembled per contig inside an Arrow-batched
    mapInPandas after a single tags->contig aggregation — formatting
    scales with the seqbin table).

    ``contigs``: (seqbin_id, sequence) + optional comments,
    accessions array<string>. ``tags`` as for gff3_feature_lines.
    Returns (seqbin_id, record).
    """
    import pandas as pd

    if fmt not in ("embl", "genbank"):
        raise ValueError(f"unknown format: {fmt}")

    t = tags.select(
        "seqbin_id",
        F.struct(
            F.col("start_pos"),
            F.col("locus"),
            F.col("end_pos"),
            F.col("reverse").cast("boolean").alias("reverse"),
            _orf_to_phase(_opt(tags, "orf", F.lit(0))).alias("phase"),
            _opt(tags, "product", F.lit(None).cast("string")).alias("product"),
            _opt(tags, "note", F.lit(None).cast("string")).alias("note"),
        ).alias("f"),
    )
    feats = t.groupBy("seqbin_id").agg(
        F.sort_array(F.collect_list("f")).alias("features")
    )
    src = contigs.select(
        "seqbin_id",
        "sequence",
        _opt(contigs, "comments", F.lit(None).cast("string")).alias("comments"),
        _opt(contigs, "accessions", F.lit(None).cast("array<string>")).alias(
            "accessions"
        ),
    ).join(feats, on="seqbin_id", how="left")

    def _feature_lines(row, n, key_pad, qual_pad):
        lines = []
        for f in row["features"] if row["features"] is not None else []:
            start = max(int(f["start_pos"]), 1)
            end = min(int(f["end_pos"]), n) if n else int(f["end_pos"])
            loc = f"{start}..{end}"
            if f["reverse"]:
                loc = f"complement({loc})"
            lines.append(f"{key_pad}CDS             {loc}")
            lines.append(f'{qual_pad}/gene="{f["locus"]}"')
            lines.append(f"{qual_pad}/codon_start={int(f['phase']) + 1}")
            if f["product"]:
                lines.append(f'{qual_pad}/product="{f["product"]}"')
            if f["note"]:
                lines.append(f'{qual_pad}/note="{f["note"]}"')
        return lines

    def _render(pdf: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_recs = [], []
        for _, row in pdf.iterrows():
            seq = (row["sequence"] or "").lower()
            n = len(seq)
            sid = row["seqbin_id"]
            # Arrow hands array<string> cells to pandas as numpy arrays,
            # whose truth value is ambiguous for len >= 2 — an
            # `arr or []` here would crash the worker on any contig
            # with two accessions; test None/length explicitly
            accs = row["accessions"]
            acc = [str(sid)] + (
                [str(a) for a in accs] if accs is not None and len(accs) else []
            )
            if fmt == "embl":
                lines = [
                    f"ID   {sid}; SV 1; linear; unassigned DNA; STD; UNC; {n} BP.",
                    "XX",
                    f"AC   {'; '.join(acc)};",
                    "XX",
                ]
                if row["comments"]:
                    lines += [f"DE   {row['comments']}", "XX"]
                lines += ["FH   Key             Location/Qualifiers", "FH"]
                lines += _feature_lines(
                    row, n, "FT   ", "FT                   "
                )
                counts = {b: seq.count(b) for b in "acgt"}
                other = n - sum(counts.values())
                lines += [
                    "XX",
                    f"SQ   Sequence {n} BP; {counts['a']} A; {counts['c']} C; "
                    f"{counts['g']} G; {counts['t']} T; {other} other;",
                ]
                for i in range(0, n, 60):
                    chunk = seq[i : i + 60]
                    groups = " ".join(
                        chunk[j : j + 10] for j in range(0, len(chunk), 10)
                    )
                    pos = str(min(i + 60, n))
                    pad = 80 - 5 - len(groups) - len(pos)
                    lines.append("     " + groups + " " * max(pad, 1) + pos)
            else:  # genbank
                lines = [
                    f"LOCUS       {sid} {n} bp    DNA     linear   UNC",
                ]
                if row["comments"]:
                    lines.append(f"DEFINITION  {row['comments']}.")
                lines.append(f"ACCESSION   {' '.join(acc)}")
                lines.append("FEATURES             Location/Qualifiers")
                lines += _feature_lines(
                    row, n, "     ", "                     "
                )
                lines.append("ORIGIN      ")
                for i in range(0, n, 60):
                    chunk = seq[i : i + 60]
                    groups = " ".join(
                        chunk[j : j + 10] for j in range(0, len(chunk), 10)
                    )
                    lines.append(f"{i + 1:>9} {groups}")
            lines.append("//")
            out_ids.append(sid)
            out_recs.append("\n".join(lines) + "\n")
        return pd.DataFrame({"seqbin_id": out_ids, "record": out_recs})

    id_type = src.schema["seqbin_id"].dataType.simpleString()
    # src is one row per contig already (tags were pre-aggregated), so
    # mapInPandas renders in place — no extra shuffle like a
    # groupBy().applyInPandas would add
    return src.mapInPandas(
        lambda batches: (_render(pdf) for pdf in batches),
        schema=f"seqbin_id {id_type}, record string",
    )


def to_embl(contigs: DataFrame, tags: DataFrame, fmt: str = "embl") -> str:
    """Concatenated EMBL/GenBank records ordered by seqbin_id — the
    reference's per-isolate download stream (SeqbinToEMBL.pm
    print_content; ``format=genbank`` selects GenBank). Download-sized
    by contract; embl_records is the scale path."""
    return "".join(
        r["record"]
        for r in embl_records(contigs, tags, fmt=fmt)
        .orderBy("seqbin_id")
        .collect()
    )


def write_gff3(
    contigs: DataFrame,
    tags: DataFrame,
    path: str,
    source: str = "bigsdb_spark",
    igv: bool = False,
) -> None:
    """Distributed GFF3 write — the scale path for bulk tag-annotated
    export (the string ``to_gff3`` is the per-isolate download). Feature
    lines land partitioned by rendering task; readers that need
    per-contig grouping sort on (seqbin_id, start_pos), which the line
    columns carry."""
    gff3_feature_lines(contigs, tags, source=source, igv=igv).select(
        "line"
    ).write.mode("overwrite").text(path)


def write_embl(
    contigs: DataFrame, tags: DataFrame, path: str, fmt: str = "embl"
) -> None:
    """Distributed EMBL/GenBank write: one flat-file record per contig,
    one output row per record (records contain newlines; stored as a
    single text column per contig in parquet so the record boundary
    survives — plain .text would split on the internal newlines)."""
    embl_records(contigs, tags, fmt=fmt).write.mode("overwrite").parquet(path)


# --------------------------------------------- profile / allele table exports

def profile_export_frame(
    profiles: DataFrame,
    loci: list[str],
    field_cols: list[str] | None = None,
    class_groups: DataFrame | None = None,
    cg_scheme_names: list[str] | None = None,
    lincodes: DataFrame | None = None,
    lincode_prefixes: DataFrame | None = None,
    lincode_field_types: dict[str, str] | None = None,
    id_col: str = "profile_key",
    profile_col: str = "profile",
) -> DataFrame:
    """ProfileExport plugin parity (Plugins/ProfileExport.pm:180-280):
    one wide row per profile — pk, per-locus allele columns, scheme
    fields, one column per classification scheme (group id or empty),
    the ``LINcode`` joined with ``_`` and one column per LIN-code
    prefix field (distinct typed-sorted values joined with ``; `` —
    _get_lincode_values, :339-375).

    Unlike the reference's per-profile query loop this is a single
    declarative plan: the profile array fans out to columns in the
    projection, classification groups and LIN codes attach by
    broadcast joins (both are profile-keyed metadata, orders of
    magnitude smaller than 100 TB fact data), and the prefix match is
    a broadcast theta-join against the bounded prefix registry —
    exactly the reference's LIKE-prefix SQL (:349-352), but evaluated
    once for all profiles instead of once per profile.
    """
    field_cols = field_cols or []
    out = profiles.select(
        F.col(id_col),
        *[F.col(profile_col)[i].alias(locus) for i, locus in enumerate(loci)],
        *[F.col(c) for c in field_cols],
    )
    if class_groups is not None:
        # (cg_name, group_id, profile_id) -> one column per cg scheme
        names = cg_scheme_names or [
            r[0]
            for r in class_groups.select("cg_name").distinct().orderBy("cg_name").collect()
        ]
        cg_wide = (
            class_groups.groupBy(F.col("profile_id").alias("_cg_pid"))
            .pivot("cg_name", names)
            .agg(F.first("group_id"))
        )
        out = out.join(
            F.broadcast(cg_wide), out[id_col] == cg_wide["_cg_pid"], "left"
        ).drop("_cg_pid")
    if lincodes is not None:
        lc = lincodes.select(
            F.col("profile_id").alias("_lc_pid"),
            F.array_join("lincode", "_").alias("LINcode"),
        )
        out = out.join(F.broadcast(lc), out[id_col] == lc["_lc_pid"], "left").drop(
            "_lc_pid"
        )
        if lincode_prefixes is not None:
            types = lincode_field_types or {}
            fields = [
                r[0]
                for r in lincode_prefixes.select("field").distinct().orderBy("field").collect()
            ]
            # prefix matches when the code equals it or extends it at a
            # "_" boundary (ProfileExport.pm:349-352's LIKE with escaped _)
            pm = lc.join(
                F.broadcast(lincode_prefixes),
                (F.col("LINcode") == F.col("prefix"))
                | F.col("LINcode").startswith(F.concat(F.col("prefix"), F.lit("_"))),
                "inner",
            )
            per_field = []
            for fld in fields:
                is_int = types.get(fld) == "integer"
                val = F.col("value").cast("int") if is_int else F.col("value")
                vals = (
                    pm.filter(F.col("field") == fld)
                    .groupBy("_lc_pid")
                    .agg(
                        F.array_join(
                            F.transform(
                                F.array_sort(F.collect_set(val)), lambda v: v.cast("string")
                            ),
                            "; ",
                        ).alias(fld)
                    )
                )
                per_field.append(vals)
            for vals in per_field:
                out = out.join(
                    F.broadcast(vals), out[id_col] == vals["_lc_pid"], "left"
                ).drop("_lc_pid")
    return out.orderBy(id_col)


def allele_table_frame(
    sequences: DataFrame,
    ext_attributes: DataFrame | None = None,
    flags: DataFrame | None = None,
    refs: DataFrame | None = None,
    locus: str | None = None,
) -> DataFrame:
    """SeqTableExport plugin parity (Plugins/SeqTableExport.pm:100-127):
    the allele attribute table — core columns plus sequence length
    (:149), one column per extended attribute (:169), semicolon-joined
    PubMed ids (:125) and space-joined allele flags (:127).

    ``sequences``: (locus, allele_id, sequence, status, ...);
    ``ext_attributes``: (locus, allele_id, attribute, value);
    ``flags``: (locus, allele_id, flag); ``refs``: (locus, allele_id,
    pubmed_id).  The three annotation sides are allele-keyed metadata
    — broadcast joins; the pivot's column set comes from the bounded
    attribute registry, not the data.
    """
    df = sequences
    if locus is not None:
        df = df.filter(F.col("locus") == locus)
    out = df.withColumn("length", F.length("sequence"))
    key = ["locus", "allele_id"]
    if ext_attributes is not None:
        attrs = [
            r[0]
            for r in ext_attributes.select("attribute").distinct().orderBy("attribute").collect()
        ]
        wide = (
            ext_attributes.groupBy(
                F.col("locus").alias("_ea_locus"), F.col("allele_id").alias("_ea_aid")
            )
            .pivot("attribute", attrs)
            .agg(F.first("value"))
        )
        out = out.join(
            F.broadcast(wide),
            (out["locus"] == wide["_ea_locus"]) & (out["allele_id"] == wide["_ea_aid"]),
            "left",
        ).drop("_ea_locus", "_ea_aid")
    if refs is not None:
        pm = refs.groupBy(
            F.col("locus").alias("_r_locus"), F.col("allele_id").alias("_r_aid")
        ).agg(
            F.array_join(
                F.array_sort(F.collect_set(F.col("pubmed_id").cast("string"))), "; "
            ).alias("PubMed")
        )
        out = out.join(
            F.broadcast(pm),
            (out["locus"] == pm["_r_locus"]) & (out["allele_id"] == pm["_r_aid"]),
            "left",
        ).drop("_r_locus", "_r_aid")
    if flags is not None:
        fl = flags.groupBy(
            F.col("locus").alias("_f_locus"), F.col("allele_id").alias("_f_aid")
        ).agg(F.array_join(F.array_sort(F.collect_set("flag")), " ").alias("flags"))
        out = out.join(
            F.broadcast(fl),
            (out["locus"] == fl["_f_locus"]) & (out["allele_id"] == fl["_f_aid"]),
            "left",
        ).drop("_f_locus", "_f_aid")
    return out.orderBy(*key)
