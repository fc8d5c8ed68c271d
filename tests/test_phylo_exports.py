"""D8 phylogeny-export formatters: iTOL annotation datasets, Microreact
TSV/payload, UPGMA Newick. Golden-file style — byte-stable outputs."""

from __future__ import annotations

import pytest

from bigsdb_spark.sources.sinks import (
    _rainbow_colour,
    microreact_payload,
    to_itol_dataset,
    to_microreact_tsv,
    to_newick_upgma,
)


@pytest.fixture(scope="module")
def iso_df(spark):
    return spark.createDataFrame(
        [
            (1, "ST-1", "France", 2019, (48.85, 2.35)),
            (2, "ST-2", "Kenya", 2020, (-1.29, 36.82)),
            (3, "ST-1", None, 2020, None),
        ],
        "id int, st string, country string, year int, "
        "location struct<lat:double,lon:double>",
    )


def test_itol_text_label_golden(iso_df):
    out = to_itol_dataset(iso_df, "id", "st", "text_label", label="ST")
    c1, c2 = _rainbow_colour(1, 2), _rainbow_colour(2, 2)
    assert out == (
        "DATASET_TEXT\n"
        "SEPARATOR TAB\n"
        "DATASET_LABEL\tST\n"
        "COLOR\t#000000\n"
        "DATA\n"
        f"1\tST-1\t-1\t{c1}\tnormal\t1\n"
        f"2\tST-2\t-1\t{c2}\tnormal\t1\n"
        f"3\tST-1\t-1\t{c1}\tnormal\t1\n"
    )


def test_itol_colour_strip_numeric_sort_and_null_skip(iso_df):
    out = to_itol_dataset(iso_df, "id", "year", "colour_strips", label="year")
    lines = out.splitlines()
    assert lines[0] == "DATASET_COLORSTRIP"
    # numeric-aware legend order: 2019 before 2020
    assert lines[7] == "LEGEND_LABELS\t2019\t2020"
    assert lines[4] == "LEGEND_TITLE\tyear"
    assert lines[5] == "LEGEND_SHAPES\t2\t2"
    assert lines[8] == "BORDER_WIDTH\t1"
    data = lines[lines.index("DATA") + 1 :]
    assert len(data) == 3  # no nulls in year
    assert data[0].startswith("1\t#") and data[0].endswith("\t2019")
    # distinct colours per distinct value
    assert data[0].split("\t")[1] != data[1].split("\t")[1]
    # same value -> same colour
    assert data[1].split("\t")[1] == data[2].split("\t")[1]


def test_itol_rejects_unknown_type(iso_df):
    with pytest.raises(ValueError):
        to_itol_dataset(iso_df, "id", "st", "heatmap")


def test_microreact_tsv_golden(iso_df):
    out = to_microreact_tsv(
        iso_df,
        "id",
        ["st", "year"],
        country_col="country",
        iso3166={"France": "FR", "Kenya": "KE"},
        geo_col="location",
    )
    assert out == (
        "id\tst\tyear\tiso3166\t__latitude\t__longitude\n"
        "1\tST-1\t2019\tFR\t48.85\t2.35\n"
        "2\tST-2\t2020\tKE\t-1.29\t36.82\n"
        "3\tST-1\t2020\t\t\t\n"
    )


def test_microreact_payload_shape():
    p = microreact_payload("tsv-data", "(a,b);", "proj", email="x@example.org")
    assert p == {
        "name": "proj",
        "description": "",
        "website": "",
        "data": "tsv-data",
        "tree": "(a,b);",
        "email": "x@example.org",
    }
    assert "email" not in microreact_payload("t", "n", "p")


def test_upgma_newick_golden(spark):
    # classic worked example: d(A,B)=2, d(A,C)=d(B,C)=6 -> ((A,B),C)
    pairs = spark.createDataFrame(
        [("A", "B", 2.0), ("A", "C", 6.0), ("B", "C", 6.0)],
        "id1 string, id2 string, hamming double",
    )
    assert to_newick_upgma(pairs) == "((A:1,B:1):2,C:3);\n"


def test_upgma_average_linkage(spark):
    # UPGMA averages cluster distances: d(AB,C) = (4+6)/2 = 5
    pairs = spark.createDataFrame(
        [("A", "B", 2.0), ("A", "C", 4.0), ("B", "C", 6.0)],
        "id1 string, id2 string, hamming double",
    )
    assert to_newick_upgma(pairs) == "((A:1,B:1):1.5,C:2.5);\n"


def test_upgma_max_taxa_guard(spark):
    pairs = spark.createDataFrame(
        [("A", "B", 1.0)], "id1 string, id2 string, hamming double"
    )
    with pytest.raises(ValueError):
        to_newick_upgma(pairs, max_taxa=1)


def test_upgma_labels(spark):
    pairs = spark.createDataFrame(
        [("1", "2", 2.0)], "id1 string, id2 string, hamming double"
    )
    out = to_newick_upgma(pairs, labels={"1": "iso_one", "2": "iso_two"})
    assert out == "(iso_one:1,iso_two:1);\n"


@pytest.fixture(scope="module")
def seqbin(spark):
    contigs = spark.createDataFrame(
        [
            (1, "atgcatgcat" * 7, "chromosome fragment", ["AB123"]),
            (2, "acgt" * 5, None, None),
        ],
        "seqbin_id int, sequence string, comments string, "
        "accessions array<string>",
    )
    tags = spark.createDataFrame(
        [
            (1, "abcZ", 5, 25, False, True, 2,
             "alcohol dehydrogenase", ["adh1"], True),
            (1, "adk", -3, 200, True, False, 1, None, None, False),
            (2, "pgm", 2, 10, False, True, 6,
             "phospho;glucomutase", ["pgm2", "pgmA"], True),
        ],
        "seqbin_id int, locus string, start_pos int, end_pos int, "
        "reverse boolean, complete boolean, orf int, product string, "
        "aliases array<string>, complete_cds boolean",
    )
    return contigs, tags


def test_gff3_golden(seqbin):
    """SeqbinToGFF3.pm semantics: position clamping, ORF 1-6 -> phase,
    strand, incomplete flag, product sanitization, Alias list, CDS vs
    '.' type, per-contig ##sequence-region headers."""
    from bigsdb_spark.sources.sinks import to_gff3

    contigs, tags = seqbin
    assert to_gff3(contigs, tags, source="src") == (
        "##gff-version 3\n"
        "##sequence-region 1 1 70\n"
        "1\tsrc\t.\t1\t70\t.\t-\t0\tlocus_tag=adk;incomplete=1\n"
        "1\tsrc\tCDS\t5\t25\t.\t+\t1\t"
        "locus_tag=abcZ;product=alcohol dehydrogenase;Alias=adh1\n"
        "##sequence-region 2 1 20\n"
        "2\tsrc\tCDS\t2\t10\t.\t+\t2\t"
        "locus_tag=pgm;product=phospho_glucomutase;Alias=pgm2,pgmA\n"
    )


def test_gff3_igv_attribute_key(seqbin):
    from bigsdb_spark.sources.sinks import to_gff3

    contigs, tags = seqbin
    out = to_gff3(contigs, tags, igv=True)
    assert "locus=adk" in out and "locus_tag" not in out


def test_embl_golden_small_contig(seqbin):
    """Byte-stable EMBL record: ID/AC/FH skeleton, CDS feature with
    gene + codon_start (ORF 6 -> phase 2 -> codon_start 3), base-count
    SQ header, 60-base lines with right-aligned position column."""
    from bigsdb_spark.sources.sinks import embl_records

    contigs, tags = seqbin
    recs = {
        r["seqbin_id"]: r["record"] for r in embl_records(contigs, tags).collect()
    }
    pad = " " * (80 - 5 - 21 - 2)
    assert recs[2] == (
        "ID   2; SV 1; linear; unassigned DNA; STD; UNC; 20 BP.\n"
        "XX\n"
        "AC   2;\n"
        "XX\n"
        "FH   Key             Location/Qualifiers\n"
        "FH\n"
        "FT   CDS             2..10\n"
        'FT                   /gene="pgm"\n'
        "FT                   /codon_start=3\n"
        'FT                   /product="phospho;glucomutase"\n'
        "XX\n"
        "SQ   Sequence 20 BP; 5 A; 5 C; 5 G; 5 T; 0 other;\n"
        f"     acgtacgtac gtacgtacgt{pad}20\n"
        "//\n"
    )


def test_embl_clamping_strand_and_accessions(seqbin):
    from bigsdb_spark.sources.sinks import embl_records, to_embl

    contigs, tags = seqbin
    recs = {
        r["seqbin_id"]: r["record"] for r in embl_records(contigs, tags).collect()
    }
    r1 = recs[1]
    assert "AC   1; AB123;" in r1
    assert "DE   chromosome fragment" in r1
    assert "FT   CDS             complement(1..70)" in r1  # clamped + reverse
    assert 'FT                   /gene="abcZ"' in r1
    assert "SQ   Sequence 70 BP; 21 A; 14 C; 14 G; 21 T; 0 other;" in r1
    # every sequence line is exactly 80 chars wide
    seq_lines = [l for l in r1.splitlines() if l.startswith("     ")]
    assert seq_lines and all(len(l) == 80 for l in seq_lines)
    # concatenated stream is ordered by seqbin_id
    full = to_embl(contigs, tags)
    assert full.index("ID   1;") < full.index("ID   2;")


def test_genbank_golden_small_contig(seqbin):
    """format=genbank (SeqbinToEMBL.pm:33-37): LOCUS/ACCESSION skeleton,
    FEATURES block with the same qualifiers, ORIGIN with numbered
    60-base lines."""
    from bigsdb_spark.sources.sinks import embl_records

    contigs, tags = seqbin
    recs = {
        r["seqbin_id"]: r["record"]
        for r in embl_records(contigs, tags, fmt="genbank").collect()
    }
    assert recs[2] == (
        "LOCUS       2 20 bp    DNA     linear   UNC\n"
        "ACCESSION   2\n"
        "FEATURES             Location/Qualifiers\n"
        "     CDS             2..10\n"
        '                     /gene="pgm"\n'
        "                     /codon_start=3\n"
        '                     /product="phospho;glucomutase"\n'
        "ORIGIN      \n"
        "        1 acgtacgtac gtacgtacgt\n"
        "//\n"
    )
    assert "DEFINITION  chromosome fragment." in recs[1]
    import pytest

    with pytest.raises(ValueError):
        embl_records(contigs, tags, fmt="xml")


def test_seqbin_export_plugin_dispatch(seqbin):
    from bigsdb_spark.plugins import DEFAULT_REGISTRY

    contigs, tags = seqbin
    gff = DEFAULT_REGISTRY.run_inline("SeqbinExport", contigs, tags=tags, fmt="gff3")
    assert gff.startswith("##gff-version 3")
    gb = DEFAULT_REGISTRY.run_inline("SeqbinExport", contigs, tags=tags, fmt="genbank")
    assert gb.startswith("LOCUS")


def test_embl_multiple_accessions_do_not_crash_worker(spark, seqbin):
    """Regression (r3 review): `ndarray or []` on the accessions cell
    raised ValueError (ambiguous truth value) inside mapInPandas for
    any contig with 2+ accessions — Arrow hands array columns to
    pandas as numpy arrays."""
    from bigsdb_spark.sources.sinks import embl_records

    _, tags = seqbin
    contigs = spark.createDataFrame(
        [(1, "acgt" * 5, None, ["AB1", "AB2", "AB3"])],
        "seqbin_id int, sequence string, comments string, "
        "accessions array<string>",
    )
    recs = embl_records(contigs, tags.filter("seqbin_id = 1")).collect()
    assert "AC   1; AB1; AB2; AB3;" in recs[0]["record"]


def test_gff3_alias_nested_under_product_reference_quirk(spark):
    """Reference parity (SeqbinToGFF3.pm:133-138): Alias is only
    appended inside the product branch, so aliases WITHOUT a product
    emit no Alias attribute."""
    from bigsdb_spark.sources.sinks import to_gff3

    contigs = spark.createDataFrame(
        [(1, "acgt" * 5)], "seqbin_id int, sequence string"
    )
    tags = spark.createDataFrame(
        [(1, "adk", 1, 8, False, True, 1, None, ["adk2"], True)],
        "seqbin_id int, locus string, start_pos int, end_pos int, "
        "reverse boolean, complete boolean, orf int, product string, "
        "aliases array<string>, complete_cds boolean",
    )
    out = to_gff3(contigs, tags)
    assert "Alias" not in out and "locus_tag=adk" in out


def test_seqbin_export_plugin_rejects_stray_options(seqbin):
    from bigsdb_spark.plugins import DEFAULT_REGISTRY

    contigs, tags = seqbin
    with pytest.raises(TypeError):
        DEFAULT_REGISTRY.run_inline(
            "SeqbinExport", contigs, tags=tags, fmt="embl", igv=True
        )


def test_distributed_gff3_and_embl_writers(spark, tmp_path, seqbin):
    """Scale-path writers: GFF3 feature lines land as text; EMBL
    records keep their internal newlines by writing parquet (one row
    per contig record)."""
    from bigsdb_spark.sources.sinks import write_embl, write_gff3

    contigs, tags = seqbin
    gff_path = str(tmp_path / "out_gff3")
    write_gff3(contigs, tags, gff_path)
    lines = [r.value for r in spark.read.text(gff_path).collect()]
    assert len(lines) == 3 and all("\t" in l for l in lines)

    embl_path = str(tmp_path / "out_embl")
    write_embl(contigs, tags, embl_path, fmt="genbank")
    back = spark.read.parquet(embl_path)
    assert back.count() == 2
    rec = back.filter("seqbin_id = 2").collect()[0]["record"]
    assert rec.startswith("LOCUS") and rec.endswith("//\n")
