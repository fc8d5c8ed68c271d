"""Exact sequence-match paths (allele lookup, contig scan, mutation
flags, external pipe), access-control views, and export sinks."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigsdb_spark.operators.seqmatch import (
    ExternalTool,
    exact_allele_lookup,
    mutation_scan,
    scan_contigs_exact,
)
from bigsdb_spark.sources.sinks import write_fasta, write_tsv
from bigsdb_spark.views import UserContext, make_view

ALLELES = [
    ("abcZ", "1", "ACGTACGT"),
    ("abcZ", "2", "ACGTACGA"),
    ("adk", "1", "TTTTCCCC"),
    ("short", "1", "ACG"),
]


def test_exact_allele_lookup(spark):
    alleles = spark.createDataFrame(ALLELES, "locus string, allele_id string, sequence string")
    queries = spark.createDataFrame(
        [(1, "acgtacga"), (2, "GGGGGGGG")], "query_id int, sequence string"
    )
    got = exact_allele_lookup(queries, alleles).collect()
    assert [(r.query_id, r.locus, r.allele_id) for r in got] == [(1, "abcZ", "2")]


def test_scan_contigs_exact_tags(spark):
    alleles = spark.createDataFrame(ALLELES, "locus string, allele_id string, sequence string")
    # contig contains abcZ-1 at pos 3 and adk-1 at pos 11, 'short'-1 at 1
    contig = "ACACGTACGTTTTTCCCCAA"
    contigs = spark.createDataFrame([(10, contig)], "id long, sequence string")
    got = {
        (r.locus, r.allele_id): (r.start_pos, r.end_pos)
        for r in scan_contigs_exact(contigs, alleles).collect()
    }
    assert got[("abcZ", "1")] == (3, 10)
    assert got[("adk", "1")] == (11, 18)
    assert ("short", "1") in got  # ACG occurs (first match at 1? pos 2?)


def test_mutation_scan_flags(spark):
    alleles = spark.createDataFrame(
        [("penA", "1", "ACGT"), ("penA", "2", "AGGT")],
        "locus string, allele_id string, sequence string",
    )
    muts = spark.createDataFrame(
        [("penA", 2, "C", "G")], "locus string, position int, wild_type string, variant string"
    )
    got = {r.allele_id: (r.observed, r.is_variant, r.is_wild_type)
           for r in mutation_scan(alleles, muts).collect()}
    assert got["1"] == ("C", False, True)
    assert got["2"] == ("G", True, False)


def test_external_tool_pipe(spark):
    tool = ExternalTool(["sort"])
    assert tool.available()
    df = spark.createDataFrame([("b",), ("a",), ("c",)], "line string")
    got = [r.line for r in tool.pipe_lines(df.coalesce(1), "line").collect()]
    assert got == ["a", "b", "c"]
    assert not ExternalTool(["definitely-not-a-binary"]).available()


def test_view_factory_roles(spark):
    isolates = spark.createDataFrame(
        [(1, None), (2, None), (3, 4), (4, None), (5, None)],
        "id int, new_version int",
    )
    private = spark.createDataFrame(
        [(2, 7, None), (4, 8, "2020-01-01"), (5, 9, "2030-01-01")],
        "isolate_id int, owner_id int, embargo_date string",
    )
    members = spark.createDataFrame([(100, 5)], "project_id int, isolate_id int")

    anon = make_view(isolates, UserContext(), private, members, today="2026-08-13")
    # 1 public; 2 private; 3 superseded version; 4 embargo passed; 5 embargoed
    assert sorted(r.id for r in anon.collect()) == [1, 4]

    owner = make_view(
        isolates, UserContext(user_id=7), private, members, today="2026-08-13"
    )
    assert sorted(r.id for r in owner.collect()) == [1, 2, 4]

    project_user = make_view(
        isolates, UserContext(user_id=99, project_ids=[100]), private, members,
        today="2026-08-13",
    )
    assert sorted(r.id for r in project_user.collect()) == [1, 4, 5]

    admin = make_view(isolates, UserContext(admin=True), private, members)
    assert sorted(r.id for r in admin.collect()) == [1, 2, 4, 5]


@pytest.mark.slow
def test_sinks_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "ACGT"), (2, "TTTT")], "id int, seq string")
    tsv = str(tmp_path / "out_tsv")
    write_tsv(df, tsv, single_file=True)
    back = spark.read.option("sep", "\t").option("header", True).csv(tsv)
    assert back.count() == 2 and back.columns == ["id", "seq"]
    fa = str(tmp_path / "out_fa")
    write_fasta(df, "id", "seq", fa)
    text = "\n".join(r.value for r in spark.read.text(fa).collect())
    assert ">1" in text and "ACGT" in text


def test_nexus_golden(spark):
    """D8 golden: NEXUS lower-triangle matrix with diagonal + labels,
    missing pairs as '?' (GenomeComparator.pm:1497-1560)."""
    from bigsdb_spark.sources.sinks import to_nexus_distances

    pd = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 5)], "id1 int, id2 int, hamming int"
    )
    got = to_nexus_distances(pd, nodes=[1, 2, 3, 4])
    expected = (
        "#NEXUS\n"
        "[Distance matrix calculated by bigsdb_spark]\n"
        "[Jolley & Maiden 2010 BMC Bioinformatics 11:595]\n"
        "\n"
        "BEGIN taxa;\n"
        "   DIMENSIONS ntax = 4;\n"
        "\n"
        "END;\n"
        "\n"
        "BEGIN distances;\n"
        "   DIMENSIONS ntax = 4;\n"
        "   FORMAT\n"
        "      triangle=LOWER\n"
        "      diagonal\n"
        "      labels\n"
        "      missing=?\n"
        "   ;\n"
        "MATRIX\n"
        "1\t0\n"
        "2\t3\t0\n"
        "3\t5\t?\t0\n"
        "4\t?\t?\t?\t0\n"
        "   ;\n"
        "END;\n"
    )
    assert got == expected


def test_grapetree_golden(spark):
    """D8 golden: GrapeTree profile TSV (#isolate header; missing -> -,
    incomplete -> I, multi-designation takes the first value —
    GrapeTree.pm:324-380)."""
    import pytest

    from bigsdb_spark.sources.sinks import to_grapetree_profiles

    prof = spark.createDataFrame(
        [
            (1, ["2", "missing", "7;9"]),
            (2, ["2", "incomplete", None]),
        ],
        "profile_key int, profile array<string>",
    )
    got = to_grapetree_profiles(prof, ["abcZ", "adk", "aroE"])
    assert got == (
        "#isolate\tabcZ\tadk\taroE\n"
        "1\t2\t-\t7\n"
        "2\t2\tI\t-\n"
    )
    same = spark.createDataFrame(
        [(1, ["2", "2"]), (2, ["2", "2"])], "profile_key int, profile array<string>"
    )
    with pytest.raises(ValueError):
        to_grapetree_profiles(same, ["l1", "l2"])


def test_kmer_partial_match_tiers(spark):
    """F10 inexact tier: k-mer prefilter + ungapped scoring reproduce the
    Blast.pm partial-match record; the banded aligner handles indels."""
    from bigsdb_spark.operators.seqmatch import (
        banded_align,
        kmer_candidates,
        ungapped_partial_matches,
    )

    alleles = spark.createDataFrame(
        [
            ("locus1", "1", "ACGTACGTACGTACGTACGT"),  # 20 bp
            ("locus1", "2", "ACGTACGTACGTACGTACGA"),  # 1 mismatch vs 1
            ("locus2", "1", "TTTTTTTTTTGGGGGGGGGG"),
        ],
        "locus string, allele_id string, sequence string",
    )
    queries = spark.createDataFrame(
        [(10, "ACGTACGTACGTACGTACGT")], "query_id long, sequence string"
    )
    cand = kmer_candidates(queries, alleles, k=10)
    got = {(r.locus, r.allele_id) for r in cand.collect()}
    assert ("locus1", "1") in got and ("locus1", "2") in got
    assert ("locus2", "1") not in got  # shares no 10-mer

    matches = {
        r.allele_id: r
        for r in ungapped_partial_matches(
            queries, alleles, k=10, min_identity=90.0
        ).collect()
    }
    assert matches["1"].mismatches == 0 and matches["1"].identity == 100.0
    assert matches["2"].mismatches == 1 and matches["2"].gaps == 0
    assert matches["2"].alignment == 20 and matches["2"].identity == 95.0

    # gapped tier: one deletion in the query vs allele 1
    pairs = spark.createDataFrame(
        [(10, "1", "ACGTACGTAGTACGTACGT", "ACGTACGTACGTACGTACGT")],
        "query_id long, allele_id string, qseq string, aseq string",
    )
    aligned = banded_align(pairs).collect()[0]
    assert aligned.gaps == 1 and aligned.mismatches == 0
    assert aligned.alignment == 20  # alignment spans the allele length


@pytest.mark.slow
def test_partial_autotag_and_new_allele_discovery(spark):
    """F11 beyond-exact: near-match tagging (AutoTag) and new-allele
    discovery (ScanNew) via seed-and-extend."""
    from bigsdb_spark.operators.seqmatch import (
        discover_new_alleles,
        scan_contigs_partial,
    )

    allele = "ACGTACGTACGTACGTACGTACGTACGTACGT"  # 32 bp
    variant = allele[:30] + "TA"  # 2 mismatches at the end
    contig = "GGGG" + variant + "CCCC"
    contigs = spark.createDataFrame([(1, contig)], "id long, sequence string")
    alleles = spark.createDataFrame(
        [("abcZ", "1", allele), ("abcZ", "2", "TTTT" + allele[4:])],
        "locus string, allele_id string, sequence string",
    )
    # 92% threshold: the true placement (93.75%) passes; the shifted
    # placement the periodic ACGT repeat also seeds (90.6%) does not
    tags = scan_contigs_partial(contigs, alleles, k=15, min_identity=92.0).collect()
    assert len(tags) == 1
    t = tags[0]
    # best allele for the placement is '1' (2 mismatches, vs 6 for '2')
    assert t.allele_id == "1" and t.mismatches == 2
    assert t.start_pos == 5 and t.end_pos == 36
    assert contig[t.start_pos - 1 : t.end_pos] == variant

    new = discover_new_alleles(contigs, alleles, k=15, min_identity=92.0).collect()
    assert len(new) == 1
    n = new[0]
    assert n.sequence == variant
    assert n.new_allele_id == "3"  # max existing numeric id 2 -> next 3
    # an exact-match contig yields no new alleles
    exact_contig = spark.createDataFrame(
        [(2, "GG" + allele + "TT")], "id long, sequence string"
    )
    assert discover_new_alleles(exact_contig, alleles, k=15).count() == 0
    # a candidate that is a subsequence of an existing allele is
    # rejected (ScanNew.pm:229 _check_sub_or_super_seq): with a longer
    # allele containing the variant, discovery yields nothing
    alleles_super = alleles.union(
        spark.createDataFrame(
            [("abcZ", "9", "TT" + variant + "TT")],
            "locus string, allele_id string, sequence string",
        )
    )
    assert (
        discover_new_alleles(contigs, alleles_super, k=15, min_identity=92.0).count()
        == 0
    )


def test_polymorphic_sites_aligned_variable_length(spark):
    """D9 with variable-length alleles: a deletion shows up as '-' at
    the reference position; downstream positions stay aligned
    (LocusExplorer.pm:334 aligns before counting SNPs)."""
    from bigsdb_spark.operators.seqmatch import polymorphic_sites_aligned

    alleles = spark.createDataFrame(
        [
            ("abcZ", "1", "ACGTACGTAC"),   # reference (longest)
            ("abcZ", "2", "ACGTCGTAC"),    # deletion of the 5th base
            ("abcZ", "3", "ACGTTCGTAC"),   # substitution A->T at pos 5
        ],
        "locus string, allele_id string, sequence string",
    )
    freq = {
        (r.pos, r.residue): r.n
        for r in polymorphic_sites_aligned(alleles).collect()
    }
    assert freq[(5, "A")] == 1 and freq[(5, "-")] == 1 and freq[(5, "T")] == 1
    # downstream of the indel all three alleles agree again
    for pos, res in [(6, "C"), (7, "G"), (8, "T"), (9, "A"), (10, "C")]:
        assert freq[(pos, res)] == 3


def test_paralogous_loci_distinct_sequences(spark):
    """GCHelper.pm:296 _is_paralogous: >1 DISTINCT matched sequence ->
    paralogous; repeated identical matches count once."""
    from bigsdb_spark.operators.seqmatch import (
        paralogous_loci,
        scan_contigs_partial,
    )

    allele = "ACGGTTCAACGGTGCATTGG"  # 20 bp, no internal repeats
    variant = allele[:18] + "CC"
    # contig 1: the allele twice (identical copies) + the variant once
    contig1 = allele + "TTTT" + allele + "TTTT" + variant
    # contig 2: single copy
    contig2 = "GGGG" + allele + "GGGG"
    contigs = spark.createDataFrame(
        [(1, 10, contig1), (2, 10, contig2)],
        "id long, isolate_id long, sequence string",
    )
    alleles = spark.createDataFrame(
        [("abcZ", "1", allele)], "locus string, allele_id string, sequence string"
    )
    tags = scan_contigs_partial(contigs, alleles, k=12, min_identity=85.0)
    # per contig: contig 1 has two distinct matched sequences
    per_contig = {
        (r["id"], r["locus"]): r
        for r in paralogous_loci(tags, contigs).collect()
    }
    assert per_contig[(1, "abcZ")]["n_distinct_matches"] == 2
    assert per_contig[(1, "abcZ")]["paralogous"]
    assert not per_contig[(2, "abcZ")]["paralogous"]
    # per isolate (both contigs belong to isolate 10): still 2 distinct
    per_iso = {
        (r["isolate_id"], r["locus"]): r
        for r in paralogous_loci(tags, contigs, isolate_col="isolate_id").collect()
    }
    assert per_iso[(10, "abcZ")]["n_distinct_matches"] == 2


def test_sequence_diffs_positions_and_identity(spark):
    """SequenceComparison.pm:160-176: 1-based diff positions for
    same-length pairs, identity to 2dp; unequal lengths excluded."""
    from bigsdb_spark.operators.seqmatch import (
        sequence_diff_summary,
        sequence_diffs,
    )

    pairs = spark.createDataFrame(
        [
            ("p1", "ACGTACGTAC", "ACCTACGTAT"),  # diffs at pos 3 and 10
            ("p2", "ACGT", "ACGTACGT"),  # unequal length -> excluded
        ],
        "pair string, seq1 string, seq2 string",
    )
    diffs = sequence_diffs(pairs).collect()
    assert {(r.pair, r.pos, r.base1, r.base2) for r in diffs} == {
        ("p1", 3, "G", "C"),
        ("p1", 10, "C", "T"),
    }
    summary = {r.pair: r for r in sequence_diff_summary(pairs).collect()}
    assert set(summary) == {"p1"}
    assert summary["p1"].differences == 2
    assert summary["p1"].identity == 80.0


def test_find_exemplars_greedy_per_length(spark):
    """find_exemplars.pl: first allele per (locus, length) is an
    exemplar; later alleles join only when >= variation% different from
    every current exemplar; placeholders excluded; numeric id order."""
    from bigsdb_spark.operators.seqmatch import find_exemplars

    base = "A" * 20
    rows = [
        ("abcZ", "1", base),                      # exemplar (first)
        ("abcZ", "2", base[:19] + "C"),           # 5% diff -> skipped
        ("abcZ", "3", "C" * 10 + "A" * 10),       # 50% diff -> exemplar
        ("abcZ", "4", "C" * 10 + "A" * 9 + "G"),  # 5% from '3' -> skipped
        ("abcZ", "10", "ACGTACGT"),               # different length -> exemplar
        ("abcZ", "N", base),                      # placeholder -> excluded
    ]
    alleles = spark.createDataFrame(
        rows, "locus string, allele_id string, sequence string"
    )
    got = {
        (r["allele_id"], r["length"])
        for r in find_exemplars(alleles, variation=10.0).collect()
    }
    assert got == {("1", 20), ("3", 20), ("10", 8)}


def test_find_exemplars_id_format_is_per_locus(spark):
    """The numeric-vs-lexical id order is a per-LOCUS property
    (loci.allele_id_format drives the ORDER BY, find_exemplars.pl
    :160-162): a locus holding any non-numeric id sorts lexically in
    EVERY length group, even one whose own ids are all numeric."""
    from bigsdb_spark.operators.seqmatch import find_exemplars

    # the two length-20 alleles differ by 5% (< variation), so only the
    # sort-order winner of the group survives as its exemplar
    rows = [
        # length-20 group: ids all numeric, but the locus also owns 'X'
        ("mixed", "2", "A" * 20),
        ("mixed", "10", "A" * 19 + "C"),  # lexically '10' < '2' -> first
        ("mixed", "X", "ACGTACGT"),       # forces lexical order locus-wide
        # all-numeric locus: numeric order ('2' before '10')
        ("numeric", "10", "A" * 19 + "C"),
        ("numeric", "2", "A" * 20),
    ]
    alleles = spark.createDataFrame(
        rows, "locus string, allele_id string, sequence string"
    )
    got = {
        (r["locus"], r["length"]): r["allele_id"]
        for r in find_exemplars(alleles, variation=10.0).collect()
    }
    assert got[("mixed", 20)] == "10"   # lexical
    assert got[("numeric", 20)] == "2"  # numeric


def test_curate_dedupes_duplicate_existing_sequences(spark):
    """A caller-supplied allele store carrying one sequence under two
    ids must not fan a submission out into two 'assigned' rows (the
    reference store forbids duplicates via UNIQUE (locus, md5(seq)));
    the smallest existing id wins."""
    from bigsdb_spark.operators.seqmatch import curate_allele_submissions

    existing = spark.createDataFrame(
        [("abcZ", "5", "ACGTACGTAA"), ("abcZ", "7", "ACGTACGTAA")],
        "locus string, allele_id string, sequence string",
    )
    subs = spark.createDataFrame(
        [("S1", "q1", "abcZ", "ACGTACGTAA")],
        "submission_id string, seq_id string, locus string, sequence string",
    )
    got = curate_allele_submissions(subs, existing).collect()
    assert len(got) == 1
    assert got[0]["status"] == "assigned" and got[0]["allele_id"] == "5"


def test_curate_allele_submissions_tiers(spark):
    """allele_curator.pl: CDS rejection, exact-match assignment to the
    existing id, similarity-gated new-id assignment (shared across
    identical submissions), dissimilar rejection."""
    from bigsdb_spark.operators.seqmatch import curate_allele_submissions

    base = "ATGAAACCCGGGTTTACGTAATAA"[:21]  # 21 bp, ATG..., ends TAA below
    cds_ok = "ATG" + "AAACCCGGGTTTACG" + "TAA"  # 21 bp complete CDS
    existing = spark.createDataFrame(
        [("abcZ", "1", cds_ok), ("adk", "5", "ACGTACGTACGTACGTACGT")],
        "locus string, allele_id string, sequence string",
    )
    near = cds_ok[:20] + "A"          # 1 diff from allele 1... ends TAA? 
    subs = spark.createDataFrame(
        [
            ("S1", "seq1", "abcZ", cds_ok.lower()),      # exact (case/clean)
            ("S1", "seq2", "abcZ", "ATG" + "C" * 15 + "TAG"),  # valid CDS, dissimilar
            ("S2", "seq3", "adk", "ACGTACGTACGTACGTACGA"),   # 95% similar -> new id
            ("S3", "seq4", "adk", "ACGTACGTACGTACGTACGA"),   # identical resubmission
            ("S3", "seq5", "abcZ", "ATGAAACCC"),             # not complete CDS
        ],
        "submission_id string, seq_id string, locus string, sequence string",
    )
    got = {
        r["seq_id"]: r
        for r in curate_allele_submissions(
            subs, existing, min_identity=90.0, cds_loci=["abcZ"]
        ).collect()
    }
    assert got["seq1"]["status"] == "assigned" and got["seq1"]["allele_id"] == "1"
    assert got["seq2"]["status"] == "rejected"
    assert "dissimilar" in got["seq2"]["reason"]
    # both identical new submissions share the SAME new id (max 5 + 1)
    assert got["seq3"]["status"] == "assigned" and got["seq3"]["allele_id"] == "6"
    assert got["seq4"]["allele_id"] == "6"
    assert got["seq5"]["status"] == "rejected"
    assert got["seq5"]["reason"] == "not complete CDS"


def test_date_restriction_hides_recent_from_anonymous(spark):
    from bigsdb_spark.views import UserContext, date_restriction_filter

    view = spark.createDataFrame(
        [(1, "2020-01-01"), (2, "2024-06-01"), (3, None), (4, "garbage")],
        "id int, date_entered string",
    )
    anon = date_restriction_filter(view, UserContext(), "2022-01-01")
    # only the pre-restriction record is visible; NULL and malformed
    # dates stay hidden (conservative for an access filter)
    assert [r.id for r in anon.collect()] == [1]
    # any logged-in user sees everything; unconfigured = passthrough
    logged = date_restriction_filter(view, UserContext(user_id=7), "2022-01-01")
    assert logged.count() == 4
    assert date_restriction_filter(view, UserContext(), None).count() == 4


def test_set_system_restricts_loci_and_schemes(spark):
    from bigsdb_spark.views import (
        apply_set_loci,
        apply_set_schemes,
        set_locus_display_names,
        set_visible_loci,
    )

    set_loci = spark.createDataFrame(
        [(1, "abcZ", "abcZ_v1"), (1, "adk", None), (2, "aroE", None)],
        "set_id int, locus string, set_name string",
    )
    set_schemes = spark.createDataFrame(
        [(1, 10), (2, 11)], "set_id int, scheme_id int"
    )
    scheme_members = spark.createDataFrame(
        [(10, "fumC"), (10, "adk"), (11, "gdh")], "scheme_id int, locus string"
    )
    vis = {
        r.locus
        for r in set_visible_loci(1, set_loci, set_schemes, scheme_members).collect()
    }
    # direct set loci UNION loci of the set's schemes — deduped
    assert vis == {"abcZ", "adk", "fumC"}

    desig = spark.createDataFrame(
        [(7, "abcZ", "1"), (7, "gdh", "2"), (8, "fumC", "3")],
        "isolate_id int, locus string, allele_id string",
    )
    in_set = apply_set_loci(desig, 1, set_loci, set_schemes, scheme_members)
    assert {(r.isolate_id, r.locus) for r in in_set.collect()} == {
        (7, "abcZ"), (8, "fumC"),
    }
    # set_id=None: passthrough (no set active)
    assert apply_set_loci(desig, None, set_loci).count() == 3

    schemes = spark.createDataFrame(
        [(10, "MLST"), (11, "cgMLST"), (12, "rMLST")],
        "scheme_id int, description string",
    )
    assert [
        r.scheme_id for r in apply_set_schemes(schemes, 1, set_schemes).collect()
    ] == [10]

    named = set_locus_display_names(desig, 1, set_loci)
    got = {r.locus: r.display_name for r in named.collect()}
    # aliased where the set names it, real id otherwise
    assert got == {"abcZ": "abcZ_v1", "gdh": "gdh", "fumC": "fumC"}
