"""GenomeComparator semantics (GenomeComparator.pm:119-151
count_differences, :2370-2434 _get_locus_attributes) on hand fixtures."""

from __future__ import annotations

import pytest

from bigsdb_spark.operators.genome_compare import (
    comparison_matrix,
    locus_attributes,
    pairwise_distances,
    unique_strains,
)

# 3 isolates × 5 loci exercising every category
ROWS = [
    # locus A: variable (two real variants)
    (1, "A", "1"), (2, "A", "2"), (3, "A", "1"),
    # locus B: identical in all (real allele, == ref '1')
    (1, "B", "1"), (2, "B", "1"), (3, "B", "1"),
    # locus C: identical except ref (all '7', ref is '1')
    (1, "C", "7"), (2, "C", "7"), (3, "C", "7"),
    # locus D: missing in all
    (1, "D", "missing"), (2, "D", "missing"), (3, "D", "missing"),
    # locus E: incomplete in some (+ variable: incomplete vs 3 vs missing)
    (1, "E", "incomplete"), (2, "E", "3"), (3, "E", "missing"),
]


@pytest.fixture(scope="module")
def designations(spark):
    return spark.createDataFrame(
        ROWS, "isolate_id int, locus string, allele_id string"
    )


def test_locus_attributes_by_ref(designations):
    at = {r["locus"]: r for r in locus_attributes(designations, by_ref=True).collect()}
    assert at["A"]["variable"] and not at["A"]["identical_in_all"]
    # B: everyone matches the reference variant '1'
    assert at["B"]["identical_in_all"] and at["B"]["identical_except_ref"]
    # C: identical among isolates but differs from the reference
    assert not at["C"]["identical_in_all"] and at["C"]["identical_except_ref"]
    assert at["D"]["missing_in_all"] and at["D"]["frequency"] == 0
    assert at["E"]["incomplete_in_some"] and at["E"]["variable"]
    assert at["E"]["frequency"] == 2  # isolate 3 is missing
    assert at["A"]["frequency"] == 3


def test_locus_attributes_without_ref(designations):
    at = {r["locus"]: r for r in locus_attributes(designations).collect()}
    # without a reference genome the two 'identical' notions coincide
    assert at["C"]["identical_in_all"] and at["C"]["identical_except_ref"]
    # a uniform 'missing' locus is never 'identical' (not a real allele)
    assert not at["D"]["identical_in_all"]


def test_pairwise_distances_flags(designations):
    base = {
        (r["id1"], r["id2"]): r["differences"]
        for r in pairwise_distances(designations).collect()
    }
    # 1 vs 2: A(1!=2) + E(incomplete!=3) = 2; B,C same; D missing==missing
    assert base[(1, 2)] == 2
    # 1 vs 3: E(incomplete!=missing) = 1
    assert base[(1, 3)] == 1
    # 2 vs 3: A(2!=1) + E(3!=missing) = 2
    assert base[(2, 3)] == 2

    excl = {
        (r["id1"], r["id2"]): r["differences"]
        for r in pairwise_distances(designations, exclude_missing=True).collect()
    }
    # missing no longer counts: 1v3 and 2v3 lose their E difference
    assert excl[(1, 2)] == 2 and excl[(1, 3)] == 0 and excl[(2, 3)] == 1

    trunc = {
        (r["id1"], r["id2"]): r["differences"]
        for r in pairwise_distances(
            designations, truncated_pairwise_same=True
        ).collect()
    }
    # incomplete-vs-real no longer counts (1v2 E drops), but
    # incomplete-vs-missing still does (1v3 E stays) — :138-146
    assert trunc[(1, 2)] == 1 and trunc[(1, 3)] == 1 and trunc[(2, 3)] == 2


def test_comparison_matrix_render_codes(designations):
    m = {
        r["isolate_id"]: r
        for r in comparison_matrix(
            designations, ["A", "B", "C", "D", "E"]
        ).collect()
    }
    assert m[1]["D"] == "X" and m[1]["E"] == "I"
    assert m[2]["A"] == "2" and m[3]["E"] == "X"


def test_gene_presence_flags(spark):
    from bigsdb_spark.operators.genome_compare import gene_presence

    desig = spark.createDataFrame(
        [
            (1, "A", "42"),
            (1, "B", "New#1"),
            (1, "C", "incomplete"),
            (2, "A", "missing"),
            # isolate 2 has no row for B/C -> reads as missing
        ],
        "isolate_id int, locus string, allele_id string",
    )
    db_desig = spark.createDataFrame(
        [(1, "A")], "isolate_id int, locus string"
    )
    tags = spark.createDataFrame(
        [(1, "A"), (1, "C")], "isolate_id int, locus string"
    )
    got = {
        (r["isolate_id"], r["locus"]): r
        for r in gene_presence(
            desig, ["A", "B", "C"], db_designations=db_desig, tags=tags
        ).collect()
    }
    assert len(got) == 6  # full 2x3 grid
    a1 = got[(1, "A")]
    assert (a1["presence"], a1["complete"], a1["known_allele"]) == (1, 1, 1)
    assert (a1["designated"], a1["tagged"]) == (1, 1)
    b1 = got[(1, "B")]  # provisional 'New#' allele: present but not known
    assert (b1["presence"], b1["complete"], b1["known_allele"]) == (1, 1, 0)
    c1 = got[(1, "C")]  # incomplete: present, not complete, tagged
    assert (c1["presence"], c1["complete"], c1["known_allele"]) == (1, 0, 0)
    assert c1["tagged"] == 1
    a2 = got[(2, "A")]
    assert (a2["presence"], a2["complete"], a2["known_allele"]) == (0, 0, 0)
    b2 = got[(2, "B")]  # absent row -> missing
    assert b2["presence"] == 0 and b2["designated"] == 0


def test_unique_strains_groups_identical_profiles(spark):
    rows = [
        (1, "A", "1"), (1, "B", "2"),
        (2, "A", "1"), (2, "B", "2"),  # same strain as 1
        (3, "A", "1"), (3, "B", "3"),
    ]
    df = spark.createDataFrame(rows, "isolate_id int, locus string, allele_id string")
    got = sorted(
        (r["n_isolates"], list(r["isolate_ids"]))
        for r in unique_strains(df).collect()
    )
    assert got == [(1, [3]), (2, [1, 2])]


def test_gene_presence_multi_designation_one_row_per_cell(spark):
    """Regression: several designations at one locus still yield ONE
    grid row, with any-designation (max) flag semantics."""
    from bigsdb_spark.operators.genome_compare import gene_presence

    desig = spark.createDataFrame(
        [(1, "A", "42"), (1, "A", "missing"), (1, "A", "New#2")],
        "isolate_id int, locus string, allele_id string",
    )
    got = gene_presence(desig, ["A", "B"]).collect()
    assert len(got) == 2
    a = {r["locus"]: r for r in got}["A"]
    assert (a["presence"], a["complete"], a["known_allele"]) == (1, 1, 1)
