"""Submission validation (operators/submissions.py) vs
SubmissionHandler.pm:476-560 (alleles) and :597-680 (profiles)."""

import pytest
import pyspark.sql.functions as F

from bigsdb_spark.operators.submissions import check_new_alleles, check_new_profiles


def _existing(spark):
    return spark.createDataFrame(
        [
            ("abcZ", "1", "ATGAAACCCGGGTTTACGTAG"),
            ("abcZ", "2", "ATGAAACCCGGGTTTACGCAG"),
            ("adk", "1", "ATGTTTTTTTTTTTTTTTTAG"),
        ],
        "locus string, allele_id string, sequence string",
    )


def test_check_new_alleles_error_tiers(spark):
    seqs = spark.createDataFrame(
        [
            ("s1", "atg aaa-ccc.gggtttacgtag"),       # exact dup of abcZ-1 after cleaning
            ("s2", "ATGAAACCCGGGTTTACGXAG"),          # invalid char
            ("s3", "ATGAAACCCGGGTATACGTAG"),          # fine, similar
            ("s3", "ATGAAACCCGGGTATACGTAG"),          # duplicate id
            ("s4", "TTTTCCCCAAAAGGGGTTTTCCCC"),       # dissimilar
        ],
        "seq_id string, sequence string",
    )
    out = check_new_alleles(
        seqs, _existing(spark), "abcZ", min_length=10, max_length=30
    )
    rows = {}
    for r in out.collect():
        rows.setdefault(r["seq_id"], r)
    assert rows["s1"]["errors"] == [
        'Sequence "s1" has already been defined as abcZ-1.'
    ]
    assert rows["s1"]["status"] == "rejected"
    assert rows["s1"]["sequence"] == "ATGAAACCCGGGTTTACGTAG"  # cleaned + upper
    assert rows["s2"]["errors"] == [
        'Sequence "s2" is not a valid unambiguous DNA sequence.'
    ]
    assert any("more than once" in e for e in rows["s3"]["errors"])
    assert rows["s4"]["errors"] == []
    assert rows["s4"]["status"] == "pending"
    assert any("dissimilar" in i for i in rows["s4"]["infos"])
    assert rows["s3"]["infos"] == []  # similar, not contained


def test_check_new_alleles_lengths_and_containment(spark):
    seqs = spark.createDataFrame(
        [
            ("short", "ATGAAACC"),
            ("long", "A" * 40),
            ("sub", "AAACCCGGGTTTACG"),                  # substring of abcZ-1
            ("super", "ATGAAACCCGGGTTTACGTAGGGG"),       # contains abcZ-1
        ],
        "seq_id string, sequence string",
    )
    out = check_new_alleles(
        seqs, _existing(spark), "abcZ", min_length=10, max_length=30
    )
    rows = {r["seq_id"]: r for r in out.collect()}
    assert "minimum length of 10" in rows["short"]["errors"][0]
    assert "maximum length of 30" in rows["long"]["errors"][0]
    # 'sub' is contained in both abcZ-1 and abcZ-2 — one is reported
    # (the reference also reports a single arbitrary hit, :556)
    assert len(rows["sub"]["infos"]) == 1
    assert rows["sub"]["infos"][0].startswith(
        'Sequence "sub" is a sub-sequence of allele-'
    )
    assert rows["super"]["infos"] == [
        'Sequence "super" is a super-sequence of allele 1.'
    ]


def test_check_new_alleles_fixed_length_and_peptide(spark):
    existing = spark.createDataFrame(
        [], "locus string, allele_id string, sequence string"
    )
    seqs = spark.createDataFrame(
        [("p1", "MKLVQ*"), ("p2", "MKLV?")],
        "seq_id string, sequence string",
    )
    out = check_new_alleles(
        seqs, existing, "pepA", data_type="peptide",
        length_varies=False, length=5, check_similarity=False,
    )
    rows = {r["seq_id"]: r for r in out.collect()}
    assert "non-variable length of 5" in rows["p1"]["errors"][0]
    assert any("peptide" in e for e in rows["p2"]["errors"])


def test_check_new_profiles(spark):
    rows = spark.createDataFrame(
        [
            ("r1", "abcZ", "1"), ("r1", "adk", "2"),       # clean
            ("r2", "abcZ", "99"), ("r2", "adk", "1"),      # undefined allele
            ("r3", "abcZ", "N"), ("r3", "adk", "1"),       # N not allowed
            ("r4", "abcZ", ""), ("r4", "adk", "1"),        # empty
            ("r5", "abcZ", "1"), ("r5", "bogus", "7"),     # unknown locus
            ("r6", "abcZ", "1"), ("r6", "adk", "1"),       # already defined
        ],
        "row_id string, locus string, allele_id string",
    )
    alleles = spark.createDataFrame(
        [("abcZ", "1"), ("abcZ", "2"), ("adk", "1"), ("adk", "2")],
        "locus string, allele_id string",
    )
    profiles = spark.createDataFrame(
        [("17", ["1", "1"])], "st string, profile array<string>"
    )
    out = check_new_profiles(
        rows, ["abcZ", "adk"], alleles, existing_profiles=profiles
    )
    got = {r["row_id"]: r for r in out.collect()}
    assert got["r1"]["errors"] == [] and got["r1"]["profile"] == ["1", "2"]
    assert got["r2"]["errors"] == ["abcZ: 99 has not been defined."]
    assert got["r3"]["errors"] == ["Arbitrary values (N) are not allowed for locus abcZ."]
    assert got["r4"]["errors"] == ["No value for locus abcZ."]
    # bogus is unknown AND adk has no row at all — both reported
    assert got["r5"]["errors"] == [
        "No value for locus adk.",
        "Value provided for unknown locus bogus.",
    ]
    assert got["r6"]["errors"] == ["Profile has already been defined as ST-17."]


def test_check_new_profiles_allow_missing(spark):
    rows = spark.createDataFrame(
        [("r1", "abcZ", "N"), ("r1", "adk", "0")],
        "row_id string, locus string, allele_id string",
    )
    alleles = spark.createDataFrame(
        [("abcZ", "1"), ("adk", "1")], "locus string, allele_id string"
    )
    out = check_new_profiles(rows, ["abcZ", "adk"], alleles, allow_missing_loci=True)
    r = out.collect()[0]
    assert r["errors"] == [] and r["profile"] == ["N", "0"]


def test_check_new_profiles_duplicate_designation(spark):
    """A repeated (row, locus) designation is an error, not a
    duplicate-map-key crash; the first value feeds the profile."""
    rows = spark.createDataFrame(
        [("r1", "abcZ", "1"), ("r1", "abcZ", "2"), ("r1", "adk", "1")],
        "row_id string, locus string, allele_id string",
    )
    alleles = spark.createDataFrame(
        [("abcZ", "1"), ("abcZ", "2"), ("adk", "1")],
        "locus string, allele_id string",
    )
    r = check_new_profiles(rows, ["abcZ", "adk"], alleles).collect()[0]
    assert r["errors"] == ["Duplicate value provided for locus abcZ."]
    assert r["profile"] == ["1", "1"]


def test_check_new_profiles_all_unknown_row_survives(spark):
    rows = spark.createDataFrame(
        [("r1", "nope", "7")], "row_id string, locus string, allele_id string"
    )
    alleles = spark.createDataFrame([("abcZ", "1")], "locus string, allele_id string")
    r = check_new_profiles(rows, ["abcZ"], alleles).collect()[0]
    assert r["profile"] == [""]
    assert r["errors"] == [
        "No value for locus abcZ.",
        "Value provided for unknown locus nope.",
    ]


from hypothesis import given, settings, strategies as st

SEQ = st.text(alphabet="ACGTacgt -.", min_size=0, max_size=30)


@settings(max_examples=8, deadline=None)
@given(seqs=st.lists(st.tuples(st.sampled_from(["a", "b", "c", ""]), SEQ),
                     min_size=1, max_size=8))
@pytest.mark.slow
def test_check_new_alleles_properties(spark, seqs):
    """Invariants over random submissions: one output row per input
    row, status==pending iff errors empty, cleaned sequence has no
    gap/space chars, and a non-empty valid-length unique sequence that
    matches an existing md5 is always rejected as already-defined."""
    df = spark.createDataFrame(seqs, "seq_id string, sequence string")
    existing = _existing(spark)
    out = check_new_alleles(
        df, existing, "abcZ", min_length=1, max_length=100, check_similarity=False
    ).collect()
    assert len(out) == len(seqs)
    for r in out:
        assert (r["status"] == "pending") == (len(r["errors"]) == 0)
        assert not any(ch in r["sequence"] for ch in " -.")
