"""BLAST tabular-output contract tests (Offline/Blast.pm parse
semantics) against a recorded-format -outfmt 6 golden fixture — the
test that fails if the adapter's contract drifts from real BLAST
output (12-column tabular, locus|allele|length subject headers in both
separator eras)."""

from __future__ import annotations

import pathlib

import pytest

from bigsdb_spark.operators.blastparse import (
    blast_exact_matches,
    blast_partial_matches,
    parse_blast_tabular,
)

FIXTURE = str(pathlib.Path(__file__).parent / "fixtures" / "blast_outfmt6.tsv")


@pytest.fixture(scope="module")
def parsed(spark):
    lines = spark.read.text(FIXTURE).withColumnRenamed("value", "line")
    return parse_blast_tabular(lines).cache()


def test_parse_splits_both_header_eras(parsed):
    rows = {(r.locus, r.allele): r.length for r in parsed.collect()}
    assert rows[("abcZ", "1")] == 100      # '|' era
    assert rows[("adk", "3")] == 90        # '||' era (v1.48.x cache)
    assert parsed.count() == 7


def test_exact_tier_full_span_dedup_and_reverse(parsed):
    got = {
        (r.locus, r.allele): r for r in blast_exact_matches(parsed).collect()
    }
    assert len(got) == 2  # the 99%-identity duplicate at the same start deduped
    fwd = got[("abcZ", "1")]
    assert (fwd.start, fwd.end, fwd.reverse) == (201, 300, False)
    assert fwd.identity == 100.0  # first record in file order won
    rev = got[("abcZ", "2")]
    assert (rev.start, rev.end, rev.reverse) == (301, 400, True)
    # the gapped full-span record (mismatches=4) must NOT be exact
    assert all(r.identity == 100.0 for r in got.values())


def test_partial_tier_predicted_ends_forward(parsed):
    got = {
        (r.locus, r.allele, r.gap_adjusted): r
        for r in blast_partial_matches(parsed).collect()
    }
    # forward fragment: subject 11..70 of a 90 bp allele at query 501..560
    m = got[("adk", "3", False)]
    assert (m.start, m.end, m.reverse) == (501, 560, False)
    assert (m.predicted_start, m.predicted_end) == (491, 580)


def test_partial_tier_predicted_ends_reverse(parsed):
    got = {
        (r.locus, r.allele, r.gap_adjusted): r
        for r in blast_partial_matches(parsed).collect()
    }
    # reversed fragment covering the allele's 31..60 tail
    m = got[("pgm", "5", False)]
    assert m.reverse and (m.start, m.end) == (621, 650)
    assert (m.predicted_start, m.predicted_end) == (621, 680)


def test_partial_tier_gap_split_second_record(parsed):
    got = {
        (r.locus, r.allele, r.gap_adjusted): r
        for r in blast_partial_matches(parsed).collect()
    }
    # gapped 105-col alignment over a 100 bp allele -> two predictions
    plain = got[("abcZ", "2", False)]
    gap = got[("abcZ", "2", True)]
    assert plain.identity == 91.0 or plain.identity == 100.0
    g91 = [
        r for (l, a, adj), r in got.items()
        if l == "abcZ" and a == "2" and adj
    ]
    assert len(g91) == 1 and g91[0].alignment == 105
    assert g91[0].predicted_end - g91[0].predicted_start + 1 == 105
    assert gap.gaps == 2


def test_partial_tier_best_poor_fallback(parsed):
    # defaults (thresholds unset): glnA's only record fails identity 90
    # but is kept as the locus's best record
    default_rows = blast_partial_matches(parsed)
    assert default_rows.filter("locus = 'glnA'").count() == 1
    # explicit thresholds: no poor fallback (reference return_best_poor_*)
    strict = blast_partial_matches(parsed, identity=92.0, alignment=50.0)
    assert strict.filter("locus = 'glnA'").count() == 0
    # and the 91%-identity gapped record drops too
    assert strict.filter("locus = 'abcZ' AND identity < 92").count() == 0


def test_partial_tier_excludes_exactly_matched_loci(parsed):
    exact = blast_exact_matches(parsed)
    got = blast_partial_matches(parsed, exact=exact)
    # abcZ matched exactly -> all its partial records drop (Blast.pm:464)
    assert got.filter("locus = 'abcZ'").count() == 0
    assert got.filter("locus = 'adk'").count() == 1


def test_external_tool_to_parser_end_to_end(spark, tmp_path):
    """Full adapter chain with a real subprocess: a fake blastn
    executable (emits recorded outfmt-6 lines for any stdin, the shape
    a real BLAST+ run produces) -> ExternalTool.pipe_lines -> tabular
    parser -> match records. Exercises available(), the mapPartitions
    subprocess pipe, and the parse contract in one path — only the
    binary is fake."""
    import os
    import stat

    from bigsdb_spark.operators.seqmatch import ExternalTool

    exe = tmp_path / "fake-blastn"
    exe.write_text("#!/bin/sh\ncat %s\n" % FIXTURE)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)

    tool = ExternalTool(command=[str(exe)])
    assert tool.available()
    queries = spark.createDataFrame(
        [(">contig1",), ("GATTACA",)], "line string"
    ).coalesce(1)
    out = tool.pipe_lines(queries, "line")
    parsed = parse_blast_tabular(out)
    assert parsed.count() == 7
    exact = {
        (r.locus, r.allele) for r in blast_exact_matches(parsed).collect()
    }
    assert exact == {("abcZ", "1"), ("abcZ", "2")}
