"""In-silico PCR, query store round-trip, skew utilities, batch loader,
and the wide profile export (GrapeTree shape)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigsdb_spark.operators.pcr import insilico_pcr
from bigsdb_spark.operators.profiles import build_profiles
from bigsdb_spark.operators.skew import salted_aggregate, salted_join
from bigsdb_spark.plans.querystore import QueryStore
from bigsdb_spark.plans.queryspec import FormRow, QuerySpec
from bigsdb_spark.registry import FieldDef, TableDef
from bigsdb_spark.sources.batchload import batch_load_csv


@pytest.mark.slow
def test_insilico_pcr(spark):
    #          1         2         3
    # 123456789012345678901234567890123456
    # forward GGAATT at 4; reverse primer CCTTGG -> revcomp CCAAGG at 16
    contig = "AAAGGAATTCCCCCCCCAAGGTTT"
    contigs = spark.createDataFrame([(1, contig)], "id long, sequence string")
    pairs = spark.createDataFrame(
        [("p1", "GGAATT", "CCTTGG")], "pair_id string, forward string, reverse string"
    )
    got = insilico_pcr(contigs, pairs).collect()
    assert len(got) == 1
    amp = got[0]
    assert amp.start_pos == 4
    assert contig[amp.start_pos - 1 : amp.end_pos] == "GGAATTCCCCCCCCAAGG"
    assert amp.product_len == 18
    # product cap excludes the pair
    assert insilico_pcr(contigs, pairs, max_product=10).count() == 0


@pytest.mark.slow
def test_insilico_pcr_reverse_strand(spark):
    """ipcress also reports amplicons where the pair binds the - strand:
    on the + strand that reads reverse primer ... revcomp(forward)."""
    #          1         2
    # 12345678901234567890123
    contig = "AAACCTTGGCCCCCAATTCCTTT"  # CCTTGG at 4, AATTCC at 15
    contigs = spark.createDataFrame([(1, contig)], "id long, sequence string")
    pairs = spark.createDataFrame(
        [("p1", "GGAATT", "CCTTGG")], "pair_id string, forward string, reverse string"
    )
    got = insilico_pcr(contigs, pairs).collect()
    assert len(got) == 1 and got[0].orientation == "R"
    assert got[0].start_pos == 4 and got[0].end_pos == 20
    assert got[0].product_len == 17
    # no primers at all -> empty result, no crash
    empty = pairs.filter("pair_id = 'nope'")
    assert insilico_pcr(contigs, empty).count() == 0


def test_query_store_roundtrip(spark, tmp_path):
    store = QueryStore(str(tmp_path / "queries"))
    spec = QuerySpec(
        rows=[FormRow("country", "=", "France")],
        order_by=[("id", True)],
        limit=2,
    )
    qid = store.save(spec)
    assert store.save(spec) == qid  # content-addressed: same spec, same id
    view = spark.createDataFrame(
        [(1, "France"), (2, "france"), (3, "Spain")], "id int, country string"
    )
    got = [r.id for r in store.run(qid, view).collect()]
    assert got == [1, 2]


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(100)] + [("cold", 1.0)],
        "k string, v double",
    )
    got = {
        r.k: (r.count_k, r.sum_v)
        for r in salted_aggregate(df, "k", {"k": "count", "v": "sum"}).collect()
    }
    assert got["hot"] == (100, sum(range(100)))
    assert got["cold"] == (1, 1.0)


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame([("a", i) for i in range(50)], "k string, v int")
    small = spark.createDataFrame([("a", "dim")], "k string, label string")
    plain = big.join(small, on="k").count()
    assert salted_join(big, small, "k").count() == plain


def test_batch_load_validation_split(spark, tmp_path):
    table = TableDef(
        "isolates",
        [
            FieldDef("id", "int", required=True),
            FieldDef("country", optlist=["France", "Spain"]),
            FieldDef("year", "int", min=1900, max=2030),
        ],
    )
    p = tmp_path / "upload.tsv"
    p.write_text(
        "id\tcountry\tyear\n"
        "1\tFrance\t2010\n"
        "2\tMars\t2011\n"       # bad optlist
        "notanint\tSpain\t1800\n"  # id cast fails -> required; year below min
    )
    valid, invalid = batch_load_csv(spark, str(p), table)
    assert [r.id for r in valid.collect()] == [1]
    errs = {tuple(r.errors) for r in invalid.collect()}
    assert ("country: not in optlist",) in errs
    # the unparseable id is BOTH missing-after-cast and flagged as a
    # bad-format value (check_format semantics)
    assert ("id: required", "year: below min", "id: invalid int") in errs
    # unknown column rejected like the reference's header check
    p2 = tmp_path / "bad.tsv"
    p2.write_text("id\tbogus\n1\tx\n")
    try:
        batch_load_csv(spark, str(p2), table)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "bogus" in str(e)


def test_batch_load_flags_bad_elements_of_multiple_fields(spark, tmp_path):
    """A malformed element inside a separator-joined `multiple` typed
    cell is a validation error, not a silent NULL array slot."""
    table = TableDef(
        "isolates",
        [
            FieldDef("id", "int", required=True),
            FieldDef("years", "int", multiple=True),
        ],
    )
    p = tmp_path / "multi.tsv"
    p.write_text(
        "id\tyears\n"
        "1\t2010;2011\n"   # clean
        "2\t2010;x;2012\n"  # bad element
    )
    valid, invalid = batch_load_csv(spark, str(p), table)
    assert [r.id for r in valid.collect()] == [1]
    bad = invalid.collect()
    assert len(bad) == 1 and bad[0].id == 2
    assert "years: invalid int" in bad[0].errors


def test_wide_profile_export_shape(spark):
    """D8: the GrapeTree/PhyloViz input is the wide profile table —
    id + one column per locus (Plugins/GrapeTree.pm)."""
    rows = [(1, "a", "1"), (1, "b", "2"), (2, "a", "3"), (2, "b", "4")]
    long_df = spark.createDataFrame(rows, "iso int, locus string, allele string")
    prof = build_profiles(long_df, "iso", "locus", "allele")
    loci = ["a", "b"]
    wide = prof.select(
        "profile_key",
        *[F.col("profile")[i].alias(loci[i]) for i in range(len(loci))],
    )
    got = {r.profile_key: (r.a, r.b) for r in wide.collect()}
    assert got == {1: ("1", "2"), 2: ("3", "4")}


def test_materialization_drops_stale_versions(spark, tmp_path):
    """Regression: refreshes must delete superseded versions (keep the
    live one + its predecessor), not accumulate full copies forever."""
    import os
    from bigsdb_spark.cache import Materialization

    m = Materialization(spark, str(tmp_path), "mat")
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    for i in range(4):
        m.refresh_full(df)
    versions = [d for d in os.listdir(m.dir) if d.startswith("snap-")]
    assert len(versions) == 2  # live version + its predecessor
    assert m.log.versions() == [2, 3]
    assert m.read().count() == 1  # latest commit still valid


def test_batchload_multiple_field_skips_empty_interior_elements(spark, tmp_path):
    """Regression (ADVICE r2): '2010;;2012' passed element validation
    (empty elements skipped) while the load kept a silent NULL slot in
    the array. Empty elements mean 'not provided' — they are dropped
    from the loaded array, and the row stays valid."""
    from bigsdb_spark.registry import FieldDef, TableDef

    table = TableDef(
        "t",
        [
            FieldDef("id", "int", required=True),
            FieldDef("years", "int", multiple=True),
        ],
    )
    p = tmp_path / "multi.tsv"
    p.write_text("id\tyears\n1\t2010;;2012\n2\t2010;x;2012\n")
    valid, invalid = batch_load_csv(spark, str(p), table)
    vrows = {r.id: r for r in valid.collect()}
    assert list(vrows[1].years) == [2010, 2012]  # no NULL slot
    bad = invalid.collect()
    assert len(bad) == 1 and bad[0].id == 2
    assert any("years" in e for e in bad[0].errors)
