"""End-to-end user journey: the workflow a reference user runs daily,
wired through this engine's modules — CSV upload with validation ->
profile build -> scheme-field assignment (md5 join) -> auto-definition
of new profiles -> QuerySpec query with paging -> breakdown -> exports
(wide dataset, GrapeTree, Newick). Proves the pieces compose."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigsdb_spark.operators.breakdown import field_frequency
from bigsdb_spark.operators.export_dataset import dataset_export
from bigsdb_spark.operators.profiles import (
    assign_scheme_fields,
    build_profiles,
    define_new_profiles,
    profile_pair_distances,
)
from bigsdb_spark.plans.queryspec import FormRow, QuerySpec, run_query
from bigsdb_spark.registry import FieldDef, TableDef
from bigsdb_spark.sources.batchload import batch_load_csv
from bigsdb_spark.sources.sinks import to_grapetree_profiles, to_newick_upgma


ISOLATE_TABLE = TableDef(
    "isolates",
    [
        FieldDef("id", "int", required=True),
        FieldDef("country", "text", required=True),
        FieldDef("year", "int"),
    ],
)

CSV = """id\tcountry\tyear
1\tFrance\t2020
2\tKenya\t2021
3\tFrance\t2019
4\tChile\tnot_a_year
"""


def test_full_workflow(spark, tmp_path):
    # 1. upload + validation: row 4 has a malformed year -> invalid
    up = tmp_path / "upload.tsv"
    up.write_text(CSV)
    valid, invalid = batch_load_csv(spark, str(up), ISOLATE_TABLE)
    isolates = valid.cache()
    assert isolates.count() == 3
    assert invalid.count() == 1

    # 2. designations -> per-isolate profiles
    desig = spark.createDataFrame(
        [
            (1, "abcZ", "1"), (1, "adk", "2"),
            (2, "abcZ", "1"), (2, "adk", "2"),   # same ST as isolate 1
            (3, "abcZ", "3"), (3, "adk", "4"),   # unknown profile
        ],
        "id int, locus string, allele string",
    )
    prof = build_profiles(desig, "id", "locus", "allele")

    # 3. scheme-field assignment via the md5 fast path
    scheme = build_profiles(
        spark.createDataFrame(
            [("11", "abcZ", "1"), ("11", "adk", "2")],
            "st string, locus string, allele string",
        ),
        "st", "locus", "allele",
    ).withColumnRenamed("profile_key", "st")
    assigned = assign_scheme_fields(prof, scheme.select("st", "profile_md5"))
    st_by_iso = {r["profile_key"]: r["st"] for r in assigned.collect()}
    # inner semantics, like the reference cache: only matches get a row
    assert st_by_iso == {1: "11", 2: "11"}

    # 4. the unknown profile becomes a newly-defined ST (max 11 + 1)
    new_profiles = define_new_profiles(prof, scheme.withColumnRenamed("st", "profile_key"))
    new = new_profiles.collect()
    assert len(new) == 1 and new[0]["st"] == "12" and new[0]["isolate_keys"] == [3]

    # 5. QuerySpec query: country=France, ordered, paged
    spec = QuerySpec(
        rows=[FormRow("country", "=", "France")],
        order_by=[("year", True)],
        tiebreak=["id"],
        limit=10,
    )
    hits = run_query(isolates, spec)
    assert [r["id"] for r in hits.collect()] == [3, 1]

    # 6. breakdown over the query result
    freq = {r["label"]: r["n"] for r in field_frequency(isolates, "country").collect()}
    assert freq == {"France": 2, "Kenya": 1, "Chile": 1} or freq == {
        "France": 2, "Kenya": 1,
    }

    # 7. wide export joining designations + assigned scheme field
    cache = assigned.select(F.col("profile_key").alias("isolate_id"), "st")
    desig_keyed = desig.select(
        F.col("id").alias("isolate_id"), "locus", F.col("allele").alias("allele_id")
    )
    wide = dataset_export(
        isolates.withColumnRenamed("id", "isolate_id"),
        ["country"],
        designations=desig_keyed,
        loci=["abcZ", "adk"],
        scheme_cache=cache,
        scheme_fields=["st"],
    )
    w = {r["isolate_id"]: r for r in wide.collect()}
    assert w[1]["abcZ"] == "1" and w[1]["st"] == "11"
    assert w[3]["st"] is None

    # 8. tree-tool exports from the same profiles
    gt = to_grapetree_profiles(prof, ["abcZ", "adk"])
    assert gt.startswith("#isolate\tabcZ\tadk")
    dist = profile_pair_distances(desig, "id", "locus", "allele")
    newick = to_newick_upgma(dist, id1="id1", id2="id2", dist_col="hamming")
    assert newick.count("(") == 2 and newick.endswith(";\n")
    isolates.unpersist()
