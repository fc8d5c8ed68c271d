"""End-to-end BIGSdb workflow on synthetic domain data: access view →
designation pivot → ST assignment → materialized scheme cache →
REST-shaped query joining the cache → breakdown → clustering →
incremental cache refresh equivalence.

This is the reference's §3.1 lifecycle exercised as one pipeline, with
the cache maintained the way update_scheme_caches.pl would.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bigsdb_spark.cache import Materialization
from bigsdb_spark.operators.breakdown import field_frequency
from bigsdb_spark.operators.clustering import single_linkage
from bigsdb_spark.operators.profiles import (
    assign_scheme_fields,
    build_profiles,
    matching_profiles,
    profile_pair_distances,
    scheme_completeness,
)
from bigsdb_spark.plans.queryspec import run_query
from bigsdb_spark.plans.rest import parse_search
from bigsdb_spark.registry import FieldDef, TableDef
from bigsdb_spark.views import UserContext, make_view

LOCI = ["abcZ", "adk", "aroE", "fumC", "gdh", "pdhC", "pgm"]
N_ISOLATES = 60


def _gen(rng, n):
    """Deterministic synthetic isolates + designations with clustered
    profiles (a few STs dominate, like real MLST data)."""
    base_profiles = [
        [str(rng.randint(1, 5)) for _ in LOCI] for _ in range(6)
    ]
    isolates, designations = [], []
    for i in range(1, n + 1):
        country = rng.choice(["France", "Spain", "UK [England]"])
        year = 2015 + i % 10
        isolates.append((i, None, country, year))
        prof = list(rng.choice(base_profiles))
        if i % 7 == 0:  # SLV mutant
            prof[rng.randrange(len(LOCI))] = str(rng.randint(6, 9))
        for locus, allele in zip(LOCI, prof):
            designations.append((i, locus, allele))
    return isolates, designations


@pytest.fixture(scope="module")
def world(spark):
    rng = random.Random(42)
    iso_rows, desig_rows = _gen(rng, N_ISOLATES)
    isolates = spark.createDataFrame(
        iso_rows, "id int, new_version int, country string, year int"
    )
    designations = spark.createDataFrame(
        desig_rows, "isolate_id int, locus string, allele_id string"
    )
    # seqdef side: every distinct observed profile becomes an ST
    profs = build_profiles(designations, "isolate_id", "locus", "allele_id")
    distinct = profs.select("profile", "profile_md5").distinct()
    scheme = distinct.withColumn(
        "st", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                "profile_md5"
            )
        ).cast("string")
    )
    return isolates, designations, scheme


@pytest.mark.slow
def test_full_pipeline(spark, world, tmp_path):
    isolates, designations, scheme = world
    view = make_view(isolates, UserContext())  # S1

    # A5: pivot + md5 assignment, materialized as the scheme cache (X1)
    profs = build_profiles(designations, "isolate_id", "locus", "allele_id")
    assigned = assign_scheme_fields(profs, scheme).withColumnRenamed(
        "profile_key", "id"
    )
    mat = Materialization(spark, str(tmp_path), "scheme_fields_1")
    mat.refresh_full(assigned)
    cache = mat.read()
    assert cache.count() == N_ISOLATES  # every isolate got exactly one ST

    # A6: completeness — complete designation sets everywhere
    loci_df = spark.createDataFrame([(x,) for x in LOCI], "locus string")
    comp = scheme_completeness(designations, loci_df, "isolate_id", "locus", len(LOCI))
    assert comp.filter(F.col("completeness") < 1.0).count() == 0

    # §3.2: REST search joining provenance + the scheme cache (J2)
    table = TableDef(
        "isolates",
        [FieldDef("id", "int"), FieldDef("country"), FieldDef("year", "int")],
    )
    rq = parse_search(
        {"field.country": "france", "field.year": {"operator": ">=", "value": 2016},
         "page": 1, "page_size": 100},
        table,
    )
    hits = run_query(view, rq.spec).join(cache, on="id")
    assert hits.count() > 0
    assert hits.filter(F.upper("country") != "FRANCE").count() == 0
    assert "st" in hits.columns

    # A1: ST frequency breakdown over the result set
    freq = field_frequency(hits, "st")
    assert freq.agg(F.sum("n")).collect()[0][0] == hits.count()

    # D2+D4: SLV clusters over the observed profiles
    pairs = matching_profiles(
        profile_pair_distances(designations, "isolate_id", "locus", "allele_id"),
        total_loci=len(LOCI),
        k=1,
    )
    groups = single_linkage(pairs.select("id1", "id2"), view.select("id"))
    assert groups.count() == N_ISOLATES
    # same ST -> same cluster (distance 0 <= k)
    st_groups = cache.join(groups, cache["id"] == groups["id"]).select(
        "st", "group_id"
    )
    assert st_groups.groupBy("st").agg(
        F.countDistinct("group_id").alias("g")
    ).filter(F.col("g") > 1).count() == 0


def test_incremental_cache_equals_full(spark, world, tmp_path):
    """X1: incremental refresh (changed isolates only) must equal a full
    rebuild — the reference's incremental vs full mode equivalence."""
    isolates, designations, scheme = world
    profs = build_profiles(designations, "isolate_id", "locus", "allele_id")
    assigned = assign_scheme_fields(profs, scheme).withColumnRenamed(
        "profile_key", "id"
    )
    mat = Materialization(spark, str(tmp_path), "cache_incr")
    mat.refresh_full(assigned)

    # isolate 1 gets a new designation set (copy isolate 2's profile)
    new_desig = designations.filter(F.col("isolate_id") != 1).unionByName(
        designations.filter(F.col("isolate_id") == 2).select(
            F.lit(1).alias("isolate_id"), "locus", "allele_id"
        )
    )
    changed = spark.createDataFrame([(1,)], "id int")
    re_profs = build_profiles(
        new_desig.filter(F.col("isolate_id") == 1), "isolate_id", "locus", "allele_id"
    )
    recomputed = assign_scheme_fields(re_profs, scheme).withColumnRenamed(
        "profile_key", "id"
    )
    mat.refresh_incremental(recomputed, changed, "id")

    full = assign_scheme_fields(
        build_profiles(new_desig, "isolate_id", "locus", "allele_id"), scheme
    ).withColumnRenamed("profile_key", "id")
    inc = {(r.id, r.st) for r in mat.read().collect()}
    ful = {(r.id, r.st) for r in full.collect()}
    assert inc == ful
    # and isolate 1 now shares isolate 2's ST
    st = {r.id: r.st for r in mat.read().filter(F.col("id").isin(1, 2)).collect()}
    assert st[1] == st[2]
