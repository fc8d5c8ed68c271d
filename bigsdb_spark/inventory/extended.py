"""Inventory: remaining SURVEY §2 surface — dropdown filter stacks,
geo-point predicates, set-op composition, per-position polymorphism /
codon usage, next-id assignment, and the sequential LIN-code
assignment.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigsdb_spark.inventory._lincode_expected import LINCODE_ORACLE_SQL
from bigsdb_spark.inventory.registry import DNA_SQL, dna_expr, register, tbl
from bigsdb_spark.operators.lincodes import assign_lincodes
from bigsdb_spark.operators.profiles import build_profiles


@register(
    "p11_filter_stack",
    oracle="""
    SELECT o_orderkey FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE upper(c_mktsegment) = 'BUILDING'
      AND o_orderstatus = 'O'
      AND c_custkey NOT IN (11, 77, 200)
    """,
)
def p11_filters(spark, sf_dir):
    """P11: dropdown filter stack — membership semi-join (project
    filter) + status filter + embargo/private anti-join, ANDed together
    (IsolateQueryPage.pm:2639-2846)."""
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    members = tbl(spark, sf_dir, "customer").filter(
        F.upper(F.col("c_mktsegment")) == "BUILDING"
    )
    embargo = spark.createDataFrame([(v,) for v in [11, 77, 200]], ["c_custkey"])
    allowed = members.join(F.broadcast(embargo), on="c_custkey", how="left_anti")
    return o.join(
        allowed.select(F.col("c_custkey").alias("o_custkey")),
        on="o_custkey",
        how="left_semi",
    ).select("o_orderkey")


@register(
    "p12_geo_point",
    oracle="""
    SELECT event_id, value AS lat, CAST(json_extract_string(props, '$.k')
           AS DOUBLE) AS long
    FROM events
    WHERE value > 5.0 AND CAST(json_extract_string(props, '$.k') AS DOUBLE) <= 50.0
    """,
)
def p12_geo(spark, sf_dir):
    """P12: geography-point predicates — the point is a StructType
    {lat, long} and comparisons address its fields, the Spark analogue
    of ST_Y(f::geometry)/ST_X (IsolateQueryPage.pm:2520-2523)."""
    e = tbl(spark, sf_dir, "events")
    pt = F.struct(
        F.col("value").alias("lat"),
        F.get_json_object("props", "$.k").cast("double").alias("long"),
    )
    withpt = e.select("event_id", pt.alias("pt"))
    return withpt.filter(
        (F.col("pt.lat") > 5.0) & (F.col("pt.long") <= 50.0)
    ).select("event_id", F.col("pt.lat").alias("lat"), F.col("pt.long").alias("long"))


@register(
    "o4_o5_set_distinct",
    oracle="""
    SELECT 'setops' AS kind, c_custkey AS k, CAST(NULL AS VARCHAR) AS label
    FROM (
        (SELECT c_custkey FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey WHERE upper(r_name) = 'EUROPE'
         INTERSECT
         SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 10)
        EXCEPT
        SELECT c_custkey FROM customer WHERE upper(c_mktsegment) = 'MACHINERY')
    UNION ALL
    SELECT 'distinct_pairs' AS kind, c_nationkey AS k, c_mktsegment AS label
    FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
    """,
)
def o4_o5(spark, sf_dir):
    """O4 + O5: set-operator composition of result sets (the reference
    composes via AND/OR of membership subqueries — INTERSECT/EXCEPT come
    free in Spark) and the DISTINCT projection (cluster.pl:137 shape)."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region").filter(F.upper(F.col("r_name")) == "EUROPE")
    euro = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey")
    )
    busy = (
        tbl(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    machinery = c.filter(F.upper(F.col("c_mktsegment")) == "MACHINERY").select(
        "c_custkey"
    )
    setops = (
        euro.intersect(busy)
        .subtract(machinery)
        .select(
            F.lit("setops").alias("kind"),
            F.col("c_custkey").alias("k"),
            F.lit(None).cast("string").alias("label"),
        )
    )
    pairs = (
        c.select("c_nationkey", "c_mktsegment")
        .distinct()
        .select(
            F.lit("distinct_pairs").alias("kind"),
            F.col("c_nationkey").alias("k"),
            F.col("c_mktsegment").alias("label"),
        )
    )
    return setops.unionByName(pairs)


_DNA_SQL = DNA_SQL  # shared registry spelling (oracle + Spark expression)


@register(
    "d9_polymorphic_sites",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DNA_SQL} AS seq FROM documents),
    long AS (
        SELECT i AS pos, substr(seq, i, 1) AS residue
        FROM d, UNNEST(range(1, 21)) AS u(i)
        WHERE length(seq) >= 20),
    freq AS (SELECT pos, residue, count(*) AS n FROM long GROUP BY 1, 2)
    SELECT pos, residue, n,
           round(n * 100.0 / sum(n) OVER (PARTITION BY pos), 4) AS pct
    FROM freq
    """,
)
def d9_polymorphisms(spark, sf_dir):
    """D9: per-position residue frequency over a locus's alleles
    (LocusExplorer.pm:334 _snp / :811 get_freq_table) — posexplode to
    long (pos, residue) then groupBy; percentage over a per-position
    window."""
    docs = tbl(spark, sf_dir, "documents")
    d = docs.select(
        dna_expr("text").alias("seq")
    ).filter(F.length("seq") >= 20)
    long = d.select(
        F.explode(F.sequence(F.lit(1), F.lit(20))).alias("pos"), "seq"
    ).select("pos", F.substring(F.col("seq"), F.col("pos"), F.lit(1)).alias("residue"))
    freq = long.groupBy("pos", "residue").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("pos")
    return freq.select(
        "pos", "residue", "n",
        F.round(F.col("n") * 100.0 / F.sum("n").over(w), 4).alias("pct"),
    )


@register(
    "d10_codon_usage",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DNA_SQL} AS seq FROM documents),
    codons AS (
        SELECT substr(seq, i * 3 + 1, 3) AS codon
        FROM d, UNNEST(range(0, 10)) AS u(i)
        WHERE length(seq) >= 30)
    SELECT codon, count(*) AS n FROM codons GROUP BY codon
    """,
)
def d10_codons(spark, sf_dir):
    """D10: codon usage frequency (Plugins/CodonUsage.pm) — explode
    non-overlapping 3-mers, groupBy codon."""
    docs = tbl(spark, sf_dir, "documents")
    d = docs.select(
        dna_expr("text").alias("seq")
    ).filter(F.length("seq") >= 30)
    codons = d.select(
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("i"), "seq"
    ).select(F.substring(F.col("seq"), F.col("i") * 3 + 1, F.lit(3)).alias("codon"))
    return codons.groupBy("codon").agg(F.count(F.lit(1)).alias("n"))


@register(
    "w5_next_id_assignment",
    oracle="""
    SELECT CAST(max(o_orderkey) + 1 AS BIGINT) AS next_id,
           count(*) AS n_existing
    FROM orders
    """,
)
def w5_next_id(spark, sf_dir):
    """W5: next-allele-id assignment — max+1 over existing ids
    (Datastore.pm:2940 get_next_allele_id; retired-id skip is a filter
    on the same aggregation)."""
    o = tbl(spark, sf_dir, "orders")
    return o.agg(
        (F.max("o_orderkey") + 1).cast("long").alias("next_id"),
        F.count(F.lit(1)).alias("n_existing"),
    )


@register("d5_lincode_assignment", oracle=LINCODE_ORACLE_SQL)
def d5_lincodes(spark, sf_dir):
    """D5: LIN-code assignment over the anchored profile subset.
    Sequential by construction (each code depends on all previously
    assigned ones, lincodes.pl:177-330), so codes resolve in profile-id
    order while the distance scan vs already-coded profiles runs in
    Spark per micro-batch (operators/lincodes.py).

    Value oracle: an INDEPENDENT strictly-sequential pure-Python port of
    the reference algorithm (tools/lincode_oracle.py — no shared code
    with the operator) emits the expected (profile_key, lincode) rows as
    a VALUES table, discriminated by the anchor subset's (count, sum) so
    one static SQL string is exact at both sf0.001 and sf0.01. Hand
    fixtures in tests/test_stats_clustering.py additionally pin the
    reference corner cases.

    The array-typed code is projected to a scalar '_'-joined string for
    the gate (the driver canonicalizer sorts values and cannot hash
    array cells — VERDICT r1 fix #2)."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % 40 == 0) & (F.col("l_orderkey") < 4000)
    )
    prof = build_profiles(
        li, "l_orderkey", "l_linenumber", "l_returnflag"
    ).select(
        F.lpad(F.col("profile_key").cast("string"), 20, "0").alias("profile_key"),
        "profile",
    )
    out = assign_lincodes(spark, prof, thresholds=[2, 1])
    return out.select(
        "profile_key",
        F.array_join(
            F.transform("lincode", lambda x: x.cast("string")), "_"
        ).alias("lincode"),
    )
