"""Inventory: aggregation / breakdown / pivot-cache family (SURVEY §2.4)
on the driver's tables — lineitem plays allele_designations (order =
isolate, linenumber = locus, returnflag = allele), which gives the
profile-pivot operators real multi-row vectors to chew on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigsdb_spark.inventory.registry import register, tbl
from bigsdb_spark.operators.breakdown import (
    combination_counts,
    crosstab_pct,
    field_frequency,
    histogram,
)
from bigsdb_spark.operators.counts import with_count_predicate
from bigsdb_spark.operators.profiles import build_profiles
from bigsdb_spark.operators.stats import group_stats, n_stats


@register(
    "a1_field_frequency",
    oracle="""
    SELECT n_name AS label, count(*) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def a1_freq(spark, sf_dir):
    """A1: field frequency breakdown (FieldBreakdown.pm:851-1008)."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    return field_frequency(j, "n_name")


@register(
    "a2_crosstab_pct",
    oracle="""
    WITH c AS (
        SELECT c_mktsegment, n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY c_mktsegment, n_name)
    SELECT c_mktsegment, n_name, n,
           round(n * 100.0 / sum(n) OVER (PARTITION BY c_mktsegment), 4) AS pct_row,
           round(n * 100.0 / sum(n) OVER (), 4) AS pct_total
    FROM c
    """,
)
def a2_crosstab(spark, sf_dir):
    """A2: two-field crosstab with row/dataset percentages
    (TwoFieldBreakdown.pm:466)."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    return crosstab_pct(j, "c_mktsegment", "n_name")


@register(
    "a2_crosstab_wide",
    oracle="""
    SELECT c_mktsegment,
           CAST(sum(CASE WHEN r_name = 'AFRICA' THEN 1 ELSE 0 END) AS BIGINT) AS africa,
           CAST(sum(CASE WHEN r_name = 'AMERICA' THEN 1 ELSE 0 END) AS BIGINT) AS america,
           CAST(sum(CASE WHEN r_name = 'ASIA' THEN 1 ELSE 0 END) AS BIGINT) AS asia,
           CAST(sum(CASE WHEN r_name = 'EUROPE' THEN 1 ELSE 0 END) AS BIGINT) AS europe,
           CAST(sum(CASE WHEN r_name = 'MIDDLE EAST' THEN 1 ELSE 0 END) AS BIGINT)
               AS middle_east
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY c_mktsegment
    """,
)
def a2_wide(spark, sf_dir):
    """A2 wide form: groupBy().pivot() with explicit values — the
    stable-schema scale path (no distinct-discovery pass)."""
    from bigsdb_spark.operators.breakdown import crosstab_wide

    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    j = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    wide = crosstab_wide(
        j, "c_mktsegment", "r_name",
        values=["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    )
    renames = {
        "AFRICA": "africa", "AMERICA": "america", "ASIA": "asia",
        "EUROPE": "europe", "MIDDLE EAST": "middle_east",
    }
    out = wide
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out.select(
        "c_mktsegment",
        *[F.col(v).cast("long").alias(v) for v in renames.values()],
    )


@register(
    "a3_rollup_combinations",
    oracle="""
    SELECT coalesce(o_orderpriority, '<all>') AS o_orderpriority,
           coalesce(o_orderstatus, '<all>') AS o_orderstatus,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def a3_rollup(spark, sf_dir):
    """A3: Data-Explorer multi-field combination counts + drill-down
    hierarchy == ROLLUP (DataExplorerPage.pm:218-286)."""
    o = tbl(spark, sf_dir, "orders")
    return combination_counts(o, ["o_orderpriority", "o_orderstatus"], rollup=True)


@register(
    "a4_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bin,
           CAST(floor(o_totalprice / 25000) AS BIGINT)
               * CAST(25000.0 AS DOUBLE) AS bin_start,
           count(*) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def a4_hist(spark, sf_dir):
    """A4: dashboard histogram ranges (DashboardPage.pm:1524)."""
    return histogram(tbl(spark, sf_dir, "orders"), "o_totalprice", 25000.0)


@register(
    "a4_top_n_with_others",
    oracle="""
    WITH counts AS (
        SELECT coalesce(event_type, 'No value') AS label, count(*) AS n
        FROM events GROUP BY 1),
    ranked AS (
        SELECT label, n, row_number() OVER (ORDER BY n DESC, label) AS rnk
        FROM counts)
    SELECT label, CAST(n AS BIGINT) AS n FROM ranked WHERE rnk <= 3
    UNION ALL
    SELECT 'Others' AS label, CAST(sum(n) AS BIGINT) AS n
    FROM ranked WHERE rnk > 3 HAVING sum(n) IS NOT NULL
    """,
)
def a4_top_others(spark, sf_dir):
    """A4/W1: dashboard chart shape — top-N labels (NULL coalesced to
    'No value', DashboardPage.pm:2196) plus an 'Others' bucket rolling
    up the tail (:2242 caps value lists the same way)."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "events")
    counts = e.groupBy(
        F.coalesce(F.col("event_type"), F.lit("No value")).alias("label")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("label"))
    ranked = counts.withColumn("rnk", F.row_number().over(w))
    top = ranked.filter(F.col("rnk") <= 3).select("label", "n")
    others = (
        ranked.filter(F.col("rnk") > 3)
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n").isNotNull())
        .select(F.lit("Others").alias("label"), F.col("n").cast("long").alias("n"))
    )
    return top.unionByName(others)


@register(
    "a5_profile_pivot_md5",
    oracle="""
    WITH prof AS (
        SELECT l_orderkey,
               md5(string_agg(l_returnflag, ','
                   ORDER BY l_linenumber, l_returnflag)) AS profile_md5
        FROM lineitem GROUP BY l_orderkey)
    SELECT profile_md5, count(*) AS n_orders FROM prof GROUP BY profile_md5
    """,
)
def a5_pivot(spark, sf_dir):
    """A5: the scheme-warehouse pivot — long designations -> ordered
    allele vector -> md5 identity (initiate_scheme_warehouse,
    sql/seqdef.sql:1199-1253; md5-of-array :1151-1153). Orders sharing a
    profile are the 'same ST'."""
    li = tbl(spark, sf_dir, "lineitem")
    prof = build_profiles(li, "l_orderkey", "l_linenumber", "l_returnflag")
    return prof.groupBy("profile_md5").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "a6_scheme_completeness",
    oracle="""
    SELECT l_orderkey, count(DISTINCT l_linenumber) AS n_loci,
           round(count(DISTINCT l_linenumber) / 7.0, 4) AS completeness
    FROM lineitem GROUP BY l_orderkey
    """,
)
def a6_completeness(spark, sf_dir):
    """A6: profile-completeness COUNT(DISTINCT locus) — DISTINCT because
    paralogous double designations count once
    (create_isolate_scheme_status_table, sql/isolatedb.sql:1590-1660)."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.countDistinct("l_linenumber").alias("n_loci"),
        F.round(F.countDistinct("l_linenumber") / F.lit(7.0), 4).alias("completeness"),
    )


@register(
    "a7_weighted_completion",
    oracle="""
    SELECT event_id,
           round((CASE WHEN value > 1 THEN CAST(0.5 AS DOUBLE)
                       ELSE CAST(0.0 AS DOUBLE) END)
               + (CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 10
                       THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
               + (CASE WHEN event_type <> 'error' THEN CAST(0.2 AS DOUBLE)
                       ELSE CAST(0.0 AS DOUBLE) END), 4)
           AS completion
    FROM events
    """,
)
def a7_completion(spark, sf_dir):
    """A7: weighted provenance-completion metric — row-wise weighted sum
    of populated/acceptable fields (Datastore.pm:1941)."""
    e = tbl(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    score = (
        F.when(F.col("value") > 1, 0.5).otherwise(0.0)
        + F.when(k > 10, 0.3).otherwise(0.0)
        + F.when(F.col("event_type") != "error", 0.2).otherwise(0.0)
    )
    return e.select("event_id", F.round(score, 4).alias("completion"))


@register(
    "a8_count_at_least",
    oracle="""
    WITH cnt AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
    SELECT c_custkey, coalesce(n, 0) AS n FROM customer LEFT JOIN cnt
    ON o_custkey = c_custkey WHERE coalesce(n, 0) >= 15
    """,
)
def a8_ge(spark, sf_dir):
    """A8: 'entities with COUNT(fact) >= k'
    (IsolateQueryPage.pm:3686-3785)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return with_count_predicate(c, o, "c_custkey", "o_custkey", ">=", 15).select(
        "c_custkey", "n"
    )


@register(
    "a8_count_below_with_zero",
    oracle="""
    WITH cnt AS (
        SELECT o_custkey, count(*) AS n FROM orders
        WHERE o_orderstatus = 'P' GROUP BY o_custkey)
    SELECT c_custkey, coalesce(n, 0) AS n FROM customer LEFT JOIN cnt
    ON o_custkey = c_custkey WHERE coalesce(n, 0) < 2
    """,
)
def a8_lt(spark, sf_dir):
    """A8: '< k' must OR in the zero branch — entities with no fact rows
    count as zero (IsolateQueryPage.pm:3832 _searching_for_zero)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return with_count_predicate(c, o, "c_custkey", "o_custkey", "<", 2).select(
        "c_custkey", "n"
    )


@register(
    "a8_per_locus_count",
    oracle="""
    SELECT DISTINCT l_suppkey FROM lineitem
    GROUP BY l_suppkey, l_partkey HAVING count(*) >= 5
    """,
)
def a8_per_locus(spark, sf_dir):
    """A8 'any locus' variant: entities having >= k fact rows at the
    SAME locus — GROUP BY (entity, locus) HAVING count >= k then
    distinct entities (IsolateQueryPage.pm:3771 'any locus' branch)."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
        .select("l_suppkey")
        .distinct()
    )


@register(
    "a9_group_stats_n50",
    oracle="""
    WITH stats AS (
        SELECT l_suppkey, count(*) AS n,
               round(sum(l_extendedprice), 2) AS total,
               round(min(l_extendedprice), 2) AS min_v,
               round(max(l_extendedprice), 2) AS max_v,
               round(avg(l_extendedprice), 4) AS mean_v,
               round(stddev_samp(l_extendedprice), 4) AS stddev_v
        FROM lineitem GROUP BY l_suppkey),
    w AS (
        SELECT l_suppkey, l_extendedprice,
               sum(l_extendedprice) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               row_number() OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk,
               sum(l_extendedprice) OVER (PARTITION BY l_suppkey) AS tot
        FROM lineitem),
    nn AS (
        SELECT l_suppkey,
               round(max(CASE WHEN cum >= tot * 0.5 THEN l_extendedprice END), 2) AS n50,
               CAST(min(CASE WHEN cum >= tot * 0.5 THEN rnk END) AS BIGINT) AS l50
        FROM w GROUP BY l_suppkey)
    SELECT stats.*, nn.n50, nn.l50 FROM stats JOIN nn USING (l_suppkey)
    """,
)
def a9_stats(spark, sf_dir):
    """A9/W2: seqbin-stats rollup + the N50/L50 running-sum window
    (SeqbinBreakdown.pm:488, Utils.pm:873 get_N_stats). One groupBy pass
    for the moments, one window pass (same partitioning key, one
    shuffle) for the N-stats."""
    li = tbl(spark, sf_dir, "lineitem")
    stats = group_stats(li, "l_suppkey", "l_extendedprice")
    nn = n_stats(
        li,
        "l_suppkey",
        "l_extendedprice",
        fractions=(0.5,),
        tiebreak=["l_orderkey", "l_linenumber"],
    ).select(
        "l_suppkey",
        F.round(F.col("n50"), 2).alias("n50"),
        F.col("l50").cast("long").alias("l50"),
    )
    return stats.join(nn, on="l_suppkey")


@register(
    "a10_locus_stats",
    oracle="""
    SELECT l_partkey, count(*) AS n_uses,
           round(min(l_quantity), 2) AS min_qty,
           round(max(l_quantity), 2) AS max_qty,
           strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship
    FROM lineitem GROUP BY l_partkey
    """,
)
def a10_locus_stats(spark, sf_dir):
    """A10: per-locus trigger-maintained stats (allele_count, length
    range, last datestamp — sql/seqdef.sql:1010-1073), recomputed as one
    aggregation instead of row triggers."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_uses"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
    )


@register(
    "a12_type_breakdown",
    oracle="""
    SELECT event_type, count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           round(avg(value), 4) AS mean_value
    FROM events GROUP BY event_type
    """,
)
def a12_types(spark, sf_dir):
    """A12: publication-breakdown shape — counts + distinct entities per
    label (Plugins/PublicationBreakdown.pm)."""
    e = tbl(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.avg("value"), 4).alias("mean_value"),
    )


@register(
    "a13_unique_strains",
    oracle="""
    WITH prof AS (
        SELECT l_orderkey,
               md5(string_agg(l_returnflag, ','
                   ORDER BY l_linenumber, l_returnflag)) AS profile_md5
        FROM lineitem GROUP BY l_orderkey)
    SELECT profile_md5, count(*) AS n_members, min(l_orderkey) AS min_id
    FROM prof GROUP BY profile_md5 HAVING count(*) > 1
    """,
)
def a13_unique(spark, sf_dir):
    """A13: GenomeComparator 'unique strains' — group entities with
    identical allele vectors (GenomeComparator.pm:1229); exact dedup by
    vector identity."""
    li = tbl(spark, sf_dir, "lineitem")
    prof = build_profiles(li, "l_orderkey", "l_linenumber", "l_returnflag")
    return (
        prof.groupBy("profile_md5")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("profile_key").alias("min_id"),
        )
        .filter(F.col("n_members") > 1)
    )
