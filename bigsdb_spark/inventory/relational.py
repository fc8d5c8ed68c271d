"""Inventory: scans, predicates, joins, sorts, windows (SURVEY §2.1-2.3,
§2.6-2.7) instantiated on the driver's TPC-H-ish tables.

Each entry cites the reference behaviour it reproduces; the Spark side
composes the library's predicate algebra / operators so the driver gate
exercises the same code paths the domain API uses.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigsdb_spark.inventory.registry import register, tbl
from bigsdb_spark.predicates import build_predicate, grouped_field_query
from bigsdb_spark.operators.counts import with_count_predicate, zero_count_entities

# ---------------------------------------------------------------- scans

@register(
    "s1_view_scan",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def s1_view_scan(spark, sf_dir):
    """S1: role-filtered view scan with projection — filter + column
    pruning must reach the parquet scan (Datastore.pm:3685)."""
    return (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@register(
    "s8_list_semijoin",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE upper(n_name) IN ('NATION_1', 'NATION_2', 'NATION_3')
    """,
)
def s8_list_semijoin(spark, sf_dir):
    """S8/P10: paste-list -> broadcast semi-join, case-insensitive
    (Datastore.pm:2333 create_temp_list_table)."""
    pasted = ["nation_1", "NATION_2", "Nation_3"]  # mixed case on purpose
    nations = tbl(spark, sf_dir, "nation")
    lst = spark.createDataFrame([(v.upper(),) for v in pasted], ["n_key"])
    nat = nations.join(
        F.broadcast(lst), F.upper(nations["n_name"]) == lst["n_key"], "left_semi"
    )
    cust = tbl(spark, sf_dir, "customer")
    return cust.join(
        nat.select("n_nationkey"),
        cust["c_nationkey"] == F.col("n_nationkey"),
        "left_semi",
    ).select("c_custkey", "c_name")


# ----------------------------------------------------------- predicates

@register(
    "p1_eq_case_insensitive",
    oracle="SELECT c_custkey FROM customer WHERE upper(c_mktsegment) = upper('building')",
)
def p1_eq(spark, sf_dir):
    """P1: '=' is UPPER(f)=UPPER(v) (IsolateQueryPage.pm:2471-2532)."""
    c = tbl(spark, sf_dir, "customer")
    return c.filter(build_predicate(F.col("c_mktsegment"), "=", "building")).select(
        "c_custkey"
    )


@register(
    "p2_not_null_inclusive",
    oracle="""
    SELECT p_partkey FROM part
    WHERE NOT (upper(p_brand) = upper('brand#33')) OR p_brand IS NULL
    """,
)
def p2_not(spark, sf_dir):
    """P2: NOT keeps NULL rows — deliberately not SQL 3VL
    (IsolateQueryPage.pm:2329-2332)."""
    p = tbl(spark, sf_dir, "part")
    return p.filter(build_predicate(F.col("p_brand"), "NOT", "brand#33")).select(
        "p_partkey"
    )


@register(
    "p3_contains_ci",
    oracle="SELECT p_partkey, p_name FROM part WHERE contains(upper(p_name), 'RED')",
)
def p3_contains(spark, sf_dir):
    """P3: contains == ILIKE '%v%' (IsolateQueryPage.pm:2545-2593)."""
    p = tbl(spark, sf_dir, "part")
    return p.filter(build_predicate(F.col("p_name"), "contains", "RED")).select(
        "p_partkey", "p_name"
    )


@register(
    "p4_starts_ends_with",
    oracle="""
    SELECT p_partkey FROM part
    WHERE starts_with(upper(p_name), 'SMALL') AND ends_with(upper(p_type), 'OMY')
    """,
)
def p4_starts_ends(spark, sf_dir):
    """P4: 'starts with'/'ends with' (IsolateQueryPage.pm:2337-2344)."""
    p = tbl(spark, sf_dir, "part")
    return p.filter(
        build_predicate(F.col("p_name"), "starts with", "small")
        & build_predicate(F.col("p_type"), "ends with", "omy")
    ).select("p_partkey")


@register(
    "p5_typed_range",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_totalprice >= 100000 AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def p5_range(spark, sf_dir):
    """P5: typed >,>=,<,<= comparison (IsolateQueryPage.pm:2595-2637)."""
    o = tbl(spark, sf_dir, "orders")
    return o.filter(
        build_predicate(F.col("o_totalprice"), ">=", 100000)
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey")


@register(
    "p6_grouped_field_or",
    oracle="""
    SELECT p_partkey FROM part
    WHERE contains(upper(p_name), 'SM') OR contains(upper(p_type), 'SM')
       OR contains(upper(p_brand), 'SM')
    """,
)
def p6_grouped(spark, sf_dir):
    """P6: one term ORed over a field group (IsolateQueryPage.pm:2374)."""
    p = tbl(spark, sf_dir, "part")
    return p.filter(
        grouped_field_query([F.col("p_name"), F.col("p_type"), F.col("p_brand")], "sm")
    ).select("p_partkey")


@register(
    "p7_extended_attribute",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE upper(r_name) = 'EUROPE')
    """,
)
def p7_ext_attr(spark, sf_dir):
    """P7: extended-attribute predicate rewritten to a dimension
    semi-join (IsolateQueryPage.pm:2481-2492: country -> continent)."""
    nat = tbl(spark, sf_dir, "nation")
    reg = tbl(spark, sf_dir, "region").filter(F.upper(F.col("r_name")) == "EUROPE")
    euro_nations = nat.join(
        F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]
    ).select("n_nationkey")
    c = tbl(spark, sf_dir, "customer")
    return c.join(
        F.broadcast(euro_nations),
        c["c_nationkey"] == F.col("n_nationkey"),
        "left_semi",
    ).select("c_custkey")


@register(
    "p8_eav_predicate",
    oracle="""
    SELECT user_id, count(*) AS n_events FROM events
    WHERE user_id IN (
        SELECT user_id FROM events WHERE event_type = 'click' AND value >= 10)
    GROUP BY user_id
    """,
)
def p8_eav(spark, sf_dir):
    """P8: EAV predicate -> filter the long table, semi-join back on the
    entity id (IsolateQueryPage.pm:2848-2955). events is the EAV long
    table here (entity=user_id, field=event_type, value=value)."""
    e = tbl(spark, sf_dir, "events")
    hits = (
        e.filter((F.col("event_type") == "click") & (F.col("value") >= 10))
        .select("user_id")
        .distinct()
    )
    return (
        e.join(hits, on="user_id", how="left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "p9_user_dim_fields",
    oracle="""
    SELECT o_orderkey, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE ends_with(c_name, '5') AND o_orderstatus = 'O'
    """,
)
def p9_user_dim(spark, sf_dir):
    """P9: sender/curator sub-field search through the users dimension
    (QueryPage.pm:243-291 search_users)."""
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = tbl(spark, sf_dir, "customer").filter(
        build_predicate(F.col("c_name"), "ends with", "5")
    )
    return o.join(c, o["o_custkey"] == c["c_custkey"]).select("o_orderkey", "c_name")


@register(
    "p10_list_typed",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_custkey IN (1, 5, 42, 999, 1400)
    """,
)
def p10_list(spark, sf_dir):
    """P10: typed paste-list semi-join (IsolateQueryPage.pm:1035)."""
    c = tbl(spark, sf_dir, "customer")
    lst = spark.createDataFrame([(v,) for v in [1, 5, 42, 999, 1400]], ["c_custkey"])
    return c.join(F.broadcast(lst), on="c_custkey", how="left_semi").select(
        "c_custkey", "c_acctbal"
    )


@register(
    "p13_json_predicate",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 80
    """,
)
def p13_json(spark, sf_dir):
    """P13: predicate on semi-structured JSON results with numeric cast
    (IsolateQueryPage.pm:4260-4360, analysis_results_cache)."""
    e = tbl(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return e.select("event_id", k.alias("k_val")).filter(F.col("k_val") > 80)


# ---------------------------------------------------------------- joins

@register(
    "j1_designation_join",
    oracle="""
    SELECT o_orderkey, count(*) AS n_items
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F' AND l_returnflag = 'R'
    GROUP BY o_orderkey
    """,
)
def j1_join(spark, sf_dir):
    """J1: entity <- long fact equi-join with a locus filter
    (IsolateQueryPage.pm:3001-3104). Filter pushed below the join."""
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "j2_derived_cache_join",
    oracle="""
    SELECT c_custkey, c_mktsegment, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def j2_cache_join(spark, sf_dir):
    """J2: join to a derived/materialized per-entity cache table
    (IsolateQueryPage.pm:3199, Datastore.pm:1242 scheme-field cache)."""
    c = tbl(spark, sf_dir, "customer")
    stats = (
        tbl(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
    )
    return c.join(stats, c["c_custkey"] == stats["o_custkey"]).select(
        "c_custkey", "c_mktsegment", "n_orders", "total_spend"
    )


@register(
    "j5_left_join_null_compare",
    oracle="""
    WITH cnt AS (
        SELECT o_custkey, count(*) AS n FROM orders
        WHERE o_orderstatus = 'P' GROUP BY o_custkey)
    SELECT c_custkey, coalesce(n, 0) AS n_p_orders
    FROM customer LEFT JOIN cnt ON o_custkey = c_custkey
    WHERE n < 2 OR n IS NULL
    """,
)
def j5_left_null(spark, sf_dir):
    """J5: LEFT JOIN where entities with no fact rows must still match a
    '<' comparison (IsolateQueryPage.pm:3974-3983 seqbin OR-IS-NULL)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    out = with_count_predicate(c, o, "c_custkey", "o_custkey", "<", 2)
    return out.select("c_custkey", F.col("n").alias("n_p_orders"))


@register(
    "j7_anti_join_zero",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def j7_anti(spark, sf_dir):
    """J7/A8: NOT EXISTS == left_anti join — the zero-count search path
    (IsolateQueryPage.pm:3729-3736)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return zero_count_entities(c, o, "c_custkey", "o_custkey").select("c_custkey")


@register(
    "j8_multihop_rollup",
    oracle="""
    SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    GROUP BY r_name
    """,
)
def j8_multihop(spark, sf_dir):
    """J8/J9: snowflake dimension joins — region and nation broadcast,
    the orders fact never shuffles for the join (only for the final
    groupBy on 5 keys)."""
    r = tbl(spark, sf_dir, "region")
    n = tbl(spark, sf_dir, "nation")
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "j10_interval_containment",
    oracle="""
    SELECT l_returnflag, count(*) AS n_shipped_30d
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag
    """,
)
def j10_interval(spark, sf_dir):
    """J10: interval/positional containment join (tag positions within
    contigs, AlleleSequencePage.pm) — equi-join key + range predicate."""
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_shipped_30d"))
    )


# ------------------------------------------------- windows / sort / page

@register(
    "w1_top_n_per_group",
    oracle="""
    SELECT n_name, c_custkey, c_acctbal FROM (
        SELECT n_name, c_custkey, c_acctbal,
               row_number() OVER (
                   PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer JOIN nation ON c_nationkey = n_nationkey) t
    WHERE rn <= 3
    """,
)
def w1_topn(spark, sf_dir):
    """W1: top-N per group with deterministic tiebreak
    (FieldBreakdown.pm:975 caps frequency lists the same way)."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        j.select("n_name", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "w4_rank_groups",
    oracle="""
    SELECT n_name, n_customers, CAST(rnk AS BIGINT) AS rnk FROM (
        SELECT n_name, count(*) AS n_customers,
               rank() OVER (ORDER BY count(*) DESC, n_name) AS rnk
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name) t
    """,
)
def w4_rank(spark, sf_dir):
    """W4: largest-group selection (cluster.pl:226 get_largest_groups)."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    counts = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    w = Window.orderBy(F.desc("n_customers"), F.asc("n_name"))
    return counts.withColumn("rnk", F.rank().over(w).cast("long"))


@register(
    "w6_stable_pagination",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
)
def w6_page(spark, sf_dir):
    """W6/O2: LIMIT/OFFSET paging under a total order — the reference
    appends (id, datestamp) tiebreaks for exactly this determinism
    (IsolateQueryPage.pm:2120-2128)."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(100)
        .limit(50)
    )


@register(
    "o1_numeric_text_sort",
    oracle="""
    SELECT allele_id FROM (
        SELECT DISTINCT CAST(p_size AS VARCHAR) AS allele_id FROM part) t
    ORDER BY (CASE WHEN regexp_matches(allele_id, '^[0-9]+$')
                   THEN CAST(allele_id AS BIGINT) END) NULLS LAST,
             allele_id
    LIMIT 5
    """,
)
def o1_numeric_text(spark, sf_dir):
    """O1: allele ids are text but sort numerically when they look
    numeric — the reference's to_number(textcat('0', allele)) guard
    (ProfileQueryPage.pm _generate_query order clause)."""
    p = tbl(spark, sf_dir, "part")
    ids = p.select(F.col("p_size").cast("string").alias("allele_id")).distinct()
    guard = F.when(
        F.col("allele_id").rlike("^[0-9]+$"), F.col("allele_id").cast("long")
    )
    return ids.orderBy(guard.asc_nulls_last(), F.col("allele_id").asc()).limit(5)


@register(
    "o5_distinct_pairs",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def o5_distinct(spark, sf_dir):
    """O5: DISTINCT projection (cluster.pl:137 shape)."""
    return tbl(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()
