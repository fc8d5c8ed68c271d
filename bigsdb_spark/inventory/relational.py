"""Inventory: scans, predicates, joins, sorts, windows (SURVEY §2.1-2.3,
§2.6-2.7) instantiated on the driver's TPC-H-ish tables.

Each entry cites the reference behaviour it reproduces; the Spark side
composes the library's predicate algebra / operators so the driver gate
exercises the same code paths the domain API uses.

Round-2 note: the driver's correctness gate checks the FIRST 50
registered queries, so closely-related §2 operators share one entry
(unioned with a ``case`` discriminator column, or composed in one
pipeline). COVERAGE.md maps every §2 ID to its entry.
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
    SELECT 'name_list' AS list_kind, c_custkey FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE upper(n_name) IN ('NATION_1', 'NATION_2', 'NATION_3')
    UNION ALL
    SELECT 'typed_list' AS list_kind, c_custkey FROM customer
    WHERE c_custkey IN (1, 5, 42, 999, 1400)
    """,
)
def s8_list_semijoin(spark, sf_dir):
    """S8 + P10: paste-list -> broadcast semi-join, both the
    case-insensitive text path (Datastore.pm:2333
    create_temp_list_table) and the typed/int path
    (IsolateQueryPage.pm:1035).

    Since r7 the nation dimension arrives through a TSV round trip:
    written by the S6 sink (write_tsv) and re-loaded by the S3 batch
    loader against a registry TableDef (header check + typed try_cast +
    required-rule validation, CurateBatchAddPage.pm) — so the
    curator-upload path is oracle-hash-checked in the gate.  Lossless
    for this dimension (ints + comment-free names), oracle unchanged;
    rows failing validation would vanish from the semi-join and break
    the row count loudly."""
    from bigsdb_spark.registry import FieldDef, TableDef
    from bigsdb_spark.sources.batchload import batch_load_csv
    from bigsdb_spark.sources.sinks import write_tsv

    cust = tbl(spark, sf_dir, "customer")
    # text list, mixed case on purpose
    pasted = ["nation_1", "NATION_2", "Nation_3"]
    from bigsdb_spark.inventory.registry import gate_scratch

    tsv_path = gate_scratch("nation_tsv")
    write_tsv(
        tbl(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        ),
        tsv_path,
    )
    ndef = TableDef(
        name="nation",
        fields=[
            FieldDef("n_nationkey", "bigint", required=True),
            FieldDef("n_name", "text", required=True),
            FieldDef("n_regionkey", "bigint"),
        ],
    )
    nations, _invalid = batch_load_csv(spark, tsv_path, ndef)
    lst = spark.createDataFrame([(v.upper(),) for v in pasted], ["n_key"])
    nat = nations.join(
        F.broadcast(lst), F.upper(nations["n_name"]) == lst["n_key"], "left_semi"
    )
    by_name = cust.join(
        nat.select("n_nationkey"),
        cust["c_nationkey"] == F.col("n_nationkey"),
        "left_semi",
    ).select(F.lit("name_list").alias("list_kind"), "c_custkey")
    # typed list
    typed = spark.createDataFrame(
        [(v,) for v in [1, 5, 42, 999, 1400]], ["c_custkey"]
    )
    by_id = cust.join(F.broadcast(typed), on="c_custkey", how="left_semi").select(
        F.lit("typed_list").alias("list_kind"), "c_custkey"
    )
    return by_name.unionByName(by_id)


# ----------------------------------------------------------- predicates

@register(
    "p1_p2_null_semantics",
    oracle="""
    SELECT 'eq_ci' AS kind, c_custkey AS entity_id FROM customer
    WHERE upper(c_mktsegment) = upper('building')
    UNION ALL
    SELECT 'not_null_inclusive' AS kind, p_partkey AS entity_id FROM part
    WHERE NOT (upper(p_brand) = upper('brand#33')) OR p_brand IS NULL
    UNION ALL
    SELECT 'contains' AS kind, p_partkey AS entity_id FROM part
    WHERE contains(upper(p_name), 'RED')
    UNION ALL
    SELECT 'starts_ends' AS kind, p_partkey AS entity_id FROM part
    WHERE starts_with(upper(p_name), 'SMALL') AND ends_with(upper(p_type), 'OMY')
    """,
)
def p1_p2(spark, sf_dir):
    """P1-P4 predicate suite: '=' is UPPER(f)=UPPER(v)
    (IsolateQueryPage.pm:2471-2532); NOT keeps NULL rows — deliberately
    not SQL 3VL (:2329-2332); contains == ILIKE '%v%' (:2545-2593);
    'starts with'/'ends with' (:2337-2344). Consolidated from the r2
    entries p1_p2_null_semantics + p3_p4_substring (same (kind, key)
    shape) to free a gate slot for the f11_f12_d11 scan suite.

    Since r7 the eq_ci leg runs through the S7 query snapshot store —
    the QuerySpec is SAVED to disk, re-LOADED by its content hash, and
    re-planned (QueryStore, IsolateQueryPage.pm:2130
    get_query_from_temp_file) — so spec serialization round-tripping is
    oracle-hash-checked in the gate, not only in pytest.  Lossless by
    construction (same FormRow -> same build_predicate), so the oracle
    is unchanged."""
    from bigsdb_spark.plans.queryspec import FormRow, QuerySpec
    from bigsdb_spark.plans.querystore import QueryStore

    c = tbl(spark, sf_dir, "customer")
    p = tbl(spark, sf_dir, "part")
    from bigsdb_spark.inventory.registry import gate_scratch

    store = QueryStore(gate_scratch("querystore"))
    qid = store.save(
        QuerySpec(rows=[FormRow("c_mktsegment", "=", "building")])
    )
    eq = store.run(qid, c).select(
        F.lit("eq_ci").alias("kind"), F.col("c_custkey").alias("entity_id")
    )
    nn = p.filter(build_predicate(F.col("p_brand"), "NOT", "brand#33")).select(
        F.lit("not_null_inclusive").alias("kind"),
        F.col("p_partkey").alias("entity_id"),
    )
    c3 = p.filter(build_predicate(F.col("p_name"), "contains", "RED")).select(
        F.lit("contains").alias("kind"), F.col("p_partkey").alias("entity_id")
    )
    c4 = p.filter(
        build_predicate(F.col("p_name"), "starts with", "small")
        & build_predicate(F.col("p_type"), "ends with", "omy")
    ).select(
        F.lit("starts_ends").alias("kind"), F.col("p_partkey").alias("entity_id")
    )
    return eq.unionByName(nn).unionByName(c3).unionByName(c4)


@register(
    "p5_p6_compare_or",
    oracle="""
    SELECT 'typed_range' AS kind, o_orderkey AS entity_id FROM orders
    WHERE o_totalprice >= 100000 AND o_orderdate < TIMESTAMP '1997-01-01'
    UNION ALL
    SELECT 'grouped_or' AS kind, p_partkey AS entity_id FROM part
    WHERE contains(upper(p_name), 'SM') OR contains(upper(p_type), 'SM')
       OR contains(upper(p_brand), 'SM')
    """,
)
def p5_p6(spark, sf_dir):
    """P5 + P6: typed >,>=,<,<= comparison
    (IsolateQueryPage.pm:2595-2637) and one term ORed over a field group
    (:2374)."""
    o = tbl(spark, sf_dir, "orders")
    p = tbl(spark, sf_dir, "part")
    rng = o.filter(
        build_predicate(F.col("o_totalprice"), ">=", 100000)
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(F.lit("typed_range").alias("kind"), F.col("o_orderkey").alias("entity_id"))
    grp = p.filter(
        grouped_field_query([F.col("p_name"), F.col("p_type"), F.col("p_brand")], "sm")
    ).select(F.lit("grouped_or").alias("kind"), F.col("p_partkey").alias("entity_id"))
    return rng.unionByName(grp)


@register(
    "p7_p8_p9_lookup",
    oracle="""
    SELECT 'ext_attr' AS kind, c_custkey AS entity_id,
           CAST(NULL AS BIGINT) AS n, CAST(NULL AS VARCHAR) AS label
    FROM customer WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE upper(r_name) = 'EUROPE')
    UNION ALL
    SELECT 'eav' AS kind, user_id AS entity_id, count(*) AS n,
           CAST(NULL AS VARCHAR) AS label
    FROM events
    WHERE user_id IN (
        SELECT user_id FROM events WHERE event_type = 'click' AND value >= 10)
    GROUP BY user_id
    UNION ALL
    SELECT 'user_dim' AS kind, o_orderkey AS entity_id,
           CAST(NULL AS BIGINT) AS n, c_name AS label
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE ends_with(c_name, '5') AND o_orderstatus = 'O'
    """,
)
def p7_p8_p9(spark, sf_dir):
    """P7 + P8 + P9: the three auxiliary-table predicate rewrites —
    extended-attribute dimension semi-join
    (IsolateQueryPage.pm:2481-2492, country -> continent), EAV long-table
    filter + semi-join back (:2848-2955), and sender/curator sub-field
    search through the users dimension (QueryPage.pm:243-291)."""
    nat = tbl(spark, sf_dir, "nation")
    reg = tbl(spark, sf_dir, "region").filter(F.upper(F.col("r_name")) == "EUROPE")
    euro_nations = nat.join(
        F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]
    ).select("n_nationkey")
    c = tbl(spark, sf_dir, "customer")
    null_n = F.lit(None).cast("long")
    null_label = F.lit(None).cast("string")
    ext = c.join(
        F.broadcast(euro_nations),
        c["c_nationkey"] == F.col("n_nationkey"),
        "left_semi",
    ).select(
        F.lit("ext_attr").alias("kind"),
        F.col("c_custkey").alias("entity_id"),
        null_n.alias("n"),
        null_label.alias("label"),
    )
    e = tbl(spark, sf_dir, "events")
    hits = (
        e.filter((F.col("event_type") == "click") & (F.col("value") >= 10))
        .select("user_id")
        .distinct()
    )
    eav = (
        e.join(hits, on="user_id", how="left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("eav").alias("kind"),
            F.col("user_id").alias("entity_id"),
            "n",
            null_label.alias("label"),
        )
    )
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    cu = tbl(spark, sf_dir, "customer").filter(
        build_predicate(F.col("c_name"), "ends with", "5")
    )
    udim = o.join(cu, o["o_custkey"] == cu["c_custkey"]).select(
        F.lit("user_dim").alias("kind"),
        F.col("o_orderkey").alias("entity_id"),
        null_n.alias("n"),
        F.col("c_name").alias("label"),
    )
    return ext.unionByName(eav).unionByName(udim)


@register(
    "p13_json",
    oracle="""
    SELECT 'flatten' AS kind, event_id, k AS json_path,
           TRY_CAST(json_extract_string(props, '$.' || k) AS INTEGER) AS val_int
    FROM events, UNNEST(json_keys(props)) AS u(k)
    UNION ALL
    SELECT 'predicate' AS kind, event_id, 'k' AS json_path,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS val_int
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) > 80
    """,
)
def p13_json(spark, sf_dir):
    """P13: the analysis-results JSON surface — flatten the JSONB
    document into long (entity, json_path, value) cache rows
    (analysis_results_cache, sql/isolatedb.sql:2161) AND the typed
    predicate on one extracted path
    (IsolateQueryPage.pm:4260-4360).

    The map parses as string values cast per-entry: parsing straight to
    map<string,int> would NULL the whole map (dropping every key of the
    document) the moment one value is not an int, where the reference's
    cache keeps each path's text value and casts at query time — and
    the oracle's TRY_CAST mirrors the per-value NULL."""
    e = tbl(spark, sf_dir, "events")
    kv = F.explode(F.from_json("props", "map<string,string>")).alias(
        "json_path", "_raw"
    )
    flat = e.select(F.lit("flatten").alias("kind"), "event_id", kv).select(
        "kind", "event_id", "json_path",
        F.col("_raw").try_cast("int").alias("val_int"),
    )
    k = F.get_json_object(F.col("props"), "$.k").try_cast("int")
    pred = (
        e.select("event_id", k.alias("val_int"))
        .filter(F.col("val_int") > 80)
        .select(
            F.lit("predicate").alias("kind"),
            "event_id",
            F.lit("k").alias("json_path"),
            "val_int",
        )
    )
    return flat.unionByName(pred)


# ---------------------------------------------------------------- joins

@register(
    "j1_j5_designation_joins",
    oracle="""
    SELECT 'inner_equi' AS kind, o_orderkey AS entity_id, count(*) AS n
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F' AND l_returnflag = 'R'
    GROUP BY o_orderkey
    UNION ALL
    SELECT 'left_null_lt' AS kind, c_custkey AS entity_id,
           coalesce(n, 0) AS n
    FROM customer LEFT JOIN (
        SELECT o_custkey, count(*) AS n FROM orders
        WHERE o_orderstatus = 'P' GROUP BY o_custkey) cnt
    ON o_custkey = c_custkey
    WHERE n < 2 OR n IS NULL
    """,
)
def j1_j5(spark, sf_dir):
    """J1 + J5: entity <- long-fact equi-join with a locus filter pushed
    below the join (IsolateQueryPage.pm:3001-3104), and the LEFT JOIN
    where entities with no fact rows must still match a '<' comparison
    (:3974-3983 seqbin OR-IS-NULL)."""
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    inner = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("inner_equi").alias("kind"),
            F.col("o_orderkey").alias("entity_id"),
            "n",
        )
    )
    c = tbl(spark, sf_dir, "customer")
    op = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    left = with_count_predicate(c, op, "c_custkey", "o_custkey", "<", 2).select(
        F.lit("left_null_lt").alias("kind"),
        F.col("c_custkey").alias("entity_id"),
        "n",
    )
    return inner.unionByName(left)


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
    "j6_tag_join",
    oracle="""
    SELECT c_custkey, count(*) AS n_tags
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R' AND l_linenumber <= 2
    GROUP BY c_custkey
    """,
)
def j6_tag_join(spark, sf_dir):
    """J6: the two-step tag join — allele_sequences (tags, here lineitem
    rows at a locus) join sequence_bin (contigs, here orders) join the
    isolate (customer): IsolateQueryPage.pm:3615-3684 builds exactly
    this allele_sequences ⋈ sequence_bin ⋈ isolates chain. The contig
    bridge is the join the designation path (J1) doesn't have."""
    tags = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linenumber") <= 2)
    )
    contigs = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = tbl(spark, sf_dir, "customer")
    tagged = tags.join(contigs, tags["l_orderkey"] == contigs["o_orderkey"])
    return (
        c.join(tagged, c["c_custkey"] == tagged["o_custkey"])
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_tags"))
    )


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
    "w1_w4_rank_windows",
    oracle="""
    SELECT 'topn' AS kind, n_name, c_custkey AS k, c_acctbal AS v FROM (
        SELECT n_name, c_custkey, c_acctbal,
               row_number() OVER (
                   PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer JOIN nation ON c_nationkey = n_nationkey) t
    WHERE rn <= 3
    UNION ALL
    SELECT 'rank' AS kind, n_name, n_customers AS k,
           CAST(rnk AS DOUBLE) AS v FROM (
        SELECT n_name, count(*) AS n_customers,
               rank() OVER (ORDER BY count(*) DESC, n_name) AS rnk
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name) t
    """,
)
def w1_w4(spark, sf_dir):
    """W1 + W4: top-N per group with deterministic tiebreak
    (FieldBreakdown.pm:975 caps frequency lists) and largest-group
    ranking (cluster.pl:226 get_largest_groups)."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    topn = (
        j.select("n_name", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select(
            F.lit("topn").alias("kind"),
            "n_name",
            F.col("c_custkey").alias("k"),
            F.col("c_acctbal").alias("v"),
        )
    )
    counts = j.groupBy("n_name").agg(F.count(F.lit(1)).alias("n_customers"))
    wr = Window.orderBy(F.desc("n_customers"), F.asc("n_name"))
    rank = counts.withColumn("rnk", F.rank().over(wr)).select(
        F.lit("rank").alias("kind"),
        "n_name",
        F.col("n_customers").alias("k"),
        F.col("rnk").cast("double").alias("v"),
    )
    return topn.unionByName(rank)


@register(
    "w6_o1_pagination",
    oracle="""
    WITH comp AS (
        SELECT c_custkey,
               regexp_replace(c_name, '^Customer#0*', '') AS num_text,
               concat(regexp_replace(c_name, '^Customer#0*', ''), ' [',
                      regexp_replace(upper(c_mktsegment), 'URE$|ERY$', '.'), ']')
                   AS composite
        FROM customer)
    SELECT c_custkey, composite,
           lower(regexp_replace(composite, '[\\W_]+', '', 'g')) AS dict_key
    FROM comp
    ORDER BY (CASE WHEN regexp_matches(num_text, '^[0-9]+$')
                   THEN CAST(num_text AS BIGINT) END) NULLS LAST,
             composite, c_custkey
    LIMIT 50 OFFSET 100
    """,
)
def w6_o1(spark, sf_dir):
    """W6/O2 + O1 + C1 in one pipeline: a composite virtual field
    (composite_fields, sql/isolatedb.sql:1175, evaluated row-at-a-time
    in Datastore.pm:261-361 — here one vectorized expression), sorted
    with the numeric-text guard (the reference's
    to_number(textcat('0', allele)) trick, ProfileQueryPage.pm
    _generate_query), paginated under a total order
    (IsolateQueryPage.pm:2120-2128 appends tiebreaks for exactly this
    determinism).

    r10 fold (VERDICT r9 task 5): the paginated rows also carry
    ``dict_key`` — O3's dictionary collation key
    (functions/labels.py dictionary_sort_key, Utils.pm:1017
    dictionary_sort: lowercase + non-word/underscore chars stripped),
    a pure regexp expression DuckDB replicates exactly, converting the
    SQL-expressible half of O3 from tests-only to an oracle row (the
    UCA half stays tests-only by design: engine collation keys are not
    comparable cross-engine)."""
    c = tbl(spark, sf_dir, "customer")
    num_text = F.regexp_replace("c_name", "^Customer#0*", "")
    composite = F.concat(
        num_text,
        F.lit(" ["),
        F.regexp_replace(F.upper(F.col("c_mktsegment")), "URE$|ERY$", "."),
        F.lit("]"),
    )
    comp = c.select(
        "c_custkey", num_text.alias("num_text"), composite.alias("composite")
    )
    guard = F.when(
        F.col("num_text").rlike("^[0-9]+$"), F.col("num_text").cast("long")
    )
    from bigsdb_spark.functions.labels import dictionary_sort_key

    return (
        comp.orderBy(guard.asc_nulls_last(), F.asc("composite"), F.asc("c_custkey"))
        .select(
            "c_custkey",
            "composite",
            dictionary_sort_key(F.col("composite")).alias("dict_key"),
        )
        .offset(100)
        .limit(50)
    )
