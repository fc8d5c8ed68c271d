"""Inventory: aggregation / breakdown / pivot-cache family (SURVEY §2.4)
on the driver's tables — lineitem plays allele_designations (order =
isolate, linenumber = locus, returnflag = allele), which gives the
profile-pivot operators real multi-row vectors to chew on.

Round-2 note: closely-related §2.4 operators share one gate entry
(unioned with a ``kind`` discriminator) so every entry lands inside the
driver's 50-query correctness window — see COVERAGE.md for the ID map.
The wide groupBy().pivot() crosstab variant is pytest-covered
(tests/test_predicates.py::test_crosstab_wide).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigsdb_spark.inventory.registry import register, tbl
from bigsdb_spark.operators.breakdown import (
    combination_counts,
    crosstab_pct,
    field_frequency,
)
from bigsdb_spark.operators.counts import with_count_predicate
from bigsdb_spark.operators.profiles import build_profiles
from bigsdb_spark.operators.stats import group_stats, n_stats


@register(
    "a1_a12_frequency",
    oracle="""
    SELECT 'nation' AS kind, n_name AS label, count(*) AS n,
           CAST(NULL AS BIGINT) AS n_entities, CAST(NULL AS DOUBLE) AS mean_value
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    UNION ALL
    SELECT 'event_type' AS kind, event_type AS label, count(*) AS n,
           count(DISTINCT user_id) AS n_entities,
           round(avg(value), 4) AS mean_value
    FROM events GROUP BY event_type
    """,
)
def a1_a12(spark, sf_dir):
    """A1 + A12: field-frequency breakdown (FieldBreakdown.pm:851-1008)
    and the publication-breakdown shape — counts + distinct entities per
    label (Plugins/PublicationBreakdown.pm)."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    freq = field_frequency(j, "n_name").select(
        F.lit("nation").alias("kind"),
        "label",
        "n",
        F.lit(None).cast("long").alias("n_entities"),
        F.lit(None).cast("double").alias("mean_value"),
    )
    e = tbl(spark, sf_dir, "events")
    pubs = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_entities"),
        F.round(F.avg("value"), 4).alias("mean_value"),
    ).select(
        F.lit("event_type").alias("kind"),
        F.col("event_type").alias("label"),
        "n",
        "n_entities",
        "mean_value",
    )
    return freq.unionByName(pubs)


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
    (TwoFieldBreakdown.pm:466). The wide pivot variant is pytest-covered
    (stable-schema groupBy().pivot() with explicit values)."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    return crosstab_pct(j, "c_mktsegment", "n_name")


@register(
    "a3_rollup_combinations",
    oracle="""
    SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN '<all>'
                ELSE coalesce(o_orderpriority, '<blank>') END
             AS o_orderpriority,
           CASE WHEN GROUPING(o_orderstatus) = 1 THEN '<all>'
                ELSE coalesce(o_orderstatus, '<blank>') END
             AS o_orderstatus,
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
    "a4_dashboard",
    oracle="""
    SELECT 'hist' AS kind,
           CAST(CAST(floor(o_totalprice / 25000) AS BIGINT) AS VARCHAR) AS label,
           CAST(floor(o_totalprice / 25000) AS BIGINT)
               * CAST(25000.0 AS DOUBLE) AS bin_start,
           count(*) AS n
    FROM orders GROUP BY 2, 3
    UNION ALL
    SELECT 'topn' AS kind, label, CAST(NULL AS DOUBLE) AS bin_start,
           CAST(n AS BIGINT) AS n
    FROM (
        WITH counts AS (
            SELECT coalesce(event_type, 'No value') AS label, count(*) AS n
            FROM events GROUP BY 1),
        ranked AS (
            SELECT label, n, row_number() OVER (ORDER BY n DESC, label) AS rnk
            FROM counts)
        SELECT label, n FROM ranked WHERE rnk <= 3
        UNION ALL
        SELECT 'Others' AS label, sum(n) AS n
        FROM ranked WHERE rnk > 3 HAVING sum(n) IS NOT NULL)
    """,
)
def a4_dashboard(spark, sf_dir):
    """A4: dashboard aggregates — histogram ranges
    (DashboardPage.pm:1524) and the chart top-N labels (NULL coalesced
    to 'No value', :2196) plus an 'Others' bucket rolling up the tail
    (:2242).

    r8 fold-in (the r7 consolidation pattern): the histogram leg is
    SERVED from the mergeable per-day bin-count rollup
    (operators/sketches.histogram_rollup -> merge_histogram_rollup) —
    the merge is a lossless sum, so the unchanged oracle hash-checks
    the merge-not-rescan serving path the 100 TB dashboard would take;
    equality with the direct recount is additionally pinned in
    tests/test_asof_sketches.py."""
    from bigsdb_spark.operators.sketches import (
        histogram_rollup,
        merge_histogram_rollup,
    )

    o = tbl(spark, sf_dir, "orders").withColumn("day", F.to_date("o_orderdate"))
    hist = merge_histogram_rollup(
        histogram_rollup(o, ["day"], "o_totalprice", 25000.0), []
    ).select(
        F.lit("hist").alias("kind"),
        F.col("bin").cast("string").alias("label"),
        F.col("bin_start").cast("double").alias("bin_start"),
        "n",
    )
    e = tbl(spark, sf_dir, "events")
    counts = e.groupBy(
        F.coalesce(F.col("event_type"), F.lit("No value")).alias("label")
    ).agg(F.count(F.lit(1)).alias("n"))
    # top-3 via global sort+limit (TakeOrderedAndProject: per-partition
    # top-N then a driver merge of N-row heads — no single-partition
    # Window shuffle); the 'Others' tail is total minus top, two
    # singleton aggregates. The (n desc, label asc) order is total
    # (labels unique), so limit(3) selects exactly the row_number()<=3
    # rows.
    top = counts.orderBy(F.desc("n"), F.asc("label")).limit(3).select("label", "n")
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_n_labels")
    )
    others = (
        totals.crossJoin(top.agg(F.sum("n").alias("_top")))
        .filter(F.col("_n_labels") > 3)
        .select(
            F.lit("Others").alias("label"),
            (F.col("_total") - F.col("_top")).cast("long").alias("n"),
        )
    )
    topn = top.unionByName(others).select(
        F.lit("topn").alias("kind"),
        "label",
        F.lit(None).cast("double").alias("bin_start"),
        "n",
    )
    return hist.unionByName(topn)


def a4_dashboard_sketch_served(spark, sf_dir):
    """Sketch-served twin of ``a4_dashboard`` (r8 — VERDICT r7 task 3):
    the SAME output, but served merge-not-rescan from finest-grain
    per-day rollups, the way a 100 TB dashboard would be refreshed —
    raw rows are touched once per ingested partition, every page render
    is a merge over the (bounded) rollup table.

    - histogram leg: exact mergeable bin-count rollup per o_orderdate
      day (operators/sketches.histogram_rollup), merged to the global
      histogram by summing bin counts — lossless, so the twin is
      hash-identical to the raw recount;
    - top-N leg: per-(day, label) count rollup merged by sum, then the
      same top-3 + 'Others' finish.

    tests/test_asof_sketches.py pins equality against a4_dashboard;
    the KLL/HLL approximate legs (quantiles, distinct users) live
    beside this in dashboard_sketch_rollups()."""
    from bigsdb_spark.operators.sketches import (
        histogram_rollup,
        merge_histogram_rollup,
    )

    o = tbl(spark, sf_dir, "orders").withColumn(
        "day", F.to_date("o_orderdate")
    )
    hist_rollup = histogram_rollup(o, ["day"], "o_totalprice", 25000.0)
    hist = merge_histogram_rollup(hist_rollup, []).select(
        F.lit("hist").alias("kind"),
        F.col("bin").cast("string").alias("label"),
        F.col("bin_start").cast("double").alias("bin_start"),
        "n",
    )
    e = tbl(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.coalesce(F.col("event_type"), F.lit("No value")).alias("label"),
    )
    count_rollup = e.groupBy("day", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    counts = count_rollup.groupBy("label").agg(F.sum("n").alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("label")).limit(3).select("label", "n")
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_n_labels")
    )
    others = (
        totals.crossJoin(top.agg(F.sum("n").alias("_top")))
        .filter(F.col("_n_labels") > 3)
        .select(
            F.lit("Others").alias("label"),
            (F.col("_total") - F.col("_top")).cast("long").alias("n"),
        )
    )
    topn = top.unionByName(others).select(
        F.lit("topn").alias("kind"),
        "label",
        F.lit(None).cast("double").alias("bin_start"),
        "n",
    )
    return hist.unionByName(topn)


def dashboard_sketch_rollups(spark, sf_dir):
    """The approximate dashboard legs served from mergeable sketches
    (r8): per-event-type DISTINCT USERS via HLL (the A1/A12
    ``count(DISTINCT user_id)`` leg — exact in the sparse regime,
    ~1.6% past it) and per-event-type VALUE QUANTILES via KLL (the
    A9/A4 percentile family — exact while each merged sketch has seen
    <= k values).  Both are built as finest-grain per-day rollups and
    MERGED to the serving grouping; returns (event_type, distinct_users,
    n_rows, q50, q95, n_values)."""
    from bigsdb_spark.operators.sketches import (
        distinct_sketch_rollup,
        merge_quantile_sketches,
        merge_sketches,
        quantile_sketch_rollup,
        with_estimate,
        with_quantiles,
    )

    e = (
        tbl(spark, sf_dir, "events")
        .withColumn("day", F.to_date("ts"))
        # NULL event_type is an anticipated input (the a4 top-N leg
        # coalesces it too); without this the inner join below would
        # silently drop the NULL group (NULL never equals NULL).
        .withColumn(
            "event_type", F.coalesce(F.col("event_type"), F.lit("No value"))
        )
    )
    hll = with_estimate(
        merge_sketches(
            distinct_sketch_rollup(e, ["day", "event_type"], "user_id"),
            ["event_type"],
        ),
        "distinct_users",
    ).select("event_type", "distinct_users", "n_rows")
    kll = with_quantiles(
        merge_quantile_sketches(
            quantile_sketch_rollup(e, ["day", "event_type"], "value"),
            ["event_type"],
        ),
        [0.5, 0.95],
    ).select("event_type", "q50", "q95", "n_values")
    return hll.join(kll, on="event_type", how="inner")


@register(
    "a5_profile_pivot_md5",
    oracle="""
    WITH prof AS (
        SELECT l_orderkey,
               md5(string_agg(l_returnflag, ','
                   ORDER BY l_linenumber, l_returnflag)) AS profile_md5
        FROM lineitem GROUP BY l_orderkey),
    desig AS (
        SELECT l_orderkey AS profile_key, l_linenumber - 1 AS pos,
               CAST(CAST(l_quantity AS INT) % 10 AS VARCHAR) AS allele
        FROM lineitem WHERE l_linenumber <= 4
        UNION
        SELECT l_orderkey, l_linenumber - 1,
               CAST(CAST(l_quantity AS INT) % 7 AS VARCHAR)
        FROM lineitem WHERE l_linenumber <= 4 AND l_partkey % 17 = 0
    ),
    defsrc AS (
        SELECT l_orderkey AS dk, l_linenumber - 1 AS pos,
               min(CAST(CAST(l_quantity AS INT) % 10 AS VARCHAR)) AS allele
        FROM lineitem WHERE l_linenumber <= 4
        GROUP BY l_orderkey, l_linenumber
    ),
    defs0 AS (
        SELECT dk, list(allele ORDER BY pos) AS profile
        FROM defsrc GROUP BY dk HAVING count(*) = 4
    ),
    defs1 AS (
        SELECT dk, CASE WHEN dk % 70 = 0
               THEN list_value(profile[1], profile[2], 'N', profile[4])
               ELSE profile END AS profile
        FROM defs0
    ),
    defs AS (SELECT min(dk) AS st, profile FROM defs1 GROUP BY profile),
    sch AS (
        SELECT d.st, p.pos, d.profile[CAST(p.pos AS INT) + 1] AS def_allele
        FROM defs d CROSS JOIN (SELECT range AS pos FROM range(4)) p
    ),
    hits AS (
        -- the IF branch (isolatedb.sql:1526-1540): 'N' is appended to
        -- EVERY eligible isolate's per-position set, so a wildcard
        -- definition row matches every designated isolate; an exact
        -- row needs positional set membership.  Eligibility is ANY
        -- designation (not completeness) under allow_missing_loci.
        SELECT d.profile_key, s.st, s.pos
        FROM desig d JOIN sch s ON d.pos = s.pos AND d.allele = s.def_allele
        WHERE s.def_allele <> 'N'
        UNION
        SELECT e.profile_key, s.st, s.pos
        FROM (SELECT DISTINCT profile_key FROM desig) e
        CROSS JOIN sch s WHERE s.def_allele = 'N'
    )
    SELECT 'pivot' AS kind, profile_md5 AS key_str, count(*) AS n
    FROM prof GROUP BY profile_md5
    UNION ALL
    SELECT 'multi' AS kind, CAST(h.profile_key AS VARCHAR) AS key_str,
           h.st AS n
    FROM hits h
    GROUP BY h.profile_key, h.st HAVING count(*) = 4
    """,
)
def a5_pivot(spark, sf_dir):
    """A5: the scheme-warehouse pivot (kind='pivot' — long
    designations -> ordered allele vector -> md5 identity,
    initiate_scheme_warehouse, sql/seqdef.sql:1199-1253; md5-of-array
    :1151-1153; orders sharing a profile are the 'same ST') + the r11
    fold-in (VERDICT r10 #5) kind='multi': A5 path (b),
    multi-designation scheme assignment by positional SET MEMBERSHIP
    (sql/isolatedb.sql:1555-1566 — profile[i]=ANY(the isolate's
    designations at locus i)).  The lineitem table's duplicate
    l_linenumber values are natural paralogous double designations; a
    second allele stream (l_partkey%17 rows) adds a controlled extra
    rate.  Definitions are the deterministic min-allele-per-position
    vectors of complete orders, deduped (st = min orderkey), with
    ~1.4% of them carrying a wildcard 'N' at position 3.  No
    designation-combination pre-expansion exists on either side — the
    oracle is the same membership join in ANSI SQL."""
    from bigsdb_spark.operators.profiles import assign_scheme_fields_multi

    pivot = (
        build_profiles(
            tbl(spark, sf_dir, "lineitem"),
            "l_orderkey", "l_linenumber", "l_returnflag",
        )
        .groupBy("profile_md5")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("pivot").alias("kind"),
            F.col("profile_md5").alias("key_str"),
            F.col("n"),
        )
    )
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 4)
    allele10 = (F.col("l_quantity").cast("int") % 10).cast("string")
    allele7 = (F.col("l_quantity").cast("int") % 7).cast("string")
    desig = li.select(
        F.col("l_orderkey").alias("profile_key"),
        (F.col("l_linenumber") - 1).alias("pos"),
        allele10.alias("allele"),
    ).unionByName(
        li.filter(F.col("l_partkey") % 17 == 0).select(
            F.col("l_orderkey").alias("profile_key"),
            (F.col("l_linenumber") - 1).alias("pos"),
            allele7.alias("allele"),
        )
    )
    # oracle's defsrc+defs0 (min allele per (dk, pos), then the
    # ordered 4-vector of complete orders) fused into ONE groupBy with
    # FOUR conditional min aggregates — min(when(pos = p, allele)) is
    # min(VARCHAR) per position, partial-aggregated map-side and fully
    # codegen'd.  The r12 interim form collected the (pos, allele)
    # structs per dk and ran array_min/filter/transform over them:
    # higher-order functions stay INTERPRETED (no whole-stage codegen)
    # and that expression tree's cost proved JIT-state-dependent under
    # the bench's reset protocol (see profiles._multi_intersect).
    # "complete" = all 4 positions present = no null min.
    pos_col = F.col("l_linenumber") - 1
    defs0 = (
        li.groupBy(F.col("l_orderkey").alias("dk"))
        .agg(
            *[
                F.min(F.when(pos_col == p, allele10)).alias(f"_a{p}")
                for p in range(4)
            ]
        )
        .filter(
            F.col("_a0").isNotNull()
            & F.col("_a1").isNotNull()
            & F.col("_a2").isNotNull()
            & F.col("_a3").isNotNull()
        )
        .select(
            "dk",
            F.array(*[F.col(f"_a{p}") for p in range(4)]).alias("profile"),
        )
    )
    defs1 = defs0.select(
        "dk",
        # F.get (0-based, null on out-of-bounds): ANSI indexing throws
        # when Catalyst collapses this projection with the size filter
        F.when(
            F.col("dk") % 70 == 0,
            F.array(
                F.get("profile", 0),
                F.get("profile", 1),
                F.lit("N"),
                F.get("profile", 3),
            ),
        )
        .otherwise(F.col("profile"))
        .alias("profile"),
    )
    defs = defs1.groupBy("profile").agg(F.min("dk").alias("st"))
    multi = assign_scheme_fields_multi(
        desig,
        defs.select("st", "profile"),
        total_loci=4,
        # the IF branch (isolatedb.sql:1526-1540): every designated
        # isolate is eligible, missing positions match only via a
        # definition 'N' — the branch where 'N' has its wildcard
        # meaning (r12, ADVICE r11: the ELSE branch treats 'N' as a
        # literal allele, so the previous allow_missing_loci=False
        # form exercised an extension the reference doesn't have)
        allow_missing_loci=True,
        # k=1 is pinned by the construction (wildcards only ever at
        # position 3, so three positions have a zero wildcard floor);
        # passing it + broadcast_defs skips the auto-probe job in the
        # serving path.  defs here is ~#orders rows x 4 — a dimension
        # broadcast — which keeps the whole leg inside grp's single
        # profile_key exchange (VERDICT r11 #1)
        prune_positions=1,
        broadcast_defs=True,
    ).select(
        F.lit("multi").alias("kind"),
        F.col("profile_key").cast("string").alias("key_str"),
        F.col("st").alias("n"),
    )
    return pivot.unionByName(multi)


@register(
    "a6_a7_completeness",
    oracle="""
    SELECT 'scheme' AS kind, l_orderkey AS entity_id,
           count(DISTINCT l_linenumber) AS n_loci,
           round(count(DISTINCT l_linenumber) / 7.0, 4) AS score
    FROM lineitem GROUP BY l_orderkey
    UNION ALL
    SELECT 'provenance' AS kind, event_id AS entity_id,
           CAST(NULL AS BIGINT) AS n_loci,
           round((CASE WHEN value > 1 THEN CAST(0.5 AS DOUBLE)
                       ELSE CAST(0.0 AS DOUBLE) END)
               + (CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 10
                       THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
               + (CASE WHEN event_type <> 'error' THEN CAST(0.2 AS DOUBLE)
                       ELSE CAST(0.0 AS DOUBLE) END), 4) AS score
    FROM events
    """,
)
def a6_a7(spark, sf_dir):
    """A6 + A7: profile completeness — COUNT(DISTINCT locus), DISTINCT
    because paralogous double designations count once
    (create_isolate_scheme_status_table, sql/isolatedb.sql:1590-1660) —
    and the weighted provenance-completion metric, a row-wise weighted
    sum of populated/acceptable fields (Datastore.pm:1941)."""
    li = tbl(spark, sf_dir, "lineitem")
    scheme = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_linenumber").alias("n_loci"),
        F.round(F.countDistinct("l_linenumber") / F.lit(7.0), 4).alias("score"),
    ).select(
        F.lit("scheme").alias("kind"),
        F.col("l_orderkey").alias("entity_id"),
        "n_loci",
        "score",
    )
    e = tbl(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    score = (
        F.when(F.col("value") > 1, 0.5).otherwise(0.0)
        + F.when(k > 10, 0.3).otherwise(0.0)
        + F.when(F.col("event_type") != "error", 0.2).otherwise(0.0)
    )
    prov = e.select(
        F.lit("provenance").alias("kind"),
        F.col("event_id").alias("entity_id"),
        F.lit(None).cast("long").alias("n_loci"),
        F.round(score, 4).alias("score"),
    )
    return scheme.unionByName(prov)


@register(
    "a8_counts",
    oracle="""
    SELECT 'ge15' AS kind, c_custkey AS entity_id, coalesce(n, 0) AS n
    FROM customer LEFT JOIN (
        SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) cnt
    ON o_custkey = c_custkey WHERE coalesce(n, 0) >= 15
    UNION ALL
    SELECT 'lt2_zero' AS kind, c_custkey AS entity_id, coalesce(n, 0) AS n
    FROM customer LEFT JOIN (
        SELECT o_custkey, count(*) AS n FROM orders
        WHERE o_orderstatus = 'P' GROUP BY o_custkey) cnt
    ON o_custkey = c_custkey WHERE coalesce(n, 0) < 2
    UNION ALL
    SELECT 'per_locus' AS kind, l_suppkey AS entity_id,
           CAST(NULL AS BIGINT) AS n
    FROM (
        SELECT DISTINCT l_suppkey FROM lineitem
        GROUP BY l_suppkey, l_partkey HAVING count(*) >= 5)
    """,
)
def a8_counts(spark, sf_dir):
    """A8: the count-predicate family — 'entities with COUNT(fact) >= k'
    (IsolateQueryPage.pm:3686-3785); '< k' ORing in the zero branch
    (:3832 _searching_for_zero); and the 'any locus' variant — >= k fact
    rows at the SAME locus, GROUP BY (entity, locus) HAVING then
    distinct entities (:3771)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    ge = with_count_predicate(c, o, "c_custkey", "o_custkey", ">=", 15).select(
        F.lit("ge15").alias("kind"), F.col("c_custkey").alias("entity_id"), "n"
    )
    op = o.filter(F.col("o_orderstatus") == "P")
    lt = with_count_predicate(c, op, "c_custkey", "o_custkey", "<", 2).select(
        F.lit("lt2_zero").alias("kind"), F.col("c_custkey").alias("entity_id"), "n"
    )
    li = tbl(spark, sf_dir, "lineitem")
    per_locus = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 5)
        .select("l_suppkey")
        .distinct()
        .select(
            F.lit("per_locus").alias("kind"),
            F.col("l_suppkey").alias("entity_id"),
            F.lit(None).cast("long").alias("n"),
        )
    )
    return ge.unionByName(lt).unionByName(per_locus)


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
