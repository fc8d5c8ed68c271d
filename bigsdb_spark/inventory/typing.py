"""Inventory: distance / clustering / typing analytics (SURVEY §2.5).

lineitem is the long designation table (order = profile, linenumber =
locus, returnflag = allele; 'N' is a real returnflag value and doubles
as the reference's 'N' wildcard sentinel). Pairwise operators run on a
deterministic subset (l_orderkey % 40 = 0) — the reference's
matching_profiles is likewise always anchored to a query profile or an
existing group, never all-pairs over the warehouse.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigsdb_spark.inventory.registry import register, tbl
from bigsdb_spark.operators.clustering import burst_slv_dlv, single_linkage
from bigsdb_spark.operators.profiles import matching_profiles, profile_pair_distances

# Shared CTE for the oracle side: the restricted long table and its
# pairwise distances (reference matching_profiles self-join shape,
# sql/seqdef.sql:1386-1392).
_PAIR_CTE = """
    li AS (
        SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        WHERE l_orderkey % 40 = 0 AND l_orderkey < 20000),
    pd AS (
        SELECT a.l_orderkey AS id1, b.l_orderkey AS id2,
               count(*) AS shared,
               CAST(sum(CASE WHEN a.l_returnflag = b.l_returnflag
                             THEN 1 ELSE 0 END) AS BIGINT) AS matched,
               CAST(count(*) - sum(CASE WHEN a.l_returnflag = b.l_returnflag
                             THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        FROM li a JOIN li b
          ON a.l_linenumber = b.l_linenumber AND a.l_orderkey < b.l_orderkey
        GROUP BY 1, 2)
"""

# Relative-threshold variant: the reference computes loci-in-common and
# matched over NON-'N' loci only (matching_profiles_with_relative_threshold,
# sql/seqdef.sql:1393-1410: p1.allele_id!='N' AND p2.allele_id!='N').
_PAIR_NO_N_CTE = """
    li AS (
        SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        WHERE l_orderkey % 40 = 0 AND l_orderkey < 20000),
    pd AS (
        SELECT a.l_orderkey AS id1, b.l_orderkey AS id2,
               count(*) AS shared,
               CAST(sum(CASE WHEN a.l_returnflag = b.l_returnflag
                             THEN 1 ELSE 0 END) AS BIGINT) AS matched,
               CAST(count(*) - sum(CASE WHEN a.l_returnflag = b.l_returnflag
                             THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        FROM li a JOIN li b
          ON a.l_linenumber = b.l_linenumber AND a.l_orderkey < b.l_orderkey
        WHERE a.l_returnflag != 'N' AND b.l_returnflag != 'N'
        GROUP BY 1, 2)
"""


def _subset(spark, sf_dir):
    # SF-independent anchor set (~375 profiles): all-pairs distance work
    # must not grow quadratically with the table — at scale, pairwise ops
    # are always anchored (a query profile, a group, an LSH bucket).
    return tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % 40 == 0) & (F.col("l_orderkey") < 20000)
    )


import weakref

# d1/d2/d3/d4/d7 all consume the same pair-distance frame; cache it
# once per (session, sf_dir, mode) so the self-join runs once. Keyed on
# the SESSION OBJECT via weakref (not id(spark) — CPython reuses ids
# after GC, so a new session could collide with a dead one's key and be
# served a frame bound to a stopped session). Entries vanish with the
# session, so nothing pins past sessions or their cached RDDs.
_pairs_memo: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _pairs(spark, sf_dir, wildcard=False, exclude_wildcard=False):
    per_session = _pairs_memo.get(spark)
    if per_session is None:
        per_session = {}
        _pairs_memo[spark] = per_session
    key = (sf_dir, wildcard, exclude_wildcard)
    if key not in per_session:
        per_session[key] = profile_pair_distances(
            _subset(spark, sf_dir), "l_orderkey", "l_linenumber", "l_returnflag",
            wildcard=wildcard, exclude_wildcard=exclude_wildcard,
        ).cache()
    return per_session[key]


@register(
    "d1_profile_distance_pairs",
    oracle=f"WITH {_PAIR_CTE} SELECT id1, id2, shared, matched, hamming FROM pd",
)
def d1_pairs(spark, sf_dir):
    """D1/D6/J4: pairwise profile distances via the long-form self-join —
    the inverted-index shape; never a vector crossJoin
    (profile_diff sql/seqdef.sql:1380-1384, GenomeComparator
    distance matrix :1446)."""
    return _pairs(spark, sf_dir)


@register(
    "d2_matching_profiles",
    oracle=f"""
    WITH {_PAIR_CTE}
    SELECT 0 AS wildcard, id1, id2, shared, matched, hamming
    FROM pd WHERE matched >= 7 - 1
    UNION ALL
    SELECT 1 AS wildcard, id1, id2, shared, matched, hamming FROM (
        SELECT a.l_orderkey AS id1, b.l_orderkey AS id2,
               count(*) AS shared,
               CAST(sum(CASE WHEN a.l_returnflag = b.l_returnflag
                             OR a.l_returnflag = 'N' OR b.l_returnflag = 'N'
                             THEN 1 ELSE 0 END) AS BIGINT) AS matched,
               CAST(count(*) - sum(CASE WHEN a.l_returnflag = b.l_returnflag
                             OR a.l_returnflag = 'N' OR b.l_returnflag = 'N'
                             THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        FROM li a JOIN li b
          ON a.l_linenumber = b.l_linenumber AND a.l_orderkey < b.l_orderkey
        GROUP BY 1, 2) w
    WHERE matched >= 7 - 1
    """,
)
def d2_matching(spark, sf_dir):
    """D2: matching_profiles(scheme, p, k=1) — pairs within <= k
    mismatches, HAVING count(matches) >= total - k
    (sql/seqdef.sql:1386-1392) — plus the 'N'-wildcard variant where 'N'
    on either side matches anything (the arbitrary-allele sentinel,
    :1380-1392; profile wildcard join sql/isolatedb.sql:1529-1566),
    discriminated by the ``wildcard`` flag column."""
    exact = matching_profiles(_pairs(spark, sf_dir), total_loci=7, k=1).select(
        F.lit(0).alias("wildcard"), "id1", "id2", "shared", "matched", "hamming"
    )
    wild = matching_profiles(
        _pairs(spark, sf_dir, wildcard=True), total_loci=7, k=1
    ).select(
        F.lit(1).alias("wildcard"), "id1", "id2", "shared", "matched", "hamming"
    )
    return exact.unionByName(wild)


@register(
    "d3_relative_threshold",
    oracle=f"""
    WITH {_PAIR_NO_N_CTE}
    SELECT id1, id2, shared, matched, hamming FROM pd
    WHERE matched >= round_even(shared * (7 - 2) / 7.0, 0)
    """,
)
def d3_relative(spark, sf_dir):
    """D3: relative threshold — cutoff scales with the loci actually
    shared: matched >= round(shared*(total-k)/total), where shared and
    matched count NON-'N' loci only on both sides
    (matching_profiles_with_relative_threshold, sql/seqdef.sql:1393-1410
    filters p1.allele_id!='N' AND p2.allele_id!='N')."""
    return matching_profiles(
        _pairs(spark, sf_dir, exclude_wildcard=True), total_loci=7, k=2, relative=True
    )


@register(
    "d4_single_linkage_groups",
    oracle=f"""
    WITH RECURSIVE {_PAIR_CTE},
    pairs AS (SELECT id1, id2 FROM pd WHERE matched >= 7 - 1),
    edges AS (SELECT id1, id2 FROM pairs
              UNION SELECT id2, id1 FROM pairs),
    nodes AS (SELECT DISTINCT l_orderkey AS id FROM li),
    reach (id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.id1, w.r FROM edges e JOIN reach w ON e.id2 = w.id)
    SELECT id, min(r) AS group_id FROM reach GROUP BY id
    """,
)
def d4_clusters(spark, sf_dir):
    """D4: classification-group single-linkage clustering. The greedy
    sequential merge (cluster.pl:107-171, merge-into-smallest-group-id)
    converges to connected components labelled by smallest member —
    computed here by iterative min-label propagation (driver loop over
    join+groupBy rounds)."""
    li = _subset(spark, sf_dir)
    pairs = matching_profiles(_pairs(spark, sf_dir), total_loci=7, k=1)
    nodes = li.select("l_orderkey").distinct()
    return single_linkage(pairs.select("id1", "id2"), nodes).select(
        "id", "group_id"
    )


@register(
    "d7_burst_slv",
    oracle=f"""
    WITH {_PAIR_CTE},
    dirs AS (
        SELECT id1 AS id, hamming FROM pd
        UNION ALL SELECT id2 AS id, hamming FROM pd),
    counts AS (
        SELECT id,
               CAST(sum(CASE WHEN hamming = 1 THEN 1 ELSE 0 END) AS BIGINT) AS slv,
               CAST(sum(CASE WHEN hamming = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dlv,
               CAST(sum(CASE WHEN hamming = 3 THEN 1 ELSE 0 END) AS BIGINT) AS tlv
        FROM dirs GROUP BY id)
    SELECT 'burst' AS kind, id, slv, dlv, tlv,
           CAST(row_number() OVER (ORDER BY slv DESC, dlv DESC, id) AS BIGINT)
               AS founder_rank
    FROM counts
    UNION ALL
    SELECT 'mst' AS kind, u AS id, v AS slv, CAST(v - u AS BIGINT) AS dlv,
           CAST(0 AS BIGINT) AS tlv, CAST(0 AS BIGINT) AS founder_rank
    FROM (
        SELECT x AS u, lead(x) OVER (ORDER BY x) AS v FROM (
            SELECT DISTINCT CAST(round(c_acctbal * 100, 0) AS BIGINT) AS x
            FROM customer WHERE c_custkey % 10 = 0 AND c_custkey <= 1500))
    WHERE v IS NOT NULL
    """,
)
def d7_burst(spark, sf_dir):
    """D7: BURST SLV/DLV counts + founder ranking (max SLVs, ties by
    DLVs then id — BURST.pm:238,336,637-646), ``kind='burst'``.

    r10 fold (VERDICT r9 task 5, the r7/r8 spare-column pattern): a
    second ``kind='mst'`` leg runs the REAL distributed Borůvka MST
    (operators/mst.py — D8, the GrapeTree/MSTree tree surface,
    GrapeTree.pm/Plugins) over a complete graph on an SF-capped set of
    distinct 1-D points (customer balances in cents) with |u - v|
    weights.  On distinct 1-D points every non-adjacent edge is the
    STRICT maximum of the cycle it closes with the sorted chain (its
    weight is a sum of >= 2 positive adjacent gaps), so by the cycle
    property the MST is unique and equals the sorted adjacent chain —
    which DuckDB expresses exactly as a lead() window.  That converts
    boruvka_mst from tests-only to a full value oracle on a ~150-node
    / ~11k-edge graph (several Borůvka rounds) without gate-layout
    churn.  Column reuse on the mst leg (documented, positional):
    ``id``=u, ``slv``=v, ``dlv``=edge weight, ``tlv``/``founder_rank``
    =0.  d7 is not in the bench headline, so the fold is bench-neutral."""
    out = burst_slv_dlv(_pairs(spark, sf_dir)).select(
        F.lit("burst").alias("kind"),
        "id", "slv", "dlv", "tlv",
        F.col("founder_rank").cast("long").alias("founder_rank"),
    )
    from bigsdb_spark.operators.mst import boruvka_mst

    nodes = (
        tbl(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") <= 1500))
        .select(F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("x"))
        .distinct()
    )
    e1 = nodes.select(F.col("x").alias("u"))
    e2 = nodes.select(F.col("x").alias("v"))
    edges = e1.join(e2, e1["u"] < e2["v"]).select(
        "u", "v", (F.col("v") - F.col("u")).alias("w")
    )
    mst_leg = boruvka_mst(edges, nodes).select(
        F.lit("mst").alias("kind"),
        F.col("u").alias("id"),
        F.col("v").alias("slv"),
        F.col("w").cast("long").alias("dlv"),
        F.lit(0).cast("long").alias("tlv"),
        F.lit(0).cast("long").alias("founder_rank"),
    )
    return out.unionByName(mst_leg)
