"""Distributed minimum spanning tree (Borůvka) over profile-distance
edges — the computational core of the GrapeTree / PhyloViz minimum
spanning tree the reference delegates to external binaries
(Plugins/GrapeTree.pm:324-388 exports a profile file and shells out;
Plugins/PhyloViz.pm posts to a web service).  Here the MST itself is
a DataFrame algorithm, so a tree over millions of profiles never
leaves the cluster.

Algorithm (public knowledge — Borůvka 1926): every component picks
its lightest outgoing edge, the picked edges merge components, repeat
— O(log V) rounds.  Each round is (a) two hash joins to tag edge
endpoints with their component, (b) one groupBy-min per component,
(c) a label-propagation merge of the picked component graph (reusing
``clustering.single_linkage``, itself the pointer-halving distributed
path).  Edge picks follow the total order (w, u, v) — with a strict
total order on edges, Borůvka provably never creates a cycle even
with repeated weights, and the resulting MST edge SET is unique, which
is what the tests pin against an independent Kruskal oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from bigsdb_spark.operators.clustering import checkpoint_no_stats, single_linkage

__all__ = ["boruvka_mst", "kruskal_mst_py"]


def boruvka_mst(
    edges: DataFrame,
    nodes: DataFrame,
    max_rounds: int = 40,
) -> DataFrame:
    """MST edge set of an undirected weighted graph.

    ``edges``: (u, v, w) — one row per undirected edge (orientation
    irrelevant, duplicates tolerated); ``nodes``: single-column frame
    of every vertex (isolated vertices simply never contribute edges).
    Returns (u, v, w) with u < v — |components' spanning forest| rows
    (V - C edges for C connected components).
    """
    canon = (
        edges.select(
            F.least("u", "v").alias("u"),
            F.greatest("u", "v").alias("v"),
            F.col("w"),
        )
        .filter(F.col("u") != F.col("v"))
        # the same undirected edge may arrive in both orientations or
        # repeatedly: keep its minimum weight (total order -> unique)
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )
    # checkpoint_no_stats, not plain localCheckpoint: a checkpoint
    # COPIES the optimized plan's estimated sizeInBytes, and Catalyst's
    # size estimator multiplies child sizes at every join — an
    # iterative loop that checkpoints join outputs therefore grows the
    # stats BigInt EXPONENTIALLY in rounds (nested doubly so: each
    # round here runs single_linkage's own loop).  The r10 d7 gate fold
    # hit it for real: an 18-minute single-core BigInteger.multiply
    # grind on a 150-node graph.  Dropping stats at every round
    # boundary keeps planning O(1) per round.
    canon = checkpoint_no_stats(canon)
    comp = nodes.select(F.col(nodes.columns[0]).alias("id")).withColumn(
        "comp", F.col("id")
    )
    mst = None
    for _ in range(max_rounds):
        cu = comp.select(F.col("id").alias("u"), F.col("comp").alias("cu"))
        cv = comp.select(F.col("id").alias("v"), F.col("comp").alias("cv"))
        live = checkpoint_no_stats(
            canon.join(cu, "u")
            .join(cv, "v")
            .filter(F.col("cu") != F.col("cv"))
        )  # feeds two directed views below
        if live.limit(1).count() == 0:
            break
        # each component's lightest outgoing edge under the (w, u, v)
        # total order — min over a comparable struct, both directions
        pick = F.struct("w", "u", "v").alias("e")
        directed = live.select(F.col("cu").alias("c"), pick).unionAll(
            live.select(F.col("cv").alias("c"), pick)
        )
        chosen = checkpoint_no_stats(
            directed.groupBy("c")
            .agg(F.min("e").alias("e"))
            .select("e.u", "e.v", "e.w")
            .distinct()  # both endpoints of an edge may have picked it
        )
        mst = chosen if mst is None else mst.unionAll(chosen)
        # merge: connected components of the picked COMPONENT graph,
        # then route every vertex through its old component's new label
        cpairs = (
            live.join(
                chosen.select(
                    F.col("u").alias("_pu"), F.col("v").alias("_pv"), F.col("w").alias("_pw")
                ),
                (F.col("u") == F.col("_pu"))
                & (F.col("v") == F.col("_pv"))
                & (F.col("w") == F.col("_pw")),
                "inner",
            )
            .select(F.col("cu").alias("id1"), F.col("cv").alias("id2"))
            .distinct()
        )
        old_comps = comp.select(F.col("comp").alias("id")).distinct()
        relabel = single_linkage(cpairs, old_comps).select(
            F.col("id").alias("comp"), F.col("group_id").alias("_new")
        )
        comp = checkpoint_no_stats(
            comp.join(relabel, "comp")
            .select("id", F.col("_new").alias("comp"))
        )
    if mst is None:
        return canon.limit(0)
    return mst.select("u", "v", "w").distinct()


def kruskal_mst_py(edges: list[tuple], n_nodes_hint: int = 0) -> set[tuple]:
    """Independent driver-side Kruskal oracle for tests: same (w, u, v)
    total order, classic union-find.  Returns the MST edge set as
    {(u, v, w)} with u < v."""
    canon = {}
    for u, v, w in edges:
        if u == v:
            continue
        a, b = (u, v) if u < v else (v, u)
        if (a, b) not in canon or w < canon[(a, b)]:
            canon[(a, b)] = w
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (a, b), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out
