"""Distributed Borůvka MST vs an independent Kruskal oracle
(operators/mst.py).  With the strict (w, u, v) edge total order both
algorithms produce the SAME unique MST edge set, so the test compares
sets exactly — including under repeated weights and disconnected
graphs."""

import pytest
import random

from bigsdb_spark.operators.mst import boruvka_mst, kruskal_mst_py


def _run(spark, n, edge_list):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id int")
    edges = spark.createDataFrame(edge_list, "u int, v int, w int")
    want = kruskal_mst_py(edge_list)
    # r13: small graphs auto-route to the single-task Kruskal path —
    # check it AND the distributed Borůvka loop (forced with
    # local_edge_rows=0) against the independent oracle
    got = {
        (r["u"], r["v"], r["w"]) for r in boruvka_mst(edges, nodes).collect()
    }
    assert got == want
    got_loop = {
        (r["u"], r["v"], r["w"])
        for r in boruvka_mst(edges, nodes, local_edge_rows=0).collect()
    }
    assert got_loop == want
    return got


def test_mst_small_chain(spark):
    got = _run(spark, 4, [(0, 1, 5), (1, 2, 3), (2, 3, 4), (0, 3, 10)])
    assert got == {(0, 1, 5), (1, 2, 3), (2, 3, 4)}


@pytest.mark.slow
def test_mst_random_graphs_with_ties(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 30
        edge_list = []
        for _ in range(120):
            u, v = rng.randrange(n), rng.randrange(n)
            if u != v:
                # small weight range forces many ties -> exercises the
                # total-order tie-break
                edge_list.append((u, v, rng.randrange(1, 6)))
        got = _run(spark, n, edge_list)
        # spanning forest size: V - #components
        comps = _component_count(n, edge_list)
        assert len(got) == n - comps


def test_mst_disconnected_forest(spark):
    edge_list = [(0, 1, 1), (1, 2, 2), (5, 6, 1), (6, 7, 9), (5, 7, 3)]
    got = _run(spark, 10, edge_list)
    assert got == {(0, 1, 1), (1, 2, 2), (5, 6, 1), (5, 7, 3)}


def test_mst_duplicate_and_reversed_edges(spark):
    # the same undirected edge given twice in both orientations with
    # different weights keeps its minimum
    got = _run(spark, 3, [(0, 1, 9), (1, 0, 2), (1, 2, 4), (2, 1, 4)])
    assert got == {(0, 1, 2), (1, 2, 4)}


def _component_count(n, edge_list):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v, _ in edge_list:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    return len({find(i) for i in range(n)})


def test_mst_deep_chain_pseudoforest(spark):
    # r12 merge rewrite: a path graph with strictly increasing weights
    # makes every component's pick point LEFT, so round 1's pick map is
    # a single depth-n chain rooted at the mutual (0, 1) pair — the
    # worst case for the pointer-doubling contraction (many jumps, one
    # weak component).
    n = 64
    edge_list = [(i, i + 1, i + 1) for i in range(n - 1)]
    got = _run(spark, n, edge_list)
    assert got == {(i, i + 1, i + 1) for i in range(n - 1)}


def test_mst_small_max_rounds_converges_or_raises(spark):
    # ADVICE r12 (mst.py): the inner pointer-doubling loop used to be
    # bounded by the caller-facing max_rounds and silently continued
    # with a non-converged contraction — a path graph with increasing
    # weights picks ALL edges in round 1 (a depth-n chain needing
    # ceil(log2 n) doubling passes), so max_rounds=5 on n=64 plus a
    # heavy chord produced non-MST (cycle) edges.  The bound is now
    # ceil(log2(n_live)) + 1, independent of max_rounds.
    n = 64
    edge_list = [(i, i + 1, i + 1) for i in range(n - 1)] + [(0, 63, 1000)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id int")
    edges = spark.createDataFrame(edge_list, "u int, v int, w int")
    got = {
        (r["u"], r["v"], r["w"])
        for r in boruvka_mst(
            edges, nodes, max_rounds=5, local_edge_rows=0
        ).collect()
    }
    assert got == kruskal_mst_py(edge_list)


def test_mst_shuffle_join_fallback(spark, monkeypatch):
    # r12 broadcast knob: above SPARK_GRAFT_MST_BROADCAST_ROWS the
    # merge/tag joins must stay shuffle-based and still produce the
    # identical edge set.  Force the fallback by zeroing the threshold.
    import random

    from bigsdb_spark.operators import mst as mst_mod

    monkeypatch.setattr(mst_mod, "BROADCAST_COMPONENT_ROWS", 0)
    rng = random.Random(7)
    n = 25
    edge_list = []
    for _ in range(90):
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edge_list.append((u, v, rng.randrange(1, 5)))
    _run(spark, n, edge_list)
