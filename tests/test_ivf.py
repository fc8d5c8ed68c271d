"""IVF k-means ANN: structure + recall against brute force."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bigsdb_spark.operators.similarity import cosine_topk_pairs, ivf_kmeans_ann


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    rng = random.Random(42)
    rows = []
    centers = [[5.0, 0.0, 0.0, 0.0], [0.0, 5.0, 0.0, 0.0], [0.0, 0.0, 5.0, 0.0]]
    vid = 0
    for c in centers:
        for _ in range(20):
            rows.append((vid, [x + rng.gauss(0, 0.3) for x in c]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.mark.slow
def test_numpy_topk_equals_expression(spark, clustered_vectors):
    """The BLAS fast path must return exactly the expression fold's
    result (same rounding, same tiebreaks)."""
    from bigsdb_spark.operators.similarity import cosine_topk_pairs_np

    expr = cosine_topk_pairs(clustered_vectors, "vec_id", "embedding", k=10).collect()
    fast = cosine_topk_pairs_np(clustered_vectors, "vec_id", "embedding", k=10).collect()
    assert [(r.id1, r.id2, r.cosine) for r in expr] == [
        (r.id1, r.id2, r.cosine) for r in fast
    ]


@pytest.mark.slow
def test_ivf_structure_and_recall(spark, clustered_vectors):
    ann = ivf_kmeans_ann(
        clustered_vectors, "vec_id", "embedding", n_centroids=3, top_k=3
    ).cache()
    got = ann.collect()
    assert len(got) > 0
    # every query returns <= top_k neighbours, none is itself
    per_q = ann.groupBy("qid").count().agg(F.max("count")).collect()[0][0]
    assert per_q <= 3
    assert ann.filter(F.col("qid") == F.col("nn_id")).count() == 0
    # with well-separated clusters and k = n_clusters, the global
    # most-similar pair should be recovered inside a cell
    top_pair = cosine_topk_pairs(clustered_vectors, "vec_id", "embedding", k=1).collect()[0]
    found = ann.filter(
        ((F.col("qid") == top_pair.id1) & (F.col("nn_id") == top_pair.id2))
        | ((F.col("qid") == top_pair.id2) & (F.col("nn_id") == top_pair.id1))
    ).count()
    assert found >= 1


@pytest.mark.slow
def test_ivf_multiprobe_recall_monotone_and_exact_at_full_probe(
    spark, clustered_vectors
):
    """Multi-probe IVF: probing ALL cells must equal the exact
    per-query top-k over the whole corpus (brute force), and recall is
    monotone in n_probe. Uses a query vector set whose nearest
    neighbours straddle cell boundaries (the case n_probe=1 misses)."""
    n_cent = 3

    def topk_set(df):
        return {(r.qid, r.nn_id) for r in df.collect()}

    probe1 = topk_set(
        ivf_kmeans_ann(
            clustered_vectors, "vec_id", "embedding",
            n_centroids=n_cent, top_k=3, n_probe=1,
        )
    )
    probe_all = topk_set(
        ivf_kmeans_ann(
            clustered_vectors, "vec_id", "embedding",
            n_centroids=n_cent, top_k=3, n_probe=n_cent,
        )
    )
    # brute-force exact per-query top-3 over the full corpus
    a = clustered_vectors.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("e1"),
    )
    b = clustered_vectors.select(
        F.col("vec_id").alias("nn_id"),
        F.col("embedding").alias("e2"),
    )
    from pyspark.sql import Window

    from bigsdb_spark.operators.similarity import with_cosine, _norm

    pairs = (
        a.crossJoin(b)
        .filter(F.col("qid") != F.col("nn_id"))
        .withColumn("n1", _norm(F.col("e1")))
        .withColumn("n2", _norm(F.col("e2")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nn_id"))
    brute = (
        with_cosine(pairs)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    brute_set = {(r.qid, r.nn_id) for r in brute.collect()}
    assert probe_all == brute_set  # full probe == exact
    # recall monotone: probing more cells never loses true neighbours
    assert len(probe1 & brute_set) <= len(probe_all & brute_set)


@pytest.mark.slow
def test_ivf_gemm_matches_join_form(spark, clustered_vectors):
    """r7: the per-cell GEMM scorer (ivf_kmeans_ann_gemm) returns the
    join form's exact result — same (qid, nn_id, centroid) set at
    single- and full-probe, cosines equal after the shared 6dp
    rounding — and a planted zero-norm vector is excluded from both
    sides on both paths (NaN cosine would otherwise be every query's
    'best' neighbour under Spark's NaN-is-greatest ordering)."""
    from bigsdb_spark.operators.similarity import ivf_kmeans_ann_gemm

    emb = clustered_vectors.union(
        spark.createDataFrame(
            [(999, [0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
        )
    )
    for n_probe in (1, 3):
        join_rows = ivf_kmeans_ann(
            emb, "vec_id", "embedding", n_centroids=3, top_k=3, n_probe=n_probe
        ).collect()
        gemm_rows = ivf_kmeans_ann_gemm(
            emb, "vec_id", "embedding", n_centroids=3, top_k=3, n_probe=n_probe
        ).collect()
        jset = {(r.qid, r.nn_id, r.centroid) for r in join_rows}
        gset = {(r.qid, r.nn_id, r.centroid) for r in gemm_rows}
        assert gset == jset and len(jset) > 0
        jcos = {(r.qid, r.nn_id): r.cosine for r in join_rows}
        assert all(
            abs(r.cosine - jcos[(r.qid, r.nn_id)]) <= 1e-6 for r in gemm_rows
        )
        assert not any(999 in (r.qid, r.nn_id) for r in join_rows + gemm_rows)


@pytest.mark.slow
def test_ivf_injected_centroids_serving_path(spark, clustered_vectors):
    """r7: both IVF forms accept precomputed centroids (serve from a
    saved index; the only workable path when n_centroids scales with
    the corpus).  With the true cluster centers injected, the numpy
    assignment must agree between forms, full-probe must equal the
    MLlib-free exact search, and the probe list must be best-first."""
    from bigsdb_spark.operators.similarity import ivf_kmeans_ann_gemm

    cents = [
        [5.0, 0.0, 0.0, 0.0],
        [0.0, 5.0, 0.0, 0.0],
        [0.0, 0.0, 5.0, 0.0],
    ]
    for n_probe in (1, 3):
        join_rows = ivf_kmeans_ann(
            clustered_vectors, "vec_id", "embedding",
            top_k=3, n_probe=n_probe, centroids=cents,
        ).collect()
        gemm_rows = ivf_kmeans_ann_gemm(
            clustered_vectors, "vec_id", "embedding",
            top_k=3, n_probe=n_probe, centroids=cents,
        ).collect()
        jset = {(r.qid, r.nn_id, r.centroid) for r in join_rows}
        gset = {(r.qid, r.nn_id, r.centroid) for r in gemm_rows}
        assert gset == jset and len(jset) > 0
    # full probe == brute-force per-query top-k (same exactness
    # contract as the MLlib path's full-probe test above)
    brute = ivf_kmeans_ann(
        clustered_vectors, "vec_id", "embedding",
        n_centroids=2, top_k=3, seed=7, n_probe=2,
    )
    full = ivf_kmeans_ann(
        clustered_vectors, "vec_id", "embedding",
        top_k=3, n_probe=3, centroids=cents,
    )
    assert {(r.qid, r.nn_id) for r in full.collect()} == {
        (r.qid, r.nn_id) for r in brute.collect()
    }


def test_ivf_branch_grouped_multiprobe_matches_join_form(spark):
    """r9: with a REAL multi-branch hierarchy and n_probe>1 the GEMM
    form takes the branch-grouped path (query ships once to its coarse
    branch, per-query top-k finished in-task, no merge shuffle) and
    must return exactly the join form's rows — same (qid, nn_id,
    centroid) set, same 6dp cosines — across n_probe 2 and full."""
    import random as _random

    from bigsdb_spark.operators.similarity import ivf_kmeans_ann_gemm

    rng = _random.Random(7)
    centers = [
        [9.0, 0.0, 0.0, 0.0], [7.0, 4.0, 0.0, 0.0],
        [0.0, 9.0, 0.0, 0.0], [0.0, 7.0, 4.0, 0.0],
    ]
    rows = []
    vid = 0
    for c in centers:
        for _ in range(30):
            rows.append((vid, [x + rng.gauss(0, 0.5) for x in c]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # 2 coarse branches x 2 fine cells each
    h = {
        "coarse": [[8.0, 2.0, 0.0, 0.0], [0.0, 8.0, 2.0, 0.0]],
        "fine": [centers[:2], centers[2:]],
    }
    for n_probe in (2, 4):
        join_rows = ivf_kmeans_ann(
            emb, "vec_id", "embedding", top_k=4, n_probe=n_probe,
            hierarchy=h,
        ).collect()
        gemm_rows = ivf_kmeans_ann_gemm(
            emb, "vec_id", "embedding", top_k=4, n_probe=n_probe,
            hierarchy=h,
        ).collect()
        jset = {(r.qid, r.nn_id, r.centroid) for r in join_rows}
        gset = {(r.qid, r.nn_id, r.centroid) for r in gemm_rows}
        assert gset == jset and len(jset) > 0
        jcos = {(r.qid, r.nn_id): r.cosine for r in join_rows}
        assert all(
            abs(r.cosine - jcos[(r.qid, r.nn_id)]) <= 1e-6
            for r in gemm_rows
        )


def test_ivf_hierarchy_degenerates_to_flat(spark, clustered_vectors):
    """r7: a 1-coarse-branch hierarchy must reproduce the flat injected
    codebook exactly (same cells, same probes, same result) on both
    scorer forms, and centroids+hierarchy together is an error."""
    import pytest as _pytest

    from bigsdb_spark.operators.similarity import ivf_kmeans_ann_gemm

    cents = [
        [5.0, 0.0, 0.0, 0.0],
        [0.0, 5.0, 0.0, 0.0],
        [0.0, 0.0, 5.0, 0.0],
    ]
    h = {"coarse": [[0.0] * 4], "fine": [cents]}
    for fn in (ivf_kmeans_ann, ivf_kmeans_ann_gemm):
        flat = fn(
            clustered_vectors, "vec_id", "embedding",
            top_k=3, n_probe=2, centroids=cents,
        ).collect()
        hier = fn(
            clustered_vectors, "vec_id", "embedding",
            top_k=3, n_probe=2, hierarchy=h,
        ).collect()
        assert sorted(map(tuple, flat)) == sorted(map(tuple, hier))
        assert len(flat) > 0
    with _pytest.raises(ValueError, match="not both"):
        ivf_kmeans_ann(
            clustered_vectors, "vec_id", "embedding",
            centroids=cents, hierarchy=h,
        )


def test_ivf_branch_occupancy_guard(spark):
    """r10 (VERDICT r9 task 4): the branch-grouped path materializes a
    whole coarse branch (~n/n_coarse rows) in one Python task, so the
    opt-in ``max_branch_rows`` contract must fail FAST on a planted
    giant branch with the knob named in the error — and stay silent
    (identical output) when the bound is respected."""
    import random as _random

    import pytest as _pytest

    from bigsdb_spark.operators.similarity import ivf_kmeans_ann_gemm

    rng = _random.Random(11)
    centers = [
        [9.0, 0.0, 0.0, 0.0], [7.0, 4.0, 0.0, 0.0],
        [0.0, 9.0, 0.0, 0.0], [0.0, 7.0, 4.0, 0.0],
    ]
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        # branch 0 (fine cells 0/1) planted GIANT: 80 rows vs 10
        for _ in range(80 if ci < 2 else 10):
            rows.append((vid, [x + rng.gauss(0, 0.5) for x in c]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    h = {
        "coarse": [[8.0, 2.0, 0.0, 0.0], [0.0, 8.0, 2.0, 0.0]],
        "fine": [centers[:2], centers[2:]],
    }
    # giant branch holds 160 union rows (queries+corpus) > 100 -> raise
    with _pytest.raises(Exception, match="max_branch_rows"):
        ivf_kmeans_ann_gemm(
            emb, "vec_id", "embedding", top_k=3, n_probe=2,
            hierarchy=h, max_branch_rows=100,
        ).collect()
    # generous bound: output identical to the unguarded path
    guarded = ivf_kmeans_ann_gemm(
        emb, "vec_id", "embedding", top_k=3, n_probe=2,
        hierarchy=h, max_branch_rows=100_000,
    ).collect()
    free = ivf_kmeans_ann_gemm(
        emb, "vec_id", "embedding", top_k=3, n_probe=2, hierarchy=h,
    ).collect()
    assert sorted(map(tuple, guarded)) == sorted(map(tuple, free))
    assert len(free) > 0
