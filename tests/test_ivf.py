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


def test_numpy_topk_equals_expression(spark, clustered_vectors):
    """The BLAS fast path must return exactly the expression fold's
    result (same rounding, same tiebreaks)."""
    from bigsdb_spark.operators.similarity import cosine_topk_pairs_np

    expr = cosine_topk_pairs(clustered_vectors, "vec_id", "embedding", k=10).collect()
    fast = cosine_topk_pairs_np(clustered_vectors, "vec_id", "embedding", k=10).collect()
    assert [(r.id1, r.id2, r.cosine) for r in expr] == [
        (r.id1, r.id2, r.cosine) for r in fast
    ]


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
