"""Recall@k of the IVF GEMM serving path vs exact search.

The r7 equality pins prove ivf_kmeans_ann_gemm returns EXACTLY the
join form's result, and full probe is proven == brute force — so the
only open question for a deployment is the recall/cost trade of
probing FEWER cells than all of them at production occupancy.  This
probe measures recall@k of n_probe = 1/2/4 against the full-probe
exact result with the SAME injected occupancy-~256 codebook, on a
hash-uniform corpus (the ladder's worst case: no cluster structure,
so cell boundaries cut true neighbourhoods as hard as they ever will).

Two corpora are probed: ``uniform`` (hash-uniform vectors — NO
cluster structure, the adversarial lower bound where true neighbours
are near-orthogonal and spread across cell boundaries) and
``clustered`` (a 200-center Gaussian-ish mixture via hashed offsets —
the regime IVF is built for and real embedding corpora resemble).

Usage: python tools/ivf_recall.py [n] [top_k]
Prints one JSON line per (corpus, n_probe).

Production-n mode (VERDICT r7 task 4 — the serving default's quality
claim at the same tier as its timing claim):

    python tools/ivf_recall.py 1000000 10 --hier

trains the SAME two-level codebook the ladder serves from
(train_hierarchical_cells, occupancy ~256) and measures recall@k at
n_probe 1/2/4/8 on the clustered corpus against an EXACT baseline for
1000 hash-sampled queries (driver-side chunked brute force over the
full corpus — a 256 MB float32 matrix, audit-tool territory; the
serving path itself stays fully distributed).  The hierarchy probes
fine cells within the nearest coarse branch only (IMI approximation),
so its recall ceiling includes branch-misassignment loss — that is
the serving default, measured honestly.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bigsdb_spark.session import get_spark  # noqa: E402


def _exact_sets(emb_pdf, sample_ids, top_k):
    """Driver-side exact top-k for the sampled queries: chunked GEMM
    over the full corpus with the operator's own tie rule (6dp HALF_UP
    rounding, (cosine desc, nn_id asc)) so set comparison is not tie
    noise."""
    import numpy as np

    from bigsdb_spark.operators.similarity import np_round_half_up

    ids = emb_pdf["vec_id"].to_numpy()
    x = np.array(list(emb_pdf["embedding"]), dtype=np.float32)
    nrm = np.sqrt((x.astype(np.float64) ** 2).sum(axis=1))
    pos = {int(v): i for i, v in enumerate(ids)}
    q_idx = np.array([pos[q] for q in sample_ids])
    exact = {}
    for s in range(0, len(q_idx), 128):
        qi = q_idx[s : s + 128]
        cb = np_round_half_up(
            (x[qi].astype(np.float64) @ x.T.astype(np.float64))
            / np.outer(nrm[qi], nrm)
        )
        cb[np.arange(len(qi)), qi] = -np.inf  # self
        for row, gi in enumerate(qi):
            order = np.lexsort((ids, -cb[row]))
            top = order[: top_k]
            exact[int(ids[gi])] = {int(ids[j]) for j in top}
    return exact


def _hier_mode(spark, n: int, top_k: int, occupancy: int = 256) -> None:
    from bigsdb_spark.operators.dedup import train_hierarchical_cells
    from bigsdb_spark.operators.similarity import ivf_kmeans_ann_gemm

    center = F.pmod(F.xxhash64(F.col("id"), F.lit(99)), F.lit(200))
    clustered = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: (
            (F.pmod(F.xxhash64(center, i), F.lit(2001)) - 1000) / 1000.0
            + (F.pmod(F.xxhash64(F.col("id"), i), F.lit(301)) - 150) / 1000.0
        ).cast("float"),
    )
    emb = (
        spark.range(n, numPartitions=32)
        .select(F.col("id").alias("vec_id"), clustered.alias("embedding"))
        .cache()
    )
    k = max(64, n // occupancy)
    h = train_hierarchical_cells(
        emb, "embedding", n_cells=k, sample=max(131072, 16 * k), iters=10
    )
    # exact baseline for 1000 hash-sampled queries, driver-side
    sample_ids = sorted(
        int(r.vec_id)
        for r in emb.select("vec_id").filter(
            F.pmod(F.xxhash64("vec_id", F.lit(123)), F.lit(n // 1000)) == 0
        ).collect()
    )[:1000]
    emb_pdf = emb.toPandas()
    exact = _exact_sets(emb_pdf, sample_ids, top_k)
    del emb_pdf
    for n_probe in (1, 2, 4, 8):
        got = {}
        res = ivf_kmeans_ann_gemm(
            emb, "vec_id", "embedding",
            top_k=top_k, n_probe=n_probe, hierarchy=h,
        ).filter(F.col("qid").isin(sample_ids)).collect()
        for r in res:
            got.setdefault(r.qid, set()).add(r.nn_id)
        hits = sum(len(got.get(q, set()) & exact[q]) for q in exact)
        recall = hits / (len(exact) * top_k)
        print(
            json.dumps(
                {
                    "corpus": "clustered", "mode": "two-level", "n": n,
                    "cells": k, "occupancy": round(n / k),
                    "top_k": top_k, "n_probe": n_probe,
                    "sampled_queries": len(exact),
                    "recall": round(recall, 4),
                }
            ),
            flush=True,
        )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if len(args) > 0 else 20_000
    top_k = int(args[1]) if len(args) > 1 else 10
    # r9: --occ N reruns the production-n table at a different codebook
    # occupancy (VERDICT r8 lead item: does raising occupancy so cells
    # stop splitting the ~5000-point clusters restore low-probe recall?)
    occupancy = 256
    for a in sys.argv[1:]:
        if a.startswith("--occ="):
            occupancy = int(a.split("=", 1)[1])
    if "--hier" in sys.argv:
        spark = get_spark("ivf_recall")
        spark.sparkContext.setLogLevel("ERROR")
        _hier_mode(spark, n, top_k, occupancy)
        return
    spark = get_spark("ivf_recall")
    spark.sparkContext.setLogLevel("ERROR")

    from bigsdb_spark.operators.pq import _kmeans_np, _sample_np
    from bigsdb_spark.operators.similarity import ivf_kmeans_ann_gemm

    uniform = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: (
            (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - 1000) / 1000.0
        ).cast("float"),
    )
    # 200-center mixture: center by id hash, +-0.15 hashed jitter
    center = F.pmod(F.xxhash64(F.col("id"), F.lit(99)), F.lit(200))
    clustered = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: (
            (F.pmod(F.xxhash64(center, i), F.lit(2001)) - 1000) / 1000.0
            + (F.pmod(F.xxhash64(F.col("id"), i), F.lit(301)) - 150) / 1000.0
        ).cast("float"),
    )
    corpora = {"uniform": uniform, "clustered": clustered}
    for name, vec in corpora.items():
        emb = (
            spark.range(n, numPartitions=32)
            .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
            .cache()
        )
        # FLAT codebook: the hierarchy path probes only within the
        # nearest coarse branch (IMI approximation), so "probe every
        # cell == exact" holds only for flat centroids — fine at probe
        # scale (O(n*k*d) assignment is trivial at 2e4 x 78)
        n_cells = max(16, n // 256)
        cents = _kmeans_np(
            _sample_np(emb, "embedding", min(n, 65536)), n_cells, 10, 7
        ).tolist()

        def topk_set(n_probe):
            got = ivf_kmeans_ann_gemm(
                emb, "vec_id", "embedding",
                top_k=top_k, n_probe=n_probe, centroids=cents,
            ).collect()
            return {(r.qid, r.nn_id) for r in got}

        exact = topk_set(n_cells)  # full probe == brute (pinned in tests)
        for n_probe in (1, 2, 4):
            got = topk_set(n_probe)
            recall = len(got & exact) / len(exact)
            print(
                json.dumps(
                    {
                        "corpus": name,
                        "n": n,
                        "cells": n_cells,
                        "occupancy": round(n / n_cells),
                        "top_k": top_k,
                        "n_probe": n_probe,
                        "recall": round(recall, 4),
                    }
                ),
                flush=True,
            )
        emb.unpersist()


if __name__ == "__main__":
    main()
