"""Decompose ivf_topk_gemm's wall clock into its pipeline stages
(VERDICT r7 task 1: the 1.6e7 tier stepped 5.0x per 4x data against the
3.8x claimed one tier down — which term grows?).

Candidate terms, measured cumulatively so differences attribute cleanly
(every stage recomputes its prefix; variance across runs is small
relative to the deltas of interest):

  t_assign   scan + hierarchical codebook assignment only
             (_ivf_probe_sides corpus side -> noop sink).  Theory:
             O(n * sqrt(k) * d) with k = n/256, i.e. ~n^1.5 — the only
             SUPERLINEAR term in the pipeline by design.
  t_cells    + the one groupBy(centroid) exchange and the per-cell
             Arrow materialization (trivial applyInPandas that counts
             each cell's rows — full Arrow round trip, no GEMM).
  t_cand     + the per-cell GEMM scoring (the candidate superset,
             pre-final-window: _ivf_gemm_candidates -> noop).
  t_full     the complete operator incl. the global top-k window,
             parquet-written exactly like the scale_bench ladder entry
             (so the number is comparable to BASELINE.md's column).

Per stage the probe also records the DELTA in total shuffle read/write
bytes from Spark's AppStatusStore (the r6 shuffle_probe methodology) —
if the exchange term dominated, those bytes would grow with it.

Usage (reuses the scale_bench embedding tiers; generates if absent):

    python tools/ivf_gemm_probe.py --tiers 4000000,16000000 \
        [--skip-full-at 16000000] [--out /tmp/scale_bench]

Prints one JSON line per (stage, tier) and a summary decomposition.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bigsdb_spark.session import get_spark  # noqa: E402
from scale_bench import _gen_embeddings  # noqa: E402
from shuffle_probe import _shuffle_totals  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="4000000,16000000")
    ap.add_argument("--out", default="/tmp/scale_bench")
    ap.add_argument(
        "--skip-full-at", default="16000000",
        help="comma list of tiers whose t_full is NOT rerun (use the "
        "recorded scale_bench ladder number instead; saves ~40 min)",
    )
    ap.add_argument(
        "--stages", default="assign,cells,cand,full",
        help="comma subset of stages to time (warm-up always runs)",
    )
    args = ap.parse_args()
    tiers = [int(x) for x in args.tiers.split(",") if x]
    skip_full = {int(x) for x in args.skip_full_at.split(",") if x}
    stages = set(args.stages.split(","))

    from bigsdb_spark.operators.dedup import train_hierarchical_cells
    from bigsdb_spark.operators.similarity import (
        _ivf_gemm_candidates,
        _ivf_probe_sides,
        ivf_kmeans_ann_gemm,
    )

    spark = get_spark("ivf_gemm_probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[str, float]] = {}

    def timed_stage(tag: str, n: int, fn) -> float:
        w0, r0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        fn()
        sec = time.perf_counter() - t0
        w1, r1 = _shuffle_totals(spark)
        rec = {
            "sec": round(sec, 1),
            "shuffle_write": w1 - w0,
            "shuffle_read": r1 - r0,
        }
        results.setdefault(str(n), {})[tag] = rec
        print(json.dumps({"stage": tag, "n": n, **rec}), flush=True)
        return sec

    for n in tiers:
        path = f"{args.out}/embeddings_{n}"
        _gen_embeddings(spark, n, path)
        emb = spark.read.parquet(path)
        k = max(64, n // 256)
        t0 = time.perf_counter()
        # sample ∝ k (r9 fix — the probe lagged the ladder protocol):
        # a fixed 131072 sample at k=62500 leaves ~2 training points
        # per cell, the occupancy-skew pathology the r8 round isolated
        # (sum(occ^2) 10.6x uniform); stage timings on that codebook
        # attribute to the SKEW, not the pipeline (a fixed-sample rerun
        # measured cand=735 s at 1.6e7 where the honest codebook's
        # full ladder entry runs 85.9 s end to end)
        h = train_hierarchical_cells(
            emb, "embedding", n_cells=k, sample=max(131072, 16 * k),
            iters=10,
        )
        print(
            json.dumps(
                {"stage": "train", "n": n, "k": k,
                 "sec": round(time.perf_counter() - t0, 1)}
            ),
            flush=True,
        )

        def sides():
            return _ivf_probe_sides(
                emb, "vec_id", "embedding", 16, 42, 1, None, h,
                repartition_queries=False,
            )

        # Warm up before timing anything: the identical assign stage
        # measured 121 -> 50 -> 8 s across three back-to-back runs at
        # 1e6 (page cache of the freshly-generated parquet + Python
        # worker spin-up + first-use JIT paths).  One discarded pass
        # puts every timed stage in the steady state, so cumulative
        # differences attribute to real work, not warm-up order.
        timed_stage("warmup_assign", n, lambda: _noop(sides()[1]))

        # t_assign: corpus-side assignment only (no exchange)
        if "assign" in stages:
            timed_stage("assign", n, lambda: _noop(sides()[1]))

        # t_cells: + the cell exchange and Arrow group materialization
        def cells():
            a, b = sides()
            union = a.select(
                F.lit(True).alias("is_q"), F.col("qid").alias("id"),
                F.col("e1").alias("e"), "centroid",
            ).unionByName(
                b.select(
                    F.lit(False).alias("is_q"), F.col("nn_id").alias("id"),
                    F.col("e2").alias("e"), "centroid",
                )
            )

            # r10: the serving operator is Arrow-native now
            # (applyInArrow + flat-buffer extraction), so the probe's
            # exchange+materialization stage must measure the SAME
            # boundary — a trivial applyInArrow count, not pandas
            import pyarrow as pa

            def count_cell(tbl):
                isq = tbl.column("is_q").to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "centroid": pa.array(
                            [tbl.column("centroid")[0].as_py()],
                            type=pa.int32(),
                        ),
                        "n_q": pa.array([int(isq.sum())], type=pa.int64()),
                        "n_c": pa.array(
                            [int(len(isq) - isq.sum())], type=pa.int64()
                        ),
                    }
                )

            # resolved type objects, not stringified def-site hints
            # (module has `from __future__ import annotations`)
            count_cell.__annotations__ = {"tbl": pa.Table, "return": pa.Table}

            _noop(
                union.groupBy("centroid").applyInArrow(
                    count_cell, schema="centroid int, n_q long, n_c long"
                )
            )

        if "cells" in stages:
            timed_stage("cells", n, cells)

        # t_cand: + the per-cell GEMM scoring (pre-window)
        def cand():
            a, b = sides()
            _noop(_ivf_gemm_candidates(a, b, 10))

        if "cand" in stages:
            timed_stage("cand", n, cand)

        # t_full: the ladder entry's exact shape (window + parquet)
        if n not in skip_full and "full" in stages:
            timed_stage(
                "full", n,
                lambda: ivf_kmeans_ann_gemm(
                    emb, "vec_id", "embedding", top_k=10, n_probe=1,
                    hierarchy=h,
                )
                .select("qid", "nn_id", "cosine")
                .write.mode("overwrite")
                .parquet(f"{args.out}/ivf_topk_gemm_probe_{n}"),
            )

    print(json.dumps({"ivf_gemm_probe": results}), flush=True)


if __name__ == "__main__":
    main()
