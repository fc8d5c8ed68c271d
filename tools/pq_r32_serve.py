"""Data-regime serving wall for the named IVF-PQ memory-tier config
(m=32/k=256 residual + 10x exact refine, n_probe=2 — recall@10 0.938
at 1e6, BASELINE.md r10; bench entry sim_ivf_pq_r32_refine is its
sf0.1 plan floor).  Same serve-from-a-saved-index framing as
scale_bench's ivf_pq path: train offline (timed separately), persist
the encoded index (keep_vec layout — refine needs the raw vectors of
the probed slice), then time the ADC+refine top-k serve.

Usage: python tools/pq_r32_serve.py [--tiers 1000000,4000000]
       [--out /tmp/scale_bench]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigsdb_spark.operators.pq import (  # noqa: E402
    ivf_pq_encode,
    ivf_pq_topk,
    train_ivf_pq,
)
from bigsdb_spark.session import get_spark  # noqa: E402
from tools.scale_bench import _gen_embeddings  # noqa: E402

QUERY = [((h * 37 + 11) % 2001 - 1000) / 1000.0 for h in range(64)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="1000000,4000000")
    ap.add_argument("--out", default="/tmp/scale_bench")
    args = ap.parse_args()

    spark = get_spark("pq_r32_serve")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    model = None
    for n in (int(t) for t in args.tiers.split(",")):
        p = f"{args.out}/emb_{n}"
        _gen_embeddings(spark, n, p)
        emb = spark.read.parquet(p)
        row: dict = {"n": n}
        if model is None:
            t0 = time.time()
            model = train_ivf_pq(
                emb, n_cells=256, m=32, k=256, sample=8192, residual=True
            )
            row["t_train_offline"] = round(time.time() - t0, 1)
        codes_path = f"{args.out}/codes_r32_{n}"
        if not os.path.exists(os.path.join(codes_path, "_SUCCESS")):
            t0 = time.time()
            ivf_pq_encode(emb, model, keep_vec=True).write.mode(
                "overwrite"
            ).parquet(codes_path)
            row["t_encode"] = round(time.time() - t0, 1)
        codes = spark.read.parquet(codes_path)
        runs = []
        for _ in range(3):
            t0 = time.time()
            got = ivf_pq_topk(
                codes, model, QUERY, top_k=10, n_probe=2, refine_factor=10
            ).collect()
            runs.append(round(time.time() - t0, 2))
        row["t_serve_runs"] = runs
        row["t_serve"] = min(runs)
        row["rows"] = len(got)
        results[n] = row
        print(json.dumps(row), flush=True)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
