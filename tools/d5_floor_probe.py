"""Decompose the D5 per-batch floor: where do the ~4-10 s/batch go?

Builds the 25k ladder profile frame, fast-forwards the assigner state
to a mid-run point (coded = first half, batch = next 1024), and times
each per-batch component separately, twice (cold plan / warm plan):

  t_plan_filter   construct+optimize the batch-fetch filter frame
  t_collect       execute the batch fetch (collect 1024 rows)
  t_plan_scan     construct the mapInPandas scan frame
  t_scan          execute nearest_coded's distributed scan
  t_inbatch       the driver-side in-batch sequential numpy pass

Usage: python tools/d5_floor_probe.py [n_rows coded_frac]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bigsdb_spark.operators import lincodes as lc  # noqa: E402
from bigsdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark("d5_floor_probe")
    spark.sparkContext.setLogLevel("ERROR")
    path = f"/tmp/scale_bench/profiles_{n}"
    profiles = spark.read.parquet(path)
    prof = profiles.select("profile_key", "profile").cache()
    total = prof.count()
    keys = sorted(r[0] for r in prof.select("profile_key").collect())
    lo_i = int(total * frac)
    batch_ids = keys[lo_i : lo_i + 1024]
    print(f"n={total} coded={lo_i} batch={len(batch_ids)}", flush=True)

    for rep in ("cold", "warm"):
        t0 = time.time()
        fetch = prof.filter(
            (F.col("profile_key") >= F.lit(batch_ids[0]))
            & (F.col("profile_key") <= F.lit(batch_ids[-1]))
        )
        fetch._jdf.queryExecution().executedPlan()  # force planning
        t1 = time.time()
        batch_rows = {r[0]: r[1] for r in fetch.collect()}
        t2 = time.time()
        coded_src = prof.filter(F.col("profile_key") < F.lit(batch_ids[0]))
        coded_src._jdf.queryExecution().executedPlan()
        t3 = time.time()
        rows = lc.nearest_coded(batch_rows, coded_src, locus_count=32)
        t4 = time.time()
        # in-batch pass (isolated re-run of the numpy section)
        width = 32
        vocab: dict = {}
        bmat = np.full((len(batch_ids), width), -1, dtype=np.int32)
        blen = np.zeros(len(batch_ids), dtype=np.int64)
        k = 0
        for key in batch_ids:
            cur = batch_rows[key]
            arr = np.full(width, -1, dtype=np.int32)
            for i, a in enumerate(cur):
                if a is not None and a not in lc.MISSING:
                    arr[i] = vocab.setdefault(a, len(vocab))
            amiss = arr == -1
            if k:
                sub, sublen = bmat[:k], blen[:k]
                miss = (sub == -1) | amiss
                d = ((sub != arr) & ~miss).sum(axis=1)
                mie = miss.sum(axis=1) - (width - np.maximum(sublen, len(cur)))
                d.argmin()
                del mie
            bmat[k], blen[k] = arr, len(cur)
            k += 1
        t5 = time.time()
        print(
            f"{rep}: plan_filter={t1-t0:.2f} collect={t2-t1:.2f} "
            f"plan_scan={t3-t2:.2f} scan={t4-t3:.2f} inbatch={t5-t4:.2f} "
            f"({len(rows)} scan rows)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
