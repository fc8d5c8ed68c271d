"""Decompose nearest_coded's per-batch scan: job floor vs Arrow
conversion (strings vs ints) vs kernel, at a given coded size.

Usage: python /tmp/probe_d5_scan.py [n_rows coded_frac reps]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bigsdb_spark.operators import lincodes as lc  # noqa: E402
from bigsdb_spark.session import get_spark  # noqa: E402


def timeit(label, fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{label}: {' '.join(f'{t:.2f}' for t in ts)}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("probe_d5_scan")
    spark.sparkContext.setLogLevel("ERROR")
    prof = (
        spark.read.parquet(f"/tmp/scale_bench/profiles_{n}")
        .select("profile_key", "profile")
        .cache()
    )
    total = prof.count()
    keys = sorted(r[0] for r in prof.select("profile_key").collect())
    lo_i = int(total * frac)
    batch_ids = keys[lo_i : lo_i + 1024]
    batch_rows = {
        r[0]: r[1]
        for r in prof.filter(
            (F.col("profile_key") >= F.lit(batch_ids[0]))
            & (F.col("profile_key") <= F.lit(batch_ids[-1]))
        ).collect()
    }
    coded_src = prof.filter(F.col("profile_key") < F.lit(batch_ids[0]))
    nparts = coded_src.rdd.getNumPartitions()
    print(f"n={total} coded={lo_i} parts={nparts}", flush=True)

    # (a) empty job floor: mapInPandas that never touches the input
    def noop(it):
        for _ in it:
            pass
        return iter(())

    timeit(
        "noop_consume(strings)",
        lambda: coded_src.mapInPandas(noop, schema="qi int").collect(),
        reps,
    )

    # (b) same but only profile_key column (no string arrays through Arrow)
    timeit(
        "noop_consume(key only)",
        lambda: coded_src.select("profile_key")
        .mapInPandas(noop, schema="qi int")
        .collect(),
        reps,
    )

    # (c) int-encoded frame: profile -> array<int> codes via global dict
    alleles = (
        prof.select(F.explode("profile").alias("a"))
        .filter(F.col("a").isNotNull() & ~F.col("a").isin(*lc.MISSING))
        .distinct()
    )
    dim = alleles.withColumn(
        "code", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("a")
        ) - 1
    )
    t0 = time.time()
    amap = {r["a"]: r["code"] for r in dim.collect()}
    print(f"dict build: {time.time()-t0:.2f} ({len(amap)} alleles)", flush=True)
    bmap = spark.sparkContext.broadcast(amap)

    def enc(it):
        import pandas as pd

        for pdf in it:
            m = bmap.value
            yield pd.DataFrame(
                {
                    "profile_key": pdf["profile_key"],
                    "codes": [
                        np.array(
                            [
                                -1
                                if (a is None or a in lc.MISSING)
                                else m[a]
                                for a in p
                            ],
                            dtype=np.int32,
                        )
                        for p in pdf["profile"]
                    ],
                    "plen": [len(p) for p in pdf["profile"]],
                }
            )

    enc_frame = prof.mapInPandas(
        enc, schema="profile_key string, codes array<int>, plen int"
    ).cache()
    t0 = time.time()
    enc_frame.count()
    print(f"encode+cache: {time.time()-t0:.2f}", flush=True)
    coded_int = enc_frame.filter(F.col("profile_key") < F.lit(batch_ids[0]))
    timeit(
        "noop_consume(int codes)",
        lambda: coded_int.mapInPandas(noop, schema="qi int").collect(),
        reps,
    )

    # (d) the real scan (current implementation, strings)
    timeit(
        "full_scan(strings)",
        lambda: lc.nearest_coded(batch_rows, coded_src, locus_count=32),
        reps,
    )
    # (e) conversion-only: consume + materialize the arrays to numpy
    def touch(it):
        import pandas as pd

        k = 0
        for pdf in it:
            for p in pdf["profile"]:
                k += len(p)
        yield pd.DataFrame({"qi": [k]})

    timeit(
        "touch_arrays(strings)",
        lambda: coded_src.mapInPandas(touch, schema="qi int").collect(),
        reps,
    )
    spark.stop()


if __name__ == "__main__":
    main()
