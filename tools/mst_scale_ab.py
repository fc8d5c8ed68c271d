"""Same-session A/B of the Borůvka MST merge rewrite (r12 session 5)
at a data-dominated graph size.

Builds a deterministic random graph (xxhash64-derived endpoints and
weights — no Python RNG, fully lazy) and alternates the pre-rewrite
form (pass a path to the old mst.py, e.g. `git show <sha>:...` into a
temp file) with the current operator, twice each, asserting identical
MST edge sets via row count + an order-independent checksum.

Usage:
    python tools/mst_scale_ab.py [old_mst_py_path] [V] [E]

With no old-module path it just measures the current form.
"""
import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigsdb_spark.operators.mst import boruvka_mst as mst_new
from bigsdb_spark.session import get_spark


def main():
    old_path = sys.argv[1] if len(sys.argv) > 1 else None
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    E = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
    spark = get_spark("mst_scale_ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    forms = [("new", mst_new)]
    if old_path:
        spec = importlib.util.spec_from_file_location("mst_old", old_path)
        mst_old = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mst_old)
        forms.insert(0, ("old", mst_old.boruvka_mst))

    def build():
        g = spark.range(E).select(
            (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % V).alias("u"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % V).alias("v"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(3))) % 100_000).alias("w"),
        )
        return g, spark.range(V).select(F.col("id"))

    # session warm-up (verify-skill protocol: never attribute a cold run)
    spark.range(1000).repartition(32).mapInPandas(lambda it: it, "id long").count()
    st = sc.statusTracker()
    seen = set()
    for i, (label, fn) in enumerate(forms * 2):
        edges, nodes = build()
        grp = f"mst_ab_{label}_{i}"
        sc.setJobGroup(grp, "mst scale ab")
        t0 = time.time()
        out = fn(edges, nodes)
        n = out.count()
        # order-independent checksum; mod keeps the ANSI sum in range
        chk = out.agg(
            F.sum(F.xxhash64("u", "v", "w") % 1_000_003).alias("h")
        ).collect()[0]["h"]
        dt = time.time() - t0
        jobs = len(st.getJobIdsForGroup(grp) or [])
        sc.setJobGroup(None, None)
        print(f"{label}: {dt:.1f}s rows={n} checksum={chk} jobs={jobs}", flush=True)
        seen.add((n, chk))
    assert len(seen) == 1, f"edge sets differ: {seen}"
    print("edge sets identical across all runs")


if __name__ == "__main__":
    main()
