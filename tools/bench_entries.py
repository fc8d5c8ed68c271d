"""Time a subset of bench entries with bench.py's exact protocol
(warm-up rep, best-of-n count(), reset between reps) — for same-session
A/B probes during optimization rounds.

Usage: python tools/bench_entries.py <entry>...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTRA
from bigsdb_spark.inventory import QUERIES
from bigsdb_spark.inventory.typing import _pairs_memo
from bigsdb_spark.session import get_spark


def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_entries")
    spark.sparkContext.setLogLevel("ERROR")
    print("loadavg", [round(x, 2) for x in os.getloadavg()])
    QUERIES["s1_view_scan"](spark, sf_dir).count()
    spark.range(1000).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    def reset():
        spark.catalog.clearCache()
        _pairs_memo.clear()
        spark.sparkContext._jvm.System.gc()

    for name in names:
        fn = QUERIES.get(name) or EXTRA[name]
        fn(spark, sf_dir).count()
        reset()
        runs = []
        while len(runs) < 3 or (min(runs) < 3.0 and len(runs) < 5):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
            reset()
        print(
            f"  {name}: {round(min(runs), 3)}s ({n} rows, "
            f"spread {max(runs)/min(runs):.2f}x)"
        )
    print("loadavg_end", [round(x, 2) for x in os.getloadavg()])
    spark.stop()


if __name__ == "__main__":
    main()
