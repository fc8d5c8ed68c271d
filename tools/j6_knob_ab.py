"""A/B the j6_tag_join bench entry across the shuffle-partition knob
(VERDICT r7 task 7: 1.16x drift twice in three rounds on unchanged
code suggests the entry sits near a partition-count cliff).

Runs the entry best-of-N at SPARK_GRAFT_INITIAL_PARTITIONS equivalents
64 and 256 in ONE process (two sessions would double JVM startup; the
knob is an AQE initialPartitionNum, settable per-session only, so the
script restarts the session between arms).

Usage: python tools/j6_knob_ab.py [sf_dir] [repeats]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigsdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out = {}
    for knob in ("64", "256"):
        os.environ["SPARK_GRAFT_INITIAL_PARTITIONS"] = knob
        spark = get_spark(f"j6_ab_{knob}")
        spark.sparkContext.setLogLevel("ERROR")
        from bigsdb_spark.inventory import QUERIES

        QUERIES["s1_view_scan"](spark, sf_dir).count()  # warm
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            QUERIES["j6_tag_join"](spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        out[knob] = {"best": min(runs), "runs": runs}
        spark.stop()
    print(json.dumps({"j6_knob_ab": out, "sf_dir": sf_dir}), flush=True)


if __name__ == "__main__":
    main()
