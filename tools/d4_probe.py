"""Decompose single_linkage's top-tier growth step (VERDICT r8 #4).

The r6 ladder measured the giant-component label propagation at
36.6 / 51.0 / 237.3 s for 1e6/4e6/1.6e7 nodes (2n edges) — 4.7x per 4x
at the top step against 1.4x one step down.  Two candidate mechanisms:

  (a) ROUND COUNT — pointer-halving converges in ~log(diameter)
      rounds; a random 2n-edge graph's diameter grows ~log n, so a few
      extra rounds per tier are inherent.
  (b) PER-ROUND COST AT THE PARTITION FLOOR — each round is an
      edge-label join + groupBy + checkpoint on a fixed partition
      count; if the knob is too low for the tier, per-round wall grows
      superlinearly (spill / task-size effects), which is fixable.

This probe separates them: per-round wall clock and changed-label
count (the round_stats hook on the operator) at each tier, at the
session's SPARK_GRAFT_INITIAL_PARTITIONS knob.  Run it twice for the
knob A/B the r6 rows never got (fresh process per arm — the knob is a
session config):

    SPARK_GRAFT_INITIAL_PARTITIONS=32  python tools/d4_probe.py --tiers 4000000,16000000
    SPARK_GRAFT_INITIAL_PARTITIONS=256 python tools/d4_probe.py --tiers 4000000,16000000

Warm-up protocol per BASELINE.md: each tier runs once untimed-first?
No — a full extra run doubles the probe cost; instead the FIRST tier
listed is also run twice and both totals printed, so the cold/warm
spread is visible (pass the smallest tier first).

Prints one JSON line per (tier, round) and a per-tier summary.
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

import pyspark.sql.functions as F  # noqa: E402

from bigsdb_spark.session import get_spark  # noqa: E402
from scale_bench import _gen_edges  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="4000000,16000000")
    ap.add_argument("--out", default="/tmp/scale_bench")
    args = ap.parse_args()
    tiers = [int(x) for x in args.tiers.split(",") if x]

    from bigsdb_spark.operators.clustering import single_linkage

    spark = get_spark("d4_probe")
    spark.sparkContext.setLogLevel("ERROR")
    knob = os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS", "(default)")

    for i, n in enumerate(tiers):
        p = f"{args.out}/edges_{n}"
        _gen_edges(spark, n, p)
        edges = spark.read.parquet(p)
        nodes = spark.range(n).select(F.col("id"))
        runs = 2 if i == 0 else 1  # first tier doubles as warm-up
        for r in range(runs):
            stats: list = []
            t0 = time.perf_counter()
            cnt = (
                single_linkage(edges, nodes, round_stats=stats)
                .select(F.countDistinct("group_id"))
                .collect()[0][0]
            )
            total = time.perf_counter() - t0
            for s in stats:
                print(json.dumps({"n": n, "knob": knob, **s}), flush=True)
            print(
                json.dumps(
                    {
                        "n": n,
                        "knob": knob,
                        "run": r,
                        "warmup": i == 0 and r == 0,
                        "total_sec": round(total, 1),
                        "rounds": len(stats),
                        "components": cnt,
                        "round_sec_max": max(s["sec"] for s in stats),
                        "round_sec_sum": round(
                            sum(s["sec"] for s in stats), 1
                        ),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
