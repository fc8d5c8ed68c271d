"""Measure SHUFFLE BYTES for the plain vs int8-screened ANN pair join.

The int8 screen's 100 TB claim (operators/similarity.py:
bucketed_ann_pairs_sq) is that the quadratic within-bucket pair
expansion moves ~8x fewer bytes through the shuffle — 1-byte codes
instead of 8-byte doubles — with identical output. Wall time on
local[32] can't show that (shuffle there is memory-bus speed and the
extra encode+rejoin dominates); the byte counters can. This probe runs
both plans on the same cached embedding tier and reports, per variant,
wall seconds plus the DELTA in total shuffle read/write bytes taken
from Spark's AppStatusStore (works with spark.ui.enabled=false; same
counters the UI's stage page shows).

Usage (uses the scale_bench data cache; generates the tier if absent):

    python tools/shuffle_probe.py --n 4000000 --out /tmp/scale_bench

Prints one JSON line:
    {"shuffle_probe": {"n": ..., "dims": ...,
     "plain": {"sec": ..., "shuffle_write": ..., "shuffle_read": ..., "pairs": ...},
     "sq":    {... same keys ...},
     "write_ratio": plain/sq, "read_ratio": plain/sq}}
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))  # repo root: bigsdb_spark
sys.path.insert(0, _TOOLS)  # sibling scale_bench (data-tier generator)

from pyspark.sql import functions as F  # noqa: E402

from bigsdb_spark.session import get_spark  # noqa: E402


def _shuffle_totals(spark) -> tuple[int, int]:
    """Sum (write, read) shuffle bytes over every stage the app has run.

    AppStatusStore.stageList is the stable-in-practice internal behind
    the /api/v1/stages REST route; py4j accessors mirror the v1
    StageData fields.  Spark 4.1's signature is
    stageList(statuses, details, withSummaries, quantiles, taskStatus)
    — py4j can't fill Scala defaults, so pass them all explicitly
    (empty statuses list = all stages).
    """
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(),  # statuses: empty = no filter
        False,  # details
        False,  # withSummaries
        sc._gateway.new_array(jvm.double, 0),  # quantiles
        jvm.java.util.ArrayList(),  # taskStatus
    )
    w = r = 0
    for i in range(stages.size()):
        s = stages.apply(i)
        w += s.shuffleWriteBytes()
        r += s.shuffleReadBytes()
    return w, r


def _stage_rows(spark) -> dict[int, tuple[str, int, int]]:
    """{stageId: (name, write, read)} for every stage the app has run —
    lets the probe attribute the byte totals to specific exchanges."""
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        sc._gateway.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    out: dict[int, tuple[str, int, int]] = {}
    for i in range(stages.size()):
        s = stages.apply(i)
        out[s.stageId()] = (
            s.name(),
            s.shuffleWriteBytes(),
            s.shuffleReadBytes(),
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--out", default="/tmp/scale_bench")
    args = ap.parse_args()

    from bigsdb_spark.operators.similarity import (
        bucketed_ann_pairs,
        bucketed_ann_pairs_sq,
    )

    spark = get_spark("shuffle_probe")
    spark.sparkContext.setLogLevel("ERROR")

    p = f"{args.out}/emb_{args.n}"
    if not os.path.exists(os.path.join(p, "_SUCCESS")):
        from scale_bench import _gen_embeddings  # same synthetic tier

        _gen_embeddings(spark, args.n, p)
    emb = spark.read.parquet(p)

    # match the scale ladder's parameters exactly
    dims = max(3, int(math.log2(max(args.n, 64) / 64)))

    # warm the scan cache once so neither variant pays first-read skew
    emb.select(F.count("vec_id")).collect()

    results: dict[str, dict] = {}
    for name, fn in (("plain", bucketed_ann_pairs), ("sq", bucketed_ann_pairs_sq)):
        before = _stage_rows(spark)
        t0 = time.monotonic()
        pairs = (
            fn(emb, "vec_id", "embedding", dims=dims, min_cosine=0.5)
            .select("id1", "id2")
            .count()
        )
        sec = round(time.monotonic() - t0, 2)
        after = _stage_rows(spark)
        new_stages = sorted(
            (
                (sid, *vals)
                for sid, vals in after.items()
                if sid not in before and (vals[1] or vals[2])
            ),
            key=lambda t: -(t[2] + t[3]),
        )
        w1 = sum(t[2] for t in new_stages)
        r1 = sum(t[3] for t in new_stages)
        results[name] = {
            "sec": sec,
            "shuffle_write": w1,
            "shuffle_read": r1,
            "pairs": pairs,
            "top_stages": [
                {
                    "stage": sid,
                    "name": sname.split("\n")[0][:80],
                    "write": w,
                    "read": r,
                }
                for sid, sname, w, r in new_stages[:6]
            ],
        }
        print(
            f"# {name}: {sec}s, write {w1 / 1e9:.2f} GB, "
            f"read {r1 / 1e9:.2f} GB, {pairs} pairs",
            file=sys.stderr,
            flush=True,
        )
        for sid, sname, w, r in new_stages[:6]:
            print(
                f"#   stage {sid} [{sname.split(chr(10))[0][:60]}]: "
                f"write {w / 1e9:.2f} GB, read {r / 1e9:.2f} GB",
                file=sys.stderr,
                flush=True,
            )

    def _ratio(k: str) -> float:
        den = results["sq"][k]
        return round(results["plain"][k] / den, 2) if den else float("inf")

    print(
        json.dumps(
            {
                "shuffle_probe": {
                    "n": args.n,
                    "dims": dims,
                    **results,
                    "write_ratio": _ratio("shuffle_write"),
                    "read_ratio": _ratio("shuffle_read"),
                }
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
