"""cgMLST A5 pruned-path memory attribution (VERDICT r10 #6).

The r10 cg_1e6 ladder run needed SPARK_DRIVER_MEMORY=48g (in
local[32] the "driver" heap IS the whole JVM — all 32 executor
threads' task memory lives in it).  This tool runs ONE a5_scale tier
with a background heap sampler (used-heap polled every 250 ms,
tagged with the active stages from the status tracker) and reports
the peak and the stage mix at the peak, so the 48g requirement gets
an attribution instead of a guess.

Usage:
  SPARK_DRIVER_MEMORY=24g python tools/a5_mem_probe.py \
      --tier cg_1e6:1000000:1000:10000:500:3 [--out /tmp/a5_scale]
Prints one JSON line: {tier, heap_max_gb, peak_used_gb, peak_stages,
t_pruned, rows} (plus a per-100ms high-water table on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigsdb_spark.operators.profiles import assign_scheme_fields  # noqa: E402
from bigsdb_spark.session import get_spark  # noqa: E402
from tools.a5_scale import _gen_defs, _gen_isolates  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="cg_1e6:1000000:1000:10000:500:3")
    ap.add_argument("--out", default="/tmp/a5_scale")
    args = ap.parse_args()
    name, n, loci, p, vocab, k_sel = args.tier.split(":")
    n, loci, p, vocab, k_sel = int(n), int(loci), int(p), int(vocab), int(k_sel)

    spark = get_spark("a5_mem_probe")
    spark.sparkContext.setLogLevel("ERROR")
    defs_path = os.path.join(args.out, f"defs_{loci}_{p}_{vocab}")
    iso_path = os.path.join(args.out, f"iso_{name}")
    _gen_defs(spark, p, loci, vocab, defs_path)
    _gen_isolates(spark, n, p, loci, vocab, defs_path, iso_path)

    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    tracker = spark.sparkContext.statusTracker()
    peak = {"used": 0, "stages": []}
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            used = rt.totalMemory() - rt.freeMemory()
            if used > peak["used"]:
                sids = tracker.getActiveStageIds()
                names = []
                for sid in sids:
                    info = tracker.getStageInfo(sid)
                    if info:
                        names.append(f"{sid}:{info.name.split(chr(10))[0][:60]}")
                peak["used"] = used
                peak["stages"] = names
                print(
                    f"  peak {used/2**30:.1f} GiB @ {names}",
                    file=sys.stderr, flush=True,
                )
            time.sleep(0.25)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.time()
    out = assign_scheme_fields(
        spark.read.parquet(iso_path),
        spark.read.parquet(defs_path),
        allow_missing_loci=True, total_loci=loci,
        prune_candidates=True, prune_positions=k_sel,
    )
    out_path = os.path.join(args.out, f"out_memprobe_{name}")
    out.write.mode("overwrite").parquet(out_path)
    t = round(time.time() - t0, 1)
    stop.set()
    th.join(timeout=2)
    print(
        json.dumps(
            {
                "tier": name,
                "heap_max_gb": round(rt.maxMemory() / 2**30, 1),
                "peak_used_gb": round(peak["used"] / 2**30, 1),
                "peak_stages": peak["stages"],
                "t_pruned": t,
                "rows": spark.read.parquet(out_path).count(),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
