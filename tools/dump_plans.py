"""Dump .explain('formatted') for declared queries / bench entries to
plans/<tag>/<name>_<suffix>.txt (the optimization-round evidence files).

Usage: python tools/dump_plans.py --tag r12 --suffix after [name ...]
       (no names = every registry query + bench EXTRA entry)

Plan construction only — no jobs are executed (auto-knob probes inside
a query builder may still run their one small aggregate).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from bigsdb_spark.inventory import QUERIES
    from bigsdb_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    names = args.names or sorted(set(QUERIES) | set(bench.EXTRA))
    for name in names:
        fn = QUERIES.get(name) or bench.EXTRA.get(name)
        if fn is None:
            print(f"skip {name}: unknown", file=sys.stderr)
            continue
        try:
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record the failure
            plan = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
