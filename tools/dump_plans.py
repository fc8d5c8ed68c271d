"""Dump .explain('formatted') for declared queries into plan files.

Usage:
    python tools/dump_plans.py <repo_dir> <out_dir> <suffix> <query>...

Runs the <repo_dir> tree's inventory (so a git worktree of an older
commit produces that round's "before" plans) against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and writes
<out_dir>/<query>_<suffix>.txt.  Special pseudo-queries:

* ``d5_scan``: the per-batch distributed frame ``nearest_coded`` maps
  over inside the LIN-code assigner (the operator is
  driver-orchestrated; the declared query's final frame is the
  collected result, so the plan that matters is the scan the driver
  launches per batch).  Built exactly as ``assign_lincodes`` builds it
  for a non-first batch of the d5 gate query's profile frame: r11
  attached ``ins_idx`` via driver ``createDataFrame`` + broadcast
  join; r12 is a key-range filter on the cached frame.
"""

from __future__ import annotations

import os
import sys


def _formatted(frame) -> str:
    # exactly what DataFrame.explain("formatted") prints
    return frame._sc._jvm.PythonSQLUtils.explainString(
        frame._jdf.queryExecution(), "formatted"
    )


def _d5_scan_frame(spark, sf_dir):
    from pyspark.sql import functions as F

    from bigsdb_spark.inventory import QUERIES  # noqa: F401 (registry import)
    from bigsdb_spark.inventory.extended import tbl
    from bigsdb_spark.operators import lincodes as lc
    from bigsdb_spark.operators.profiles import build_profiles

    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % 40 == 0) & (F.col("l_orderkey") < 4000)
    )
    prof = (
        build_profiles(li, "l_orderkey", "l_linenumber", "l_returnflag")
        .select(
            F.lpad(F.col("profile_key").cast("string"), 20, "0").alias(
                "profile_key"
            ),
            "profile",
        )
        .cache()
    )
    prof.count()
    keys = [
        r[0]
        for r in prof.select("profile_key").orderBy("profile_key").collect()
    ]
    lo = len(keys) // 2  # "second batch": first half already coded
    if hasattr(lc, "_encode_codes"):  # r12 form: key-range filter
        coded_src = prof.filter(F.col("profile_key") < F.lit(keys[lo]))
        return coded_src.mapInArrow(
            lambda it: it,
            schema="qi int, nearest_key string, diffs long, distance double",
        )
    else:  # r11 form: driver id enumeration + broadcast join
        coded_src = prof.join(
            F.broadcast(
                spark.createDataFrame(
                    list(enumerate(keys[:lo])), ["ins_idx", "profile_key"]
                )
            ),
            on="profile_key",
        ).select("ins_idx", "profile")
        schema = "qi int, ins_idx long, diffs long, distance double"
    return coded_src.mapInPandas(lambda it: it, schema=schema)


def main() -> None:
    repo, out_dir, suffix, *names = sys.argv[1:]
    sys.path.insert(0, repo)
    os.makedirs(out_dir, exist_ok=True)
    from bigsdb_spark.inventory import QUERIES
    from bigsdb_spark.session import get_spark

    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    if names == ["ALL"]:
        names = sorted(set(QUERIES) | set(bench.EXTRA))
    for name in names:
        try:
            if name == "d5_scan":
                frame = _d5_scan_frame(spark, sf_dir)
            else:
                fn = QUERIES.get(name) or bench.EXTRA[name]
                frame = fn(spark, sf_dir)
            txt = _formatted(frame)
        except Exception as exc:  # noqa: BLE001 - record the failure
            txt = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
