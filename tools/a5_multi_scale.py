"""A5 path-(b) multi-designation scale ladder (VERDICT r10 #5).

The r10 verdict asked for a ladder of the wildcard join's
multi-designation branch, whose documented contract was "pre-expand
into one candidate vector per designation combination" — a fan-out of
Π(designations per locus) per isolate.  r11 removed that contract:
the reference itself never expands combinations — its path-(b) loop
tests ``profile[i] = ANY(ARRAY(designations at locus i))`` per
position (sql/isolatedb.sql:1555-1566), i.e. positional SET
MEMBERSHIP — and ``assign_scheme_fields_multi`` is the Spark form
(operators/profiles.py).  Its cost is linear in the TOTAL designation
count (sum, not product, of per-locus designations).

This tool measures that claim in the data-dominated regime and
records, per tier:

- n_designations: the long-form row count actually processed
  (N * L * (1 + paralog_rate), the linear driver);
- expansion_rows_if_preexpanded: what the killed pre-expansion
  contract WOULD have materialized — sum over isolates of
  Π(designations per locus) = sum of 2^(paralog loci per isolate);
  computed exactly from the synthesized paralog flags (reported, never
  materialized: at 2% of 1000 loci it is ~2^20 vectors PER ISOLATE);
- predicted_intermediate: the exact unpruned (pos, allele) membership
  join row count from the frequency tables (same estimator as
  tools/a5_scale.py);
- pruned (default auto knob) wall clock and, under --cap, the
  unpruned wall clock + output symmetric difference (must be 0).

Synthesis reuses tools/a5_scale.py's deterministic corpus (Zipf
allele skew, ~2% definition 'N', ~1% mutation, 0.5% noise rows): the
dense isolate vectors are exploded to long form and a paralogous
SECOND designation (fresh skewed draw) is added at --paralog-rate of
(isolate, locus) cells.

Usage:
  python tools/a5_multi_scale.py [--tiers mlst_1e5:100000:7:10000:60,...]
        [--paralog-rate 0.05] [--cap 2500000000] [--out /tmp/a5_scale]
Tier spec: name:n_isolates:loci:profiles:vocab (prune positions are
auto-selected from the definition side — the r11 default).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bigsdb_spark.operators.profiles import (  # noqa: E402
    WILDCARD,
    assign_scheme_fields_multi,
)
from bigsdb_spark.session import get_spark  # noqa: E402
from tools.a5_scale import (  # noqa: E402
    _gen_defs,
    _gen_isolates,
    _skewed_allele,
)

DEFAULT_TIERS = (
    "mlst_1e5:100000:7:10000:60,"
    "mlst_1e6:1000000:7:10000:60,"
    "cg_2p5e5:250000:1000:10000:500"
)


def _long_designations(iso_df, vocab: int, rate_permille: int):
    """Explode dense vectors to (profile_key, pos, allele) and add a
    paralogous second designation at rate_permille/1000 of cells."""
    base = iso_df.select(
        "profile_key", F.posexplode("profile").alias("pos", "allele")
    )
    extra = base.filter(
        F.pmod(
            F.xxhash64(F.col("profile_key"), F.col("pos"), F.lit(29)),
            F.lit(1000),
        )
        < rate_permille
    ).select(
        "profile_key",
        "pos",
        _skewed_allele(
            F.xxhash64(F.col("profile_key"), F.col("pos"), F.lit(31)), vocab
        ).alias("allele"),
    )
    return base.unionByName(extra)


def _expansion_if_preexpanded(desig) -> int:
    """Exact Π(designations/locus) total the killed pre-expansion
    contract would have materialized (as a row count; never built)."""
    per_locus = desig.groupBy("profile_key", "pos").agg(
        F.count(F.lit(1)).alias("nd")
    )
    per_iso = per_locus.groupBy("profile_key").agg(
        F.sum(F.log2("nd")).alias("log2_combos")
    )
    # sum of 2^log2_combos, capped per isolate to keep the sum finite
    total = (
        per_iso.select(
            F.sum(F.pow(F.lit(2.0), F.least("log2_combos", F.lit(62.0))))
        ).head()[0]
        or 0.0
    )
    max_log2 = per_iso.agg(F.max("log2_combos")).head()[0] or 0.0
    return int(total), round(float(max_log2), 1)


def _predict_intermediate_long(desig, sch_df) -> int:
    """Exact unpruned membership-join row count (frequency tables)."""
    sch = sch_df.select(F.posexplode("profile").alias("pos", "allele"))
    i_f = desig.distinct().groupBy("pos", "allele").agg(
        F.count(F.lit(1)).alias("ni")
    )
    s_ex = (
        sch.filter(F.col("allele") != WILDCARD)
        .groupBy("pos", "allele")
        .agg(F.count(F.lit(1)).alias("np_"))
    )
    s_w = (
        sch.filter(F.col("allele") == WILDCARD)
        .groupBy("pos")
        .agg(F.count(F.lit(1)).alias("nw"))
    )
    exact = (
        i_f.join(s_ex, on=["pos", "allele"])
        .agg(F.sum(F.col("ni") * F.col("np_")))
        .head()[0]
        or 0
    )
    i_pos = i_f.groupBy("pos").agg(F.sum("ni").alias("ni"))
    wild = (
        i_pos.join(s_w, on="pos").agg(F.sum(F.col("ni") * F.col("nw"))).head()[0]
        or 0
    )
    return int(exact) + int(wild)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default=DEFAULT_TIERS)
    ap.add_argument("--paralog-rate", type=float, default=0.05)
    ap.add_argument("--cap", type=int, default=2_500_000_000)
    ap.add_argument("--out", default="/tmp/a5_scale")
    ap.add_argument("--skip-unpruned", action="store_true")
    args = ap.parse_args()
    rate_permille = int(args.paralog_rate * 1000)

    spark = get_spark("a5_multi_scale")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for spec in args.tiers.split(","):
        name, n, loci, p, vocab = spec.split(":")
        n, loci, p, vocab = int(n), int(loci), int(p), int(vocab)
        defs_path = os.path.join(args.out, f"defs_{loci}_{p}_{vocab}")
        iso_path = os.path.join(args.out, f"iso_{name}")
        _gen_defs(spark, p, loci, vocab, defs_path)
        _gen_isolates(spark, n, p, loci, vocab, defs_path, iso_path)
        sch_df = spark.read.parquet(defs_path)
        desig_path = os.path.join(args.out, f"desig_{name}_{rate_permille}")
        if not os.path.exists(os.path.join(desig_path, "_SUCCESS")):
            _long_designations(
                spark.read.parquet(iso_path), vocab, rate_permille
            ).write.mode("overwrite").parquet(desig_path)
        desig = spark.read.parquet(desig_path)
        row: dict = {
            "tier": name, "n": n, "loci": loci, "p": p,
            "paralog_rate": args.paralog_rate,
            "n_designations": desig.count(),
        }
        expansion, max_log2 = _expansion_if_preexpanded(desig)
        row["expansion_rows_if_preexpanded"] = expansion
        row["max_log2_combos_per_isolate"] = max_log2
        row["predicted_intermediate"] = _predict_intermediate_long(
            desig, sch_df
        )
        t0 = time.time()
        pruned = assign_scheme_fields_multi(
            desig, sch_df, total_loci=loci, allow_missing_loci=True,
        )
        pruned_path = os.path.join(args.out, f"out_multi_pruned_{name}")
        pruned.write.mode("overwrite").parquet(pruned_path)
        row["t_pruned_auto"] = round(time.time() - t0, 1)
        row["rows_pruned"] = spark.read.parquet(pruned_path).count()
        if args.skip_unpruned or row["predicted_intermediate"] > args.cap:
            row["t_unpruned"] = None
            row["unpruned_skipped"] = (
                f"predicted intermediate {row['predicted_intermediate']:.3g}"
                " rows > cap"
            )
        else:
            t0 = time.time()
            base = assign_scheme_fields_multi(
                desig, sch_df, total_loci=loci, allow_missing_loci=True,
                prune_candidates=False,
            )
            base_path = os.path.join(args.out, f"out_multi_base_{name}")
            base.write.mode("overwrite").parquet(base_path)
            row["t_unpruned"] = round(time.time() - t0, 1)
            a = spark.read.parquet(base_path)
            b = spark.read.parquet(pruned_path)
            row["rows_unpruned"] = a.count()
            row["diff"] = a.exceptAll(b).count() + b.exceptAll(a).count()
        results[name] = row
        print(json.dumps(row), flush=True)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
