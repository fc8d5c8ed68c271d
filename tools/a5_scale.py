"""A5 wildcard profile-join scale ladder (VERDICT r9 task 1).

The wildcard scheme-field assignment (operators/profiles.py
``assign_scheme_fields(allow_missing_loci=True)``) splits onto a clean
(pos, allele) equi-join, but its intermediate is every (isolate, ST)
pair sharing ANY (pos, allele):

    rows = sum over (pos, a) of iso_cnt(pos, a) * prof_cnt(pos, a)
         + sum over pos of iso_cnt(pos) * wild_cnt(pos)

Under realistic allele-popularity skew (the top MLST allele at a locus
often covers 30-50% of isolates) that is ~ L * N * P * sum(share^2) —
the one SURVEY §2 core operator whose 100x behaviour was asserted
(AQE skew splitting) rather than measured.  This tool measures it, and
measures the r10 mitigation — rarest-k-position candidate INTERSECTION
(``prune_candidates=True``; the Spark-first form of the reference's
first-three-position candidate indexes, Datastore.pm:2160-2165 /
sql/seqdef.sql:1193).  The intersection matters at the cgMLST shape:
with ~2% definition 'N' rate and L=1000, EVERY position carries
~0.02*P wildcard candidates, so single-position pruning still yields
~200 candidates/isolate whose array-carrying verify join ships ~20 KB
each (the first cg run filled a 69 GB disk); intersecting 3 selective
positions culls to O(1) survivors per isolate before any array moves.

Synthesis (deterministic, pure expressions + one synthesis-time join):
- definitions: P STs x L loci; allele at (st, pos) drawn Zipf-skewed by
  inverse CDF — u = hash-uniform(0,1), allele = floor(V^(u^2)), giving
  the top allele a ~sqrt(ln2/lnV) share (~0.3-0.4 at V=60-500, the
  realistic MLST regime); ~2% of definition positions are 'N'.
- isolates: each clones definition hash(id)%P, fills its 'N's with a
  fresh skewed draw, mutates ~1% of positions, and (0.5%) replaces the
  whole vector with out-of-vocab noise (exercises the cost-0 free
  rejection).  All vectors dense length L.

Per tier this reports:
- predicted_intermediate: the EXACT unpruned-join row count, computed
  from the two (pos, allele) frequency tables (cheap linear aggs) —
  the join materializes exactly this many rows, so tiers past --cap
  are skipped with the prediction recorded instead of ground through
  a disk-filling run (the r9 IVF ladder lesson).
- unpruned wall-clock (when under --cap), pruned wall-clock, both
  output counts, and the symmetric difference of the two outputs
  (must be 0).

Usage:
  python tools/a5_scale.py [--tiers mlst:1000000:7:10000:60:1,...]
                           [--cap 2500000000] [--out /tmp/a5_scale]
Tier spec: name:n_isolates:loci:profiles:vocab[:prune_positions]
prune_positions defaults to 1 for loci<=20 and 3 otherwise: candidate
GENERATION volume is sum over selected positions of that allele's
definition frequency, so on a 7-locus scheme the 3rd-rarest position
is still a popular allele (~k x more narrow candidate rows, measured
2x wall at 1e5), while on 1000-locus schemes the 3 rarest of 1000 are
near-unique and the intersection is what makes the verify feasible.
Prints one JSON line per tier and a final summary JSON.
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
    assign_scheme_fields,
)
from bigsdb_spark.session import get_spark  # noqa: E402

DEFAULT_TIERS = (
    # MLST shape: 7 loci, 60-allele vocab (top share ~0.41)
    "mlst_1e5:100000:7:10000:60:1,"
    "mlst_1e6:1000000:7:10000:60:1,"
    "mlst_4e6:4000000:7:10000:60:1,"
    "mlst_1e6_p1e5:1000000:7:100000:60:1,"
    # cgMLST slice: 1000 loci, 500-allele vocab (top share ~0.33)
    "cg_2p5e5:250000:1000:10000:500:3,"
    "cg_1e6:1000000:1000:10000:500:3"
)


def _skewed_allele(h, vocab: int):
    """Zipf-ish allele index from a 64-bit hash: u = uniform(0,1),
    idx = floor(vocab^(u*u)) in [1, vocab] — inverse-CDF draw whose
    top value carries a sqrt(ln2/ln vocab) share."""
    u = F.pmod(h, F.lit(1_000_003)).cast("double") / 1_000_003.0
    return F.least(
        F.lit(vocab),
        F.greatest(
            F.lit(1), F.floor(F.pow(F.lit(float(vocab)), u * u)).cast("int")
        ),
    ).cast("string")


def _gen_defs(spark, p: int, loci: int, vocab: int, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    prof = F.transform(
        F.sequence(F.lit(1), F.lit(loci)),
        lambda i: F.when(
            F.pmod(F.xxhash64(F.col("id"), i, F.lit(7)), F.lit(100)) < 2,
            F.lit(WILDCARD),
        ).otherwise(_skewed_allele(F.xxhash64(F.col("id"), i, F.lit(1)), vocab)),
    )
    (
        spark.range(p, numPartitions=max(8, p * loci // 2_000_000))
        .select(
            F.col("id").cast("string").alias("st"), prof.alias("profile")
        )
        .withColumn("profile_md5", F.md5(F.array_join("profile", ",")))
        .write.mode("overwrite")
        .parquet(path)
    )


def _gen_isolates(spark, n: int, p: int, loci: int, vocab: int,
                  defs_path: str, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    del defs_path  # definitions are a deterministic hash function —
    # the source profile is RECOMPUTED inline per (isolate, position)
    # instead of joined: a join against 1000-element array rows builds
    # ~20 KB/row hash maps per task (the joined form OOM'd the heap at
    # the cgMLST shape even as shuffle_hash), while the inline form is
    # two extra xxhash64 calls per element inside codegen, no join,
    # byte-identical output (same formulas, same seeds)
    base = spark.range(n, numPartitions=max(32, n * loci // 2_000_000)).select(
        F.col("id").alias("profile_key"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(5)), F.lit(p)).alias("_src"),
    )

    def _def_allele(i):
        # must mirror _gen_defs exactly (same seeds 7 and 1)
        return F.when(
            F.pmod(F.xxhash64(F.col("_src"), i, F.lit(7)), F.lit(100)) < 2,
            F.lit(WILDCARD),
        ).otherwise(
            _skewed_allele(F.xxhash64(F.col("_src"), i, F.lit(1)), vocab)
        )

    # mutation hashes use the 0-based element index (i - 1) — the
    # joined form hashed the transform's 0-based index, and the cached
    # parquet tiers were generated that way; def-side hashes use the
    # 1-based position to mirror _gen_defs
    mutate = F.transform(
        F.sequence(F.lit(1), F.lit(loci)),
        lambda i: F.when(
            _def_allele(i) == WILDCARD,
            _skewed_allele(
                F.xxhash64(F.col("profile_key"), i - 1, F.lit(11)), vocab
            ),
        )
        .when(
            F.pmod(
                F.xxhash64(F.col("profile_key"), i - 1, F.lit(13)),
                F.lit(1000),
            )
            < 10,
            _skewed_allele(
                F.xxhash64(F.col("profile_key"), i - 1, F.lit(17)), vocab
            ),
        )
        .otherwise(_def_allele(i)),
    )
    noise = F.transform(
        F.sequence(F.lit(1), F.lit(loci)),
        lambda i: F.concat(
            F.lit("x"),
            F.pmod(F.xxhash64(F.col("profile_key"), i, F.lit(19)), F.lit(50))
            .cast("string"),
        ),
    )
    prof = F.when(
        F.pmod(F.xxhash64(F.col("profile_key"), F.lit(23)), F.lit(200)) == 0,
        noise,
    ).otherwise(mutate)
    (
        base.select(
            "profile_key",
            prof.alias("profile"),
        )
        .withColumn("profile_md5", F.md5(F.array_join("profile", ",")))
        .write.mode("overwrite")
        .parquet(path)
    )


def _predict_intermediate(iso_df, sch_df) -> int:
    """Exact unpruned-join row count from the two frequency tables."""
    iso = iso_df.select(F.posexplode("profile").alias("pos", "allele"))
    sch = sch_df.select(F.posexplode("profile").alias("pos", "allele"))
    i_f = iso.groupBy("pos", "allele").agg(F.count(F.lit(1)).alias("ni"))
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
        i_pos.join(s_w, on="pos")
        .agg(F.sum(F.col("ni") * F.col("nw")))
        .head()[0]
        or 0
    )
    return int(exact) + int(wild)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default=DEFAULT_TIERS)
    ap.add_argument("--cap", type=int, default=2_500_000_000,
                    help="skip the unpruned run past this predicted "
                         "intermediate row count")
    ap.add_argument("--out", default="/tmp/a5_scale")
    ap.add_argument("--skip-unpruned", action="store_true")
    args = ap.parse_args()

    spark = get_spark("a5_scale")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for spec in args.tiers.split(","):
        parts = spec.split(":")
        name, n, loci, p, vocab = parts[:5]
        n, loci, p, vocab = int(n), int(loci), int(p), int(vocab)
        k_sel = int(parts[5]) if len(parts) > 5 else (1 if loci <= 20 else 3)
        defs_path = os.path.join(args.out, f"defs_{loci}_{p}_{vocab}")
        iso_path = os.path.join(args.out, f"iso_{name}")
        _gen_defs(spark, p, loci, vocab, defs_path)
        _gen_isolates(spark, n, p, loci, vocab, defs_path, iso_path)
        sch_df = spark.read.parquet(defs_path)
        iso_df = spark.read.parquet(iso_path)
        t0 = time.time()
        predicted = _predict_intermediate(iso_df, sch_df)
        t_pred = round(time.time() - t0, 1)
        row: dict = {
            "tier": name, "n": n, "loci": loci, "p": p, "vocab": vocab,
            "prune_positions": k_sel,
            "predicted_intermediate": predicted, "t_predict": t_pred,
        }
        # pruned path (always)
        t0 = time.time()
        pruned = assign_scheme_fields(
            iso_df, sch_df, allow_missing_loci=True, total_loci=loci,
            prune_candidates=True, prune_positions=k_sel,
        )
        pruned_path = os.path.join(args.out, f"out_pruned_{name}")
        pruned.write.mode("overwrite").parquet(pruned_path)
        row["t_pruned"] = round(time.time() - t0, 1)
        row["rows_pruned"] = spark.read.parquet(pruned_path).count()
        # unpruned path (capped)
        if args.skip_unpruned or predicted > args.cap:
            row["t_unpruned"] = None
            row["unpruned_skipped"] = (
                f"predicted intermediate {predicted:.3g} rows > cap"
            )
        else:
            t0 = time.time()
            base = assign_scheme_fields(
                iso_df, sch_df, allow_missing_loci=True, total_loci=loci,
                prune_candidates=False,  # r11: pruned became the default
            )
            base_path = os.path.join(args.out, f"out_base_{name}")
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
