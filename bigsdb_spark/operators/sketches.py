"""Mergeable distinct-count sketches for incremental dashboards.

Beyond-reference extension of the dashboard aggregates (SURVEY A4 —
the reference recounts ``COUNT(DISTINCT ...)`` per page render,
Dashboard.pm; fine at registry scale, a full-corpus rescan at 100 TB).
Here each partition of data is summarized ONCE into an Apache
DataSketches HLL sketch (Spark's built-in ``hll_sketch_agg`` family —
JVM-side, codegen, no UDFs), and any rollup — other grouping sets,
new-data-only refreshes, cross-table unions — is a SKETCH MERGE, which
is associative, commutative and idempotent-friendly: merging loses
nothing beyond the sketch's own resolution — the merged estimate
tracks sketching the raw union within estimator-mode rounding (the
union path may finish in a different HLL target mode than the direct
agg, so the two integers can differ by ±1-ish even when both are a
fraction of a percent from truth; pinned in tests) — so a
dashboard can answer "distinct users this quarter" by merging 90 daily
sketches instead of rescanning 90 days of events.

The sketch column is an opaque ``binary`` — persist it in a parquet
rollup table (committed via snaplog.Materialization like every other
derived cache) keyed by the finest grouping you will ever need, and
serve every coarser grouping by ``merge_sketches`` over it.

Estimates are approximate (HLL standard error ~1.04/sqrt(2^lgk);
lgConfigK=12 default ≈ 1.6%): use ``approx=True`` dashboards, never
joins/filters that need exact semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Finest-grain sketch table: one row per group with an HLL sketch
    of ``value_col``'s distinct values (binary ``sketch`` column) plus
    the exact per-group row count (cheap at agg time, useful beside the
    estimate).  This is the table you persist and refresh per
    partition of new data."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_sketches(
    rollup: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Re-aggregate a sketch table to a coarser grouping by MERGING
    sketches (no raw-data rescan).  Pass ``group_cols=[]`` for the
    grand total."""
    agg = [
        F.hll_union_agg(F.col("sketch")).alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    ]
    if group_cols:
        return rollup.groupBy(*group_cols).agg(*agg)
    return rollup.agg(*agg)


def with_estimate(rollup: DataFrame, out_col: str = "distinct_est") -> DataFrame:
    """Materialize the integer distinct-count estimate next to each
    sketch (the sketch column is kept so the row stays mergeable)."""
    return rollup.withColumn(
        out_col, F.hll_sketch_estimate(F.col("sketch"))
    )


def upsert_sketch_rollup(
    mat,
    batch: DataFrame,
    group_col: str,
    value_col: str,
    lgk: int = 12,
) -> str:
    """Incremental dashboard refresh: sketch ONLY the new batch, merge
    with the stored sketches of the touched groups, and commit through
    a snaplog-backed ``cache.Materialization`` (reader isolation,
    optimistic concurrency, time travel — the same governance as every
    derived cache here).  Cost is O(batch + touched groups); raw
    history is never rescanned.

    Single writer per rollup assumed (the repo's streaming-refresh
    convention): the merge reads the current snapshot once, so two
    concurrent upserts touching the same group would need this
    read-merge-commit cycle retried at THIS level — the inner
    ``refresh_incremental`` retry only protects against writers
    touching OTHER keys."""
    delta = distinct_sketch_rollup(batch, [group_col], value_col, lgk)
    if not mat.exists():
        return mat.refresh_full(delta)
    changed = delta.select(group_col).distinct()
    current_touched = mat.read().join(
        changed, on=group_col, how="left_semi"
    )
    merged = merge_sketches(
        current_touched.unionByName(delta), [group_col]
    )
    return mat.refresh_incremental(merged, changed, key=group_col)


def union_sketch_columns(a: Column, b: Column) -> Column:
    """Row-wise sketch union (e.g. combining two metric columns or the
    current batch's sketch with the stored one in an incremental
    upsert)."""
    return F.hll_union(a, b)
