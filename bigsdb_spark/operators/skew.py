"""Skew-handling utilities for hot keys (SURVEY §7 M8 scale hygiene).

AQE's skew-join splitting covers most cases at runtime; these helpers
cover the two patterns AQE can't fix:

- ``salted_aggregate``: two-phase aggregation for a groupBy whose key
  distribution is pathological (one locus/shingle carrying half the
  table). Phase 1 aggregates on (key, salt), phase 2 merges partials —
  the classic map-side-combine generalization.
- ``salted_join``: replicate the small side R times, salt the big side
  — an equi-join on (key, salt) spreads one hot key over R tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase agg: ``agg_exprs`` maps column -> 'sum'|'count'|'min'|'max'.
    Result columns are named ``<fn>_<col>`` (count uses the key column)."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1_aggs = []
    for col, fn in agg_exprs.items():
        name = f"{fn}_{col}"
        phase1_aggs.append(
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(name)
        )
    partial = salted.groupBy(key, "_salt").agg(*phase1_aggs)
    phase2_aggs = []
    for col, fn in agg_exprs.items():
        name = f"{fn}_{col}"
        merge = "sum" if fn in ("count", "sum") else fn
        phase2_aggs.append(getattr(F, merge)(name).alias(name))
    return partial.groupBy(key).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salt the big side, replicate the small side per salt value."""
    b = big.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, on=[key, "_salt"], how=how).drop("_salt")
