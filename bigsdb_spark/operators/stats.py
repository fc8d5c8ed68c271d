"""Grouped statistics incl. the N50 family (SURVEY §2.4 A9, §2.6 W2).

The reference computes seqbin stats per isolate in Perl
(Plugins/SeqbinBreakdown.pm:488, Utils.pm:873 get_N_stats) and keeps a
trigger-maintained ``seqbin_stats`` table (sql/isolatedb.sql:354,432-496).
Here both are one pass: a groupBy for the moments and a window running
sum for the N50/L50 family.

N50 definition (Utils.pm:873-899): sort lengths descending, accumulate
until the running sum reaches >= fraction (50%) of the total; N50 is the
length at the crossing row, L50 the number of rows consumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_stats(df: DataFrame, key: str, value: str) -> DataFrame:
    """count / sum / min / max / mean / stddev per key — single shuffle,
    map-side partial aggregation."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value), 2).alias("total"),
        F.round(F.min(value), 2).alias("min_v"),
        F.round(F.max(value), 2).alias("max_v"),
        F.round(F.avg(value), 4).alias("mean_v"),
        F.round(F.stddev_samp(value), 4).alias("stddev_v"),
    )


def n_stats(
    df: DataFrame,
    key: str,
    length: str,
    fractions: tuple[float, ...] = (0.5,),
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """N{50,90,95} / L{50,90,95} per key via a running-sum window.

    One shuffle on ``key`` (the window partition); the running sum is
    computed within each partition without a second exchange. ``tiebreak``
    columns make the running order — and therefore the crossing row —
    deterministic when lengths tie.
    """
    order = [F.col(length).desc()] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(key).orderBy(*order)
    cum = df.select(
        key,
        F.col(length).alias("_len"),
        F.sum(length).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("_cum"),
        F.row_number().over(w).alias("_rank"),
        F.sum(length).over(Window.partitionBy(key)).alias("_tot"),
    )
    aggs = []
    for frac in fractions:
        pct = int(round(frac * 100))
        crossed = F.when(F.col("_cum") >= F.col("_tot") * frac, F.col("_len"))
        crossed_rank = F.when(F.col("_cum") >= F.col("_tot") * frac, F.col("_rank"))
        aggs.append(F.max(crossed).alias(f"n{pct}"))
        aggs.append(F.min(crossed_rank).alias(f"l{pct}"))
    return cum.groupBy(key).agg(*aggs)
