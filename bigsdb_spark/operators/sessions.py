"""Event-time operators: tumbling windows and sessionization.

The reference has no streaming (SURVEY §2.9); its closest shape is the
temporal job-stats bucketing (OfflineJobManager.pm:648). These batch
operators share semantics with the Structured Streaming versions in
``bigsdb_spark.streaming`` — same aggregation, same windows — so the
batch run doubles as the oracle for the streaming run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds(df: DataFrame, ts_col: str) -> Column:
    """Epoch seconds from either a timestamp column or a bigint
    epoch-nanos column (Spark reads TIMESTAMP(NANOS) parquet as long —
    see sources/tables.py). Integer arithmetic: nanos ~1.7e18 overflow a
    double's 53-bit mantissa."""
    if dict(df.dtypes).get(ts_col) == "bigint":
        # FLOOR division (pmod makes the numerator exactly divisible):
        # bare `div` truncates toward zero, which disagrees with floor
        # semantics (and the DuckDB oracles' `//`) for pre-epoch
        # timestamps; plain float floor would lose precision above
        # 2^53 ns
        return F.expr(
            f"(({ts_col}) - pmod({ts_col}, 1000000000)) div 1000000000"
        )
    return F.unix_timestamp(F.col(ts_col))


def tumbling_counts(
    df: DataFrame, ts_col: str, key_col: str, width_sec: int = 3600
) -> DataFrame:
    """Count + sum(value) per (tumbling window, key). The window start is
    exposed as epoch seconds (engine-independent)."""
    sec = epoch_seconds(df, ts_col)
    bucket = (sec - (sec % width_sec)).cast("long")
    return (
        df.groupBy(bucket.alias("window_start"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def sessionize(
    df: DataFrame, ts_col: str, user_col: str, gap_sec: int = 1800
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time
    since the previous event exceeds ``gap_sec``. lag + running sum of
    boundary flags — one shuffle on user_col; both windows share the
    partitioning so Catalyst plans a single exchange."""
    epoch = epoch_seconds(df, ts_col)
    df = df.withColumn("_epoch", epoch)
    w = Window.partitionBy(user_col).orderBy("_epoch")
    epoch = F.col("_epoch")
    boundary = (
        (epoch - F.lag(epoch).over(w)).isNull()
        | ((epoch - F.lag(epoch).over(w)) > gap_sec)
    ).cast("long")
    sessions = df.select(
        F.col(user_col),
        epoch.alias("_t"),
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("session_id"),
    )
    per_session = sessions.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("_t") - F.min("_t")).alias("duration_sec"),
    )
    return per_session.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.max("duration_sec").cast("long").alias("max_session_sec"),
    )
