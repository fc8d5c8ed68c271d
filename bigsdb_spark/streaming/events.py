"""Structured Streaming extensions (SURVEY §2.9, §7 M8).

The reference is batch-only; these are the streaming counterparts of the
batch event operators in ``operators/sessions.py`` — identical
aggregation logic, so the batch result is the oracle for the stream run
(tested with trigger=availableNow over the same parquet).

Watermarking: 1 hour of allowed lateness on event time; the tumbling agg
emits append-mode finalized windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession, path: str, schema=None, max_files: int = 1
) -> DataFrame:
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_tumbling_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window counts per key."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            key_col,
            "n",
            "total_value",
        )
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, out_path: str) -> None:
    """Drain the stream with trigger=availableNow into parquet — the
    batch-equivalence harness used by the tests."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
