"""Bucketed designation store — the co-located-join layout for the
100 TB fact tables (SURVEY §7 "100 TB scale hygiene").

The designation fact (isolate_id, locus, allele_id) joins the isolate
view on isolate_id in almost every query (J1/J5/J6, the A5 pivot
input). At cluster scale that join shuffles BOTH sides every time
unless the storage layout pre-partitions them on the key. Spark's
bucketing does exactly that: ``bucketBy(n, key)`` + ``saveAsTable``
records the hash-partition layout in the catalog, and a join of two
tables bucketed on the same key into the same bucket count plans as a
zero-Exchange sort-merge join — the shuffle happens once at write time,
then never again.

This is the Spark analogue of the reference keeping designations and
isolates in one PostgreSQL instance with shared indexes; here the
co-location is declared in the table layout instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally per-bucket sorted) parquet
    table. Bucket metadata lives in the catalog, so this must be a
    saveAsTable, not a path write. Sorting inside buckets additionally
    removes the per-task Sort from sort-merge joins."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key, same-bucket-count tables. With matching
    layouts Catalyst plans this with NO Exchange on either side — the
    plan-quality test pins that property."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
