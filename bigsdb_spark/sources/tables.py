"""Parquet table sources (SURVEY §2.1 S1/S4).

The reference splits its world across several PostgreSQL databases and
bridges them with COPY-into-temp-table hacks (Datastore.pm:2058-2146).
Here everything is one lakehouse namespace of columnar tables: a scan is
``spark.read.parquet`` and cross-"database" joins are ordinary joins.

``load_tables`` returns plain DataFrames; filters/projections applied on
top push down to the parquet scan (verify with
``df.explain('formatted')`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Driver-provided deterministic tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the events table is written with TIMESTAMP(NANOS) parquet, which
    # Spark only reads as a long (nanos since epoch) via this conf;
    # downstream operators treat a bigint ts as epoch-nanos.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp rendering (date_format / cast-from-string) must match the
    # DuckDB oracles, which treat timestamps as naive values — pin UTC
    # even when the caller's session was built with another timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so operators can use spark.sql."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
