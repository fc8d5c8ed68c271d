"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multihop-revenue query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full SURVEY §2 inventory —
see bigsdb_spark/inventory/ for the implementations (each entry cites
the reference behaviour it reproduces).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigsdb_spark.inventory import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: snowflake multihop
    revenue per region (SURVEY J8/J9 + A4 shapes)."""
    return QUERIES["j8_multihop_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (rows-only checks for
    the non-SQL-expressible ops, which have no entry here)."""
    return dict(ORACLES)
