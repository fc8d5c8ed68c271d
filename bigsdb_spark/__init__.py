"""bigsdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kjolley/BIGSdb.

The reference (Perl + CGI + PostgreSQL) builds SQL strings by hand; this
engine declares logical plans with the DataFrame / Spark SQL API and lets
Catalyst pick the physical strategy. See SURVEY.md for the operator
inventory this package covers.

Layout
------
- ``session``    : SparkSession factory tuned for the lakehouse workload.
- ``sources``    : table loaders / readers / sinks (SURVEY §2.1).
- ``predicates`` : the 10-operator query-form algebra with BIGSdb null /
                   case semantics (SURVEY §2.2, P1-P13).
- ``plans``      : QuerySpec -> DataFrame composer (SURVEY §3.1).
- ``operators``  : breakdowns, count-predicates, seqbin stats, scheme
                   warehouse pivot + wildcard profile match, distance /
                   clustering / LIN codes, dedup, similarity, text stats.
- ``functions``  : scalar sequence-domain functions (SURVEY §2.8).
- ``streaming``  : Structured Streaming extensions (SURVEY §2.9).
- ``inventory``  : the driver-facing registry mapping every implemented
                   operator to a (spark, sf_dir) -> DataFrame callable and
                   a DuckDB oracle SQL string.
"""

__version__ = "0.1.0"
