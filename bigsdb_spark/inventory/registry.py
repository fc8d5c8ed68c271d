"""Inventory registry: operator name -> (Spark callable, DuckDB oracle).

Every SURVEY §2 operator gets an entry here, instantiated against the
driver's deterministic tables (TESTDATA.md). The Spark callable and the
oracle SQL must produce identical column NAMES and values — the driver
sorts columns by name and hashes values (order-insensitive).

Engine-independence rules used throughout:
- float aggregates are ROUNDed (2dp for sums of 2dp money, 4dp for
  means/ratios, 6dp for cosines) on BOTH sides;
- integer aggregates are BIGINT on both sides (DuckDB sum(int) is
  HUGEINT -> explicit CAST in oracles);
- timestamps are exposed as epoch seconds or formatted strings, never
  raw timestamps;
- every LIMIT sits under a total order (explicit tiebreak columns).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register an inventory query; ``oracle=None`` -> rows-only check
    (genuinely non-SQL-expressible ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from bigsdb_spark.sources.tables import load_table

    return load_table(spark, sf_dir, name)


def gate_scratch(name: str) -> str:
    """Per-run scratch dir for gate entries that round-trip through the
    filesystem (S6 TSV, S7 querystore, F7 FASTA).  Keyed by PID so two
    concurrent gate/pytest runs against the same checkout cannot race
    on overwrite-in-place scratch and read a half-written file; lives
    under the repo's spark-warehouse dir because the driver's cwd is
    not ours."""
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(
        repo_root, "spark-warehouse", "gate_scratch",
        f"{name}-{os.getpid()}",
    )


# pseudo-DNA over the documents table: keep only a/c/g/t, uppercased.
# SINGLE SOURCE for both the oracle spelling and the Spark expression —
# the d9/d10/f10/sequence-suite entries all derive sequences this way,
# and the two sides must stay character-identical for gate equality.
DNA_SQL = "upper(regexp_replace(text, '[^acgt]', '', 'g'))"


def dna_expr(text_col: str = "text"):
    from pyspark.sql import functions as F

    return F.upper(F.regexp_replace(text_col, "[^acgt]", ""))
