"""Driver-facing inventory: importing this package populates the
QUERIES / ORACLES registries from every inventory module."""

from bigsdb_spark.inventory import (  # noqa: F401  (import for side effects)
    analytics,
    extended,
    llm,
    relational,
    sequenceq,
    temporal,
    typing,
)
from bigsdb_spark.inventory.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
