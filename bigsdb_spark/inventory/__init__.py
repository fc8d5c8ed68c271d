"""Driver-facing inventory: importing this package populates the
QUERIES / ORACLES registries from every inventory module."""

# Registration order = the order the driver's correctness gate checks
# queries in (it checks the first 50). The round-2 inventory is exactly
# 50 entries, so EVERY entry gets an oracle row; the hard relational /
# typing operators register first regardless.
from bigsdb_spark.inventory import (  # noqa: F401  (import for side effects)
    relational,
    typing,
    analytics,
    extended,
    temporal,
    sequenceq,
    llm,
)
from bigsdb_spark.inventory.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
