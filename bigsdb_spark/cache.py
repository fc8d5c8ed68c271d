"""Governed materializations (SURVEY §4 X1-X3).

The reference maintains derived tables (per-scheme field caches,
completion counts, seqbin/locus stats) with full / incremental / daily /
daily_replace refresh modes and an atomic create-new -> drop-old ->
rename swap (sql/isolatedb.sql:1441-1586, Datastore.pm:1242-2175,
update_scheme_caches.pl).

Here a materialization is a parquet table under a root directory with
versioned subdirs and a _CURRENT pointer file:

    <root>/<name>/v_000017/part-*.parquet
    <root>/<name>/_CURRENT      (contains "v_000017")

- ``refresh_full``   : write a new version, flip the pointer — readers
  never see a partial table (the reference's atomic rename swap).
- ``refresh_incremental`` : new version = current rows for unchanged
  keys + recomputed rows for the changed-key set (the reference's
  incremental mode keyed on isolate id + datestamp) — an anti-join +
  union, i.e. exactly a MERGE, expressed on immutable parquet.
- ``read``           : the current version as a DataFrame.

On Delta/Iceberg the pointer dance is REPLACE TABLE / MERGE; the
semantics tested here are mode correctness and swap atomicity.

A cache-vs-recompute policy mirrors the reference's thresholds
(MAX_LOCI_NON_CACHE_SCHEME=30, Constants.pm:41; cache required above
100 loci for rendering, ResultsTablePage.pm:33).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_LOCI_NON_CACHE_SCHEME = 30   # Constants.pm:41
LOCUS_LIMIT_TO_USE_CACHE = 100   # ResultsTablePage.pm:33


def should_use_cache(n_loci: int, for_display: bool = False) -> bool:
    """Cache policy: scheme-warehouse queries cache past 30 loci
    (Constants.pm:41); the results-table display path tolerates up to
    100 uncached loci before demanding the cache
    (ResultsTablePage.pm:33)."""
    limit = LOCUS_LIMIT_TO_USE_CACHE if for_display else MAX_LOCI_NON_CACHE_SCHEME
    return n_loci > limit


class Materialization:
    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.dir = os.path.join(root, name)
        os.makedirs(self.dir, exist_ok=True)

    def _pointer(self) -> str:
        return os.path.join(self.dir, "_CURRENT")

    def current_version(self) -> str | None:
        try:
            with open(self._pointer()) as fh:
                return fh.read().strip()
        except FileNotFoundError:
            return None

    def _next_version(self) -> str:
        cur = self.current_version()
        n = int(cur.split("_")[1]) + 1 if cur else 0
        return f"v_{n:06d}"

    def exists(self) -> bool:
        return self.current_version() is not None

    def read(self) -> DataFrame:
        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError(f"no current version for {self.dir}")
        return self.spark.read.parquet(os.path.join(self.dir, cur))

    def _swap_in(self, df: DataFrame, keep_versions: int = 2) -> str:
        """Write a complete new version, flip the pointer, then drop
        superseded versions — the full create-new -> rename -> drop-old
        swap (sql/isolatedb.sql:1580-1586). ``keep_versions`` retains
        the new version plus its predecessor (in-flight readers of the
        old pointer finish against intact files); older versions are
        deleted so a daily refresh does not accumulate full table
        copies forever."""
        version = self._next_version()
        df.write.mode("overwrite").parquet(os.path.join(self.dir, version))
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, self._pointer())  # atomic on POSIX
        # numeric sort: lexicographic order breaks at the first version
        # that outgrows the zero padding ('v_1000000' < 'v_999999'),
        # which would delete the just-written newest version
        versions = sorted(
            (
                d for d in os.listdir(self.dir)
                if d.startswith("v_") and os.path.isdir(os.path.join(self.dir, d))
            ),
            key=lambda d: int(d.split("_", 1)[1]),
        )
        for stale in versions[:-keep_versions] if keep_versions else versions:
            shutil.rmtree(os.path.join(self.dir, stale), ignore_errors=True)
        return version

    def refresh_full(self, df: DataFrame) -> str:
        return self._swap_in(df)

    def refresh_incremental(
        self, recomputed: DataFrame, changed_keys: DataFrame, key: str
    ) -> str:
        """MERGE semantics: keep current rows whose key is NOT in
        ``changed_keys``, add ``recomputed`` rows (which must cover
        exactly the changed keys)."""
        if not self.exists():
            return self._swap_in(recomputed)
        current = self.read()
        kept = current.join(
            F.broadcast(changed_keys.select(key).distinct()), on=key, how="left_anti"
        )
        return self._swap_in(kept.unionByName(recomputed))
