"""Count-predicate operators (SURVEY §2.4 A6-A8).

"Isolates with COUNT(designations) >= k" family
(IsolateQueryPage.pm:3686-3785). The zero-count case needs an anti-join
(the reference emits NOT EXISTS) and ``< k`` must OR in the zero branch —
a left join + null-inclusive filter reproduces both.

Scale note: the aggregation is a map-side-combinable groupBy on the fact
table's natural key; the join back to the entity table is a broadcast
when the filtered key set is small, else a shuffled hash join on the same
key — no extra shuffle beyond the groupBy's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_counts(fact: DataFrame, key: str, distinct_col: str | None = None) -> DataFrame:
    """COUNT(*) or COUNT(DISTINCT col) per entity key.

    DISTINCT-counting matters because the reference allows multiple
    designations per (isolate, locus) — paralogs
    (CombinationQueryPage.pm:448-452).
    """
    agg = (
        F.countDistinct(distinct_col) if distinct_col else F.count(F.lit(1))
    ).alias("n")
    return fact.groupBy(F.col(key).alias("entity_id")).agg(agg)


def with_count_predicate(
    entities: DataFrame,
    fact: DataFrame,
    entity_key: str,
    fact_key: str,
    op: str,
    k: int,
    distinct_col: str | None = None,
) -> DataFrame:
    """Filter entities by a count predicate over a fact table, with the
    reference's zero-count semantics: entities absent from the fact table
    count as 0 (IsolateQueryPage.pm:3729-3736 NOT EXISTS branch).

    The output carries the count as column ``n``, REPLACING any existing
    ``n`` on the entities frame — so chained count predicates compose
    (each stage recomputes its own count) instead of hitting an
    ambiguous-reference error."""
    # the counts-side key gets a collision-proof name: df.drop drops
    # EVERY column of that name, so dropping a bare 'entity_id' would
    # also destroy a caller column called entity_id (including the join
    # key itself when entity_key == 'entity_id')
    counts = (
        entity_counts(fact, fact_key, distinct_col)
        .withColumnRenamed("n", "_wcp_n")
        .withColumnRenamed("entity_id", "_wcp_key")
    )
    base = entities.drop("n")
    joined = (
        base.join(counts, base[entity_key] == counts["_wcp_key"], "left")
        .withColumn("n", F.coalesce(F.col("_wcp_n"), F.lit(0)))
        .drop("_wcp_n", "_wcp_key")
    )
    cond = {
        "=": F.col("n") == k,
        ">": F.col("n") > k,
        ">=": F.col("n") >= k,
        "<": F.col("n") < k,
        "<=": F.col("n") <= k,
    }[op]
    return joined.filter(cond)


def zero_count_entities(
    entities: DataFrame, fact: DataFrame, entity_key: str, fact_key: str
) -> DataFrame:
    """A8 zero-count search == anti-join (NOT EXISTS)."""
    return entities.join(
        fact.select(F.col(fact_key).alias(entity_key)).distinct(),
        on=entity_key,
        how="left_anti",
    )
