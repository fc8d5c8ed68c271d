"""Client-database queries: the seqdef side asking its client isolate
databases "how many (public, current) isolates carry this allele /
profile / classification group / LIN-code prefix, and how do their
provenance fields break down?"

Reference: ``lib/BIGSdb/ClientDB.pm`` — count_isolates_with_allele
(:48-63), count_matching_profile_by_pk (:75-95),
count_matching_profiles (:97-133), get_fields (:135-152, the allele's
field-frequency breakdown), count_isolates_belonging_to_
classification_group (:165-188), count_isolates_with_lincode_prefix
(:190-210).  The reference opens a second DBI connection per client
database and runs these per allele id on page render; here each is one
DataFrame composition over the lakehouse tables — and the natural
batch shape ("counts for EVERY allele at once", which the reference
achieves by a nightly cache) is the same plan without the final
filter, grouped by allele.

All counts exclude private isolates (NOT IN private_isolates) and
non-current versions (new_version IS NULL) exactly as the SQL does;
the ``view`` passed in should already be the public current view
(views.make_view default), and ``private`` is the private_isolates
frame for the explicit exclusion the reference layers on top.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "public_isolates",
    "count_isolates_with_allele",
    "isolates_with_allele_per_allele",
    "count_matching_profiles_by_pk",
    "allele_field_breakdown",
    "count_isolates_in_classification_group",
    "count_isolates_with_lincode_prefix",
]


def public_isolates(
    view: DataFrame, private: DataFrame | None, id_col: str = "id"
) -> DataFrame:
    """The countable universe: the view minus private records
    (ClientDB.pm's ``NOT IN (SELECT isolate_id FROM private_isolates)``
    as an anti-join)."""
    out = view.select(id_col)
    if private is not None:
        out = out.join(
            private.select(F.col("isolate_id").alias(id_col)), id_col, "left_anti"
        )
    return out


def count_isolates_with_allele(
    designations: DataFrame,
    view: DataFrame,
    private: DataFrame | None,
    locus: str,
    allele_id: str,
    id_col: str = "id",
) -> int:
    """ClientDB.pm:48-63: DISTINCT isolates carrying (locus, allele)."""
    pub = public_isolates(view, private, id_col)
    return (
        designations.filter(
            (F.col("locus") == locus) & (F.col("allele_id") == allele_id)
        )
        .join(pub, designations["isolate_id"] == pub[id_col], "left_semi")
        .select("isolate_id")
        .distinct()
        .count()
    )


def isolates_with_allele_per_allele(
    designations: DataFrame,
    view: DataFrame,
    private: DataFrame | None,
    locus: str | None = None,
    id_col: str = "id",
) -> DataFrame:
    """The batch shape the reference caches nightly: DISTINCT isolate
    counts for EVERY (locus, allele) in one pass — same join, grouped
    instead of filtered."""
    pub = public_isolates(view, private, id_col)
    d = designations
    if locus is not None:
        d = d.filter(F.col("locus") == locus)
    return (
        d.join(pub, d["isolate_id"] == pub[id_col], "left_semi")
        .groupBy("locus", "allele_id")
        .agg(F.count_distinct("isolate_id").alias("n_isolates"))
    )


def count_matching_profiles_by_pk(
    scheme_cache: DataFrame,
    view: DataFrame,
    private: DataFrame | None,
    pk_col: str,
    pk_value,
    id_col: str = "id",
) -> int:
    """ClientDB.pm:75-95: isolates whose cached scheme field (e.g. ST)
    equals the profile's primary key."""
    pub = public_isolates(view, private, id_col)
    return (
        scheme_cache.filter(F.col(pk_col) == pk_value)
        .join(pub, scheme_cache[id_col] == pub[id_col], "left_semi")
        .count()
    )


def allele_field_breakdown(
    designations: DataFrame,
    view: DataFrame,
    field: str,
    locus: str,
    allele_id: str,
    private: DataFrame | None = None,
    id_col: str = "id",
) -> DataFrame:
    """ClientDB.pm:135-152 get_fields: frequency of a provenance field
    among PUBLIC isolates carrying the allele, frequency-desc — feeds
    the allele-info page's 'where has this allele been seen' table.
    Private records are excluded like every other count here (a
    private record's provenance must not leak into a public page)."""
    mine = designations.filter(
        (F.col("locus") == locus) & (F.col("allele_id") == allele_id)
    ).select("isolate_id")
    pub = public_isolates(view, private, id_col)
    return (
        view.join(mine, view[id_col] == mine["isolate_id"], "left_semi")
        .join(pub, id_col, "left_semi")
        .filter(F.col(field).isNotNull())
        .groupBy(field)
        .agg(F.count(F.lit(1)).alias("frequency"))
        .orderBy(F.desc("frequency"), F.asc(field))
    )


def count_isolates_in_classification_group(
    scheme_cache: DataFrame,
    cgroup_profiles: DataFrame,
    view: DataFrame,
    private: DataFrame | None,
    group_id: int,
    pk_col: str = "ST",
    id_col: str = "id",
) -> int:
    """ClientDB.pm:165-188: DISTINCT isolates whose cached profile PK
    belongs to the classification group — cache ⋈ group members
    (broadcast; group membership is bounded metadata)."""
    members = cgroup_profiles.filter(F.col("group_id") == group_id).select(
        F.col("profile_id").alias("_pid")
    )
    pub = public_isolates(view, private, id_col)
    return (
        scheme_cache.join(
            F.broadcast(members), scheme_cache[pk_col] == F.col("_pid"), "left_semi"
        )
        .join(pub, scheme_cache[id_col] == pub[id_col], "left_semi")
        .select(id_col)
        .distinct()
        .count()
    )


def count_isolates_with_lincode_prefix(
    scheme_cache: DataFrame,
    lincodes: DataFrame,
    view: DataFrame,
    private: DataFrame | None,
    prefix: list[int],
    pk_col: str = "ST",
    id_col: str = "id",
) -> int:
    """ClientDB.pm:190-210: DISTINCT isolates whose profile's LIN code
    starts with the prefix (array slice equality, the reference's
    ``lincode[1:k] = ARRAY[...]``)."""
    k = len(prefix)
    pref = F.array(*[F.lit(int(v)) for v in prefix])
    coded = lincodes.filter(F.slice("lincode", 1, k) == pref).select(
        F.col("profile_id").alias("_pid")
    )
    pub = public_isolates(view, private, id_col)
    return (
        scheme_cache.join(
            F.broadcast(coded), scheme_cache[pk_col] == F.col("_pid"), "left_semi"
        )
        .join(pub, scheme_cache[id_col] == pub[id_col], "left_semi")
        .select(id_col)
        .distinct()
        .count()
    )
