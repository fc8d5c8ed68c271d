"""Access-control view factory (SURVEY §1.2 #14, S1).

The reference picks a database VIEW per user role (Datastore.pm:3685
initiate_view; role->view closures at :3749-3762) merging private
records, embargo state and project membership — every query then runs
against that view. Here the factory composes the same row-level filters
as DataFrame transformations, so every operator downstream inherits
them and Catalyst pushes the cheap predicates into the scan.

Semantics reproduced:
- default = latest-version public rows (new_version IS NULL, not
  private);
- a curator/admin sees everything;
- a logged-in user additionally sees their own private records and
  records of projects they belong to;
- embargoed records appear only once the embargo date passes
  (IsolateQueryPage.pm:3899).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class UserContext:
    user_id: int | None = None
    admin: bool = False
    project_ids: list[int] = field(default_factory=list)


def make_view(
    isolates: DataFrame,
    user: UserContext,
    private_records: DataFrame | None = None,
    project_members: DataFrame | None = None,
    today: str | None = None,
    id_col: str = "id",
    latest_only: bool = True,
) -> DataFrame:
    """Compose the role-filtered queryable universe.

    ``private_records``: (isolate_id, owner_id, embargo_date nullable).
    ``project_members``: (project_id, isolate_id).
    """
    df = isolates
    if latest_only and "new_version" in df.columns:
        df = df.filter(F.col("new_version").isNull())
    if user.admin or private_records is None:
        return df

    # join-side columns carry a _priv_ prefix so a provenance field that
    # happens to be called owner_id/embargo_date never collides with (or
    # gets dropped in place of) the access-control columns
    priv = private_records.select(
        F.col("isolate_id").alias("_priv_id"),
        F.col("owner_id").alias("_priv_owner"),
        F.col("embargo_date").alias("_priv_embargo"),
    )
    df = df.join(priv, df[id_col] == priv["_priv_id"], "left")
    visible = priv["_priv_id"].isNull()  # public rows
    # embargo release is always active: records appear once the embargo
    # date passes; ``today`` pins the evaluation date for reproducible
    # tests, defaulting to the current date
    today_d = F.lit(today).cast("date") if today else F.current_date()
    visible = visible | (
        F.col("_priv_embargo").isNotNull() & (F.col("_priv_embargo") <= today_d)
    )
    if user.user_id is not None:
        visible = visible | (F.col("_priv_owner") == user.user_id)
        if user.project_ids and project_members is not None:
            mine = project_members.filter(
                F.col("project_id").isin(user.project_ids)
            ).select(F.col("isolate_id").alias(id_col)).distinct()
            # membership must OR with the row predicates, so mark it with
            # a left-join flag instead of a semi-join
            df = df.join(
                mine.withColumn("_in_project", F.lit(True)), on=id_col, how="left"
            )
            visible = visible | F.col("_in_project").isNotNull()
    out = df.filter(visible)
    return out.drop("_priv_id", "_priv_owner", "_priv_embargo", "_in_project")


def date_restriction_filter(
    view: DataFrame,
    user: UserContext,
    date_restriction: str | None,
    date_col: str = "date_entered",
) -> DataFrame:
    """login_to_show_after_date (Datastore.pm:3809 get_date_restriction;
    applied in the REST routes, e.g. Profiles.pm:65-68): ANONYMOUS
    sessions see only records entered on/before the configured date;
    any logged-in user sees everything. No-op when unconfigured or the
    frame has no date column.

    try_cast keeps a malformed date from aborting the query under ANSI
    mode — such rows compare NULL and stay hidden from anonymous users,
    the conservative direction for an access filter."""
    if (
        user.user_id is not None
        or user.admin
        or not date_restriction
        or date_col not in view.columns
    ):
        return view
    return view.filter(
        F.col(date_col).try_cast("date")
        <= F.lit(date_restriction).cast("date")
    )


def publish_embargoed(
    private_records: DataFrame,
    today: str,
) -> dict[str, DataFrame]:
    """Embargo lifecycle sweep (scripts/maintenance/check_embargoes.pl
    :95-125): records whose embargo date has been reached leave the
    private set and gain an audit row.

    Returns three frames from ONE shared split of ``private_records``:
    ``published`` (isolate_id, owner_id — the publish list, ordered by
    owner then id as the script prints it), ``remaining_private`` (the
    replacement private_records table) and ``history`` (the
    ``embargo_history`` append: action text and curator 0 exactly as
    the script writes them, embargo set NULL).  Pure partition-local
    filters — no shuffle; callers overwrite/append the tables.
    """
    due = F.col("embargo_date").isNotNull() & (
        F.col("embargo_date") <= F.lit(today).cast("date")
    )
    published = (
        private_records.filter(due)
        .select("isolate_id", "owner_id")
        .orderBy("owner_id", "isolate_id")
    )
    remaining = private_records.filter(~F.coalesce(due, F.lit(False)))
    history = private_records.filter(due).select(
        "isolate_id",
        F.lit(today).cast("date").alias("timestamp"),
        F.lit("Record made public (embargo date reached)").alias("action"),
        F.lit(None).cast("date").alias("embargo"),
        F.lit(0).alias("curator"),
    )
    return {
        "published": published,
        "remaining_private": remaining,
        "history": history,
    }


# ---------------------------------------------------------------------------
# set system (sql/seqdef.sql:785-826 set_loci/set_schemes): a "set" is a
# curated subset of loci and schemes a deployment exposes to a user
# group; every locus/scheme-keyed query then runs against the subset.


def set_visible_loci(
    set_id: int,
    set_loci: DataFrame,
    set_schemes: DataFrame | None = None,
    scheme_members: DataFrame | None = None,
) -> DataFrame:
    """Distinct locus names visible in a set: the directly assigned
    set_loci UNION the members of every scheme in set_schemes
    (Datastore.pm:1137 is_locus_in_set checks exactly these two ways;
    the REST routes' set_clause is the same union in SQL,
    REST/Routes/Sequences.pm:44-47). Returns a 1-column ``locus``
    frame, dimension-sized."""
    direct = set_loci.filter(F.col("set_id") == set_id).select("locus")
    if set_schemes is not None and scheme_members is not None:
        via = (
            set_schemes.filter(F.col("set_id") == set_id)
            .select("scheme_id")
            .join(scheme_members, on="scheme_id")
            .select("locus")
        )
        direct = direct.union(via)
    return direct.distinct()


def apply_set_loci(
    df: DataFrame,
    set_id: int | None,
    set_loci: DataFrame,
    set_schemes: DataFrame | None = None,
    scheme_members: DataFrame | None = None,
    locus_col: str = "locus",
) -> DataFrame:
    """Restrict any locus-keyed frame (designations, tags, locus stats,
    allele definitions) to the set's visible loci — a broadcast
    left-semi join, so the fact side never shuffles. ``set_id=None``
    means no set is active (the reference's behaviour when get_set_id
    returns undef): passthrough."""
    if set_id is None:
        return df
    vis = set_visible_loci(set_id, set_loci, set_schemes, scheme_members)
    if locus_col != "locus":
        vis = vis.withColumnRenamed("locus", locus_col)
    return df.join(F.broadcast(vis), on=locus_col, how="left_semi")


def apply_set_schemes(
    df: DataFrame,
    set_id: int | None,
    set_schemes: DataFrame,
    scheme_id_col: str = "scheme_id",
) -> DataFrame:
    """Restrict a scheme-keyed frame to the set's schemes (the scheme
    dropdowns / REST scheme lists under a set)."""
    if set_id is None:
        return df
    vis = set_schemes.filter(F.col("set_id") == set_id).select(
        F.col("scheme_id").alias(scheme_id_col)
    ).distinct()
    return df.join(F.broadcast(vis), on=scheme_id_col, how="left_semi")


def set_locus_display_names(
    df: DataFrame,
    set_id: int | None,
    set_loci: DataFrame,
    locus_col: str = "locus",
) -> DataFrame:
    """Attach the set's display name for each locus:
    ``display_name = coalesce(set_name, locus)`` — the inverse of
    Datastore.pm:1127 get_set_locus_real_id (which maps a set alias
    back to the real id). Left join against the dimension-sized
    set_loci; frames outside a set keep their real names."""
    if set_id is None:
        return df.withColumn("display_name", F.col(locus_col))
    names = set_loci.filter(F.col("set_id") == set_id).select(
        F.col("locus").alias(locus_col), F.col("set_name").alias("_set_name")
    )
    return (
        df.join(F.broadcast(names), on=locus_col, how="left")
        .withColumn(
            "display_name", F.coalesce(F.col("_set_name"), F.col(locus_col))
        )
        .drop("_set_name")
    )
