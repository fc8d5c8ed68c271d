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
