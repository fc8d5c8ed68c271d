"""Curation-queue digests: route pending submissions to the curators
entitled to handle them and build per-curator digest summaries.

Reference: ``scripts/maintenance/submission_digests.pl`` — per-curator
e-mail digests of submissions since the last digest, gated by each
curator's ``digest_interval`` (:85-97) and scoped by entitlement
(locus curators for allele submissions :167, scheme curators for
profile submissions :173, an explicit permission for isolate
submissions :198); ``scripts/monitoring/nag_curators.pl`` — periodic
counts of items pending per curator.

The reference walks curators and submissions row-by-row over DBI;
here routing is three scope joins unioned into one (curator_id,
submission) frame and every digest/nag summary is a groupBy over it.
All scope tables are bounded metadata — broadcast joins.
"""

from __future__ import annotations

import datetime as _dt

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "route_submissions",
    "digest_due",
    "curator_digests",
    "nag_counts",
]


def route_submissions(
    submissions: DataFrame,
    locus_curators: DataFrame | None = None,
    scheme_curators: DataFrame | None = None,
    isolate_permissions: DataFrame | None = None,
) -> DataFrame:
    """(curator_id, submission_id, type, submitter, date_submitted):
    each PENDING submission paired with every curator entitled to it.

    ``submissions``: (submission_id, type 'alleles'|'profiles'|
    'isolates', status, submitter, date_submitted, locus nullable,
    scheme_id nullable); scope frames per the reference tables
    ``locus_curators (locus, curator_id)``, ``scheme_curators
    (scheme_id, curator_id)`` and the isolate-submission permission
    list ``(curator_id)``."""
    pending = submissions.filter(F.col("status") == "pending")
    parts = []
    base = ["submission_id", "type", "submitter", "date_submitted"]
    if locus_curators is not None:
        parts.append(
            pending.filter(F.col("type") == "alleles")
            .join(F.broadcast(locus_curators), "locus")
            .select("curator_id", *base)
        )
    if scheme_curators is not None:
        parts.append(
            pending.filter(F.col("type") == "profiles")
            .join(F.broadcast(scheme_curators), "scheme_id")
            .select("curator_id", *base)
        )
    if isolate_permissions is not None:
        parts.append(
            pending.filter(F.col("type") == "isolates")
            .crossJoin(F.broadcast(isolate_permissions.select("curator_id")))
            .select("curator_id", *base)
        )
    if not parts:
        return pending.select(
            F.lit(None).cast("int").alias("curator_id"), *base
        ).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def digest_due(
    curator_prefs: DataFrame, now: _dt.datetime
) -> DataFrame:
    """Curators whose digest is due (submission_digests.pl:85-93):
    ``last_digest`` NULL or older than ``digest_interval`` minutes.
    ``curator_prefs``: (curator_id, last_digest timestamp nullable,
    digest_interval int minutes).  Returns curator_id rows."""
    deadline = F.col("last_digest") + F.make_dt_interval(
        mins=F.col("digest_interval")
    )
    return curator_prefs.filter(
        F.col("last_digest").isNull() | (deadline <= F.lit(now))
    ).select("curator_id")


def curator_digests(
    routed: DataFrame,
    curator_prefs: DataFrame,
    now: _dt.datetime,
) -> DataFrame:
    """One digest row per DUE curator: per-type counts and the
    submission id list, oldest first, of submissions SINCE THAT
    CURATOR'S LAST DIGEST (submission_digests.pl's whole point —
    without the last_digest cut every digest would re-report the same
    pending backlog) — the content of the digest e-mail body
    (:229-260), minus the SMTP."""
    due = digest_due(curator_prefs, now)
    last = curator_prefs.select(
        "curator_id", F.col("last_digest").cast("date").alias("_since")
    )
    mine = (
        routed.join(F.broadcast(due), "curator_id", "left_semi")
        .join(F.broadcast(last), "curator_id", "left")
        .filter(
            F.col("_since").isNull()
            | (F.col("date_submitted") >= F.col("_since"))
        )
        .drop("_since")
    )
    return (
        mine.groupBy("curator_id")
        .agg(
            F.count(F.lit(1)).alias("n_pending"),
            F.sum((F.col("type") == "alleles").cast("int")).alias("n_alleles"),
            F.sum((F.col("type") == "profiles").cast("int")).alias("n_profiles"),
            F.sum((F.col("type") == "isolates").cast("int")).alias("n_isolates"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("date_submitted", "submission_id"))
                ),
                lambda s: s["submission_id"],
            ).alias("submission_ids"),
        )
        .orderBy("curator_id")
    )


def nag_counts(routed: DataFrame, older_than: _dt.date | None = None) -> DataFrame:
    """nag_curators.pl: per-curator count of pending items (optionally
    only those pending since before ``older_than``)."""
    df = routed
    if older_than is not None:
        df = df.filter(F.col("date_submitted") < F.lit(older_than))
    return (
        df.groupBy("curator_id")
        .agg(F.count(F.lit(1)).alias("n_pending"))
        .orderBy(F.desc("n_pending"), F.asc("curator_id"))
    )
