"""Third-party analysis results: candidate selection, annotation
runners, JSONPath cache normalization and dashboard breakdowns.

Reference behavior (WHAT, not HOW — the reference drives one external
binary per isolate from a Perl loop and normalizes JSON with plpgsql
triggers; here selection/normalization are DataFrame plans and the
per-genome tool fan-out is a grouped Arrow transform):

- ``scripts/maintenance/update_kleborate.pl:146-161`` — the candidate
  query (seqbin_stats left-join analysis_results left-join last_run,
  min-genome-size + staleness predicates); the same shape drives
  ``update_kaptive.pl`` / ``update_plasmidfinder.pl`` /
  ``update_rmlst_species.pl``.
- ``update_kleborate.pl:216-252`` — 2-line TSV parse, value cleaning
  (``-`` / empty / ``Not Tested`` dropped, integer-looking values
  stored as ints) and the stored JSON envelope
  ``{"version": v, "fields": [{header: value}, ...]}``.
- ``sql/isolatedb.sql:2177-2213`` ``normalize_analysis_jsonb`` — for
  each registered ``analysis_fields (analysis_name, json_path)``,
  every value matched by the JSONPath becomes one
  ``analysis_results_cache`` row, with surrounding double quotes
  trimmed (:2188).
- ``lib/BIGSdb/DataExplorerPage.pm:969`` / ``DashboardPage.pm:2036``
  — ``COALESCE(value, 'No value')`` label counts over the cache.
- ``lib/BIGSdb/Plugins/SeqbinBreakdown.pm:488-530`` — AssemblyStats
  results stored per isolate.

Scale notes: the annotation runner shuffles once on isolate_id and
runs the tool once per genome inside each task (the per-genome cost
dominates; 1000 executors give 1000 concurrent genomes).  The cache
normalizer is one scan of ``analysis_results`` per analysis name with
all of that name's paths evaluated as parallel JVM expressions — the
field registry is bounded metadata (the reference iterates it row by
row in a trigger), so driver-side path collection is not a scale risk.
"""

from __future__ import annotations

import datetime as _dt
import json
import shutil
import subprocess

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "annotation_candidates",
    "run_annotation_tool",
    "assembly_stats_analysis",
    "normalize_analysis_json",
    "analysis_field_breakdown",
]


def annotation_candidates(
    seqbin_stats: DataFrame,
    analysis_results: DataFrame,
    last_run: DataFrame,
    name: str,
    min_genome_size: int,
    today: _dt.date,
    refresh_days: int | None = None,
    last_run_days: int | None = None,
) -> DataFrame:
    """Isolates needing (re-)analysis by tool ``name``.

    Mirrors update_kleborate.pl:146-161: genomes big enough to be
    worth analysing whose results are missing (or stale when
    ``refresh_days`` is set) and that have not been attempted recently
    (``last_run`` guards against re-running failures every night).

    ``seqbin_stats``: (isolate_id, total_length, ...);
    ``analysis_results``: (isolate_id, name, datestamp);
    ``last_run``: (isolate_id, name, timestamp date).
    Returns one ``isolate_id`` column.  Both joined sides are
    per-tool slices of bounded metadata tables — broadcast them.
    """
    ar = (
        analysis_results.filter(F.col("name") == name)
        .select(F.col("isolate_id").alias("_ar_id"), F.col("datestamp").alias("_ar_date"))
    )
    lr = (
        last_run.filter(F.col("name") == name)
        .select(F.col("isolate_id").alias("_lr_id"), F.col("timestamp").alias("_lr_ts"))
    )
    base = (
        seqbin_stats.filter(F.col("total_length") >= min_genome_size)
        .join(F.broadcast(ar), F.col("isolate_id") == F.col("_ar_id"), "left")
        .join(F.broadcast(lr), F.col("isolate_id") == F.col("_lr_id"), "left")
    )
    stale = F.col("_ar_date").isNull()
    if refresh_days is not None:
        stale = stale | (
            F.col("_ar_date") < F.lit(today - _dt.timedelta(days=refresh_days))
        )
    not_recently_tried = F.col("_lr_ts").isNull()
    if last_run_days is not None:
        not_recently_tried = not_recently_tried | (
            F.col("_lr_ts") < F.lit(today - _dt.timedelta(days=last_run_days))
        )
    return (
        base.filter(stale & not_recently_tried)
        .select("isolate_id")
        .orderBy("isolate_id")
    )


def _clean_tool_value(raw: str):
    """update_kleborate.pl:238-247 — drop placeholder outputs, keep
    integer-looking values as ints so the stored JSON is typed."""
    if raw is None or raw in ("", "-", "Not Tested"):
        return None
    try:
        return int(raw)
    except ValueError:
        return raw


def run_annotation_tool(
    contigs: DataFrame,
    command: list[str],
    name: str,
    version: str,
    id_col: str = "isolate_id",
    seq_col: str = "sequence",
) -> DataFrame:
    """Run an external per-genome annotation tool (the Kleborate /
    Kaptive / PlasmidFinder pattern) and return ``analysis_results``
    rows ``(isolate_id, name, results)``.

    ``command`` reads a FASTA assembly on stdin and writes a 2-line
    TSV (headers, values) on stdout — the contract of
    update_kleborate.pl:216-226 with the temp files replaced by
    pipes.  One subprocess per genome, genomes fanned out across
    executors via a grouped Arrow transform; the reference's serial
    driver loop (:174-215) is the part we deliberately do not copy.

    A genome whose tool run fails (nonzero exit, no parseable output)
    yields a row with NULL ``results`` and the error text in ``err``
    — one bad assembly must not fail the task and re-run (then kill)
    the whole job.  EVERY attempted genome gets a row, so the full
    output doubles as the ``last_run`` log that
    ``annotation_candidates`` uses to avoid nightly re-runs of
    failures; filter ``results IS NOT NULL`` for the
    ``analysis_results`` upsert.
    """
    out_schema = f"{id_col} long, name string, results string, err string"

    def _per_genome(pdf: pd.DataFrame) -> pd.DataFrame:
        iso = int(pdf[id_col].iloc[0])
        fasta = "".join(
            f">{iso}_{i}\n{s}\n" for i, s in enumerate(pdf[seq_col], start=1)
        )
        results = err = None
        try:
            proc = subprocess.run(
                command, input=fasta, capture_output=True, text=True, check=True
            )
            lines = proc.stdout.splitlines()
            if len(lines) < 2:
                err = "no valid results"  # update_kleborate.pl:234
            else:
                headers = lines[0].rstrip("\n").split("\t")
                values = lines[1].rstrip("\n").split("\t")
                fields = []
                for h, v in zip(headers, values):
                    cleaned = _clean_tool_value(v)
                    if cleaned is not None:
                        fields.append({h: cleaned})
                results = json.dumps(
                    {"version": version, "fields": fields}, separators=(",", ":")
                )
        except (subprocess.CalledProcessError, OSError) as e:
            err = str(e)[:500]
        return pd.DataFrame(
            {id_col: [iso], "name": [name], "results": [results], "err": [err]}
        )

    return (
        contigs.select(id_col, seq_col)
        .groupBy(id_col)
        .applyInPandas(_per_genome, schema=out_schema)
    )


def tool_available(command: list[str]) -> bool:
    """Gate for optional real binaries (none ship in this container)."""
    return bool(command) and shutil.which(command[0]) is not None


def assembly_stats_analysis(
    contigs: DataFrame,
    id_col: str = "isolate_id",
    seq_col: str = "sequence",
    version: str = "assembly-stats-1",
) -> DataFrame:
    """AssemblyStats analysis rows computed natively (no external
    tool): contig count, total length, max contig and GC%, stored in
    the same ``analysis_results`` JSON envelope the reference writes
    from SeqbinBreakdown.pm:488-530.

    Pure expression plan — one groupBy over the contig table; the
    ``fields`` object is flat (``$.fields.contigs``) rather than the
    external tools' array-of-single-key-objects, and the cache
    normalizer accepts both path shapes.
    """
    ln = F.length(seq_col)
    gc = F.length(F.regexp_replace(F.upper(F.col(seq_col)), "[^GC]", ""))
    agg = contigs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_contigs"),
        F.sum(ln).alias("_total"),
        F.max(ln).alias("_max"),
        F.round(F.sum(gc) * 100.0 / F.sum(ln), 2).alias("_gc"),
    )
    payload = F.to_json(
        F.struct(
            F.lit(version).alias("version"),
            F.struct(
                F.col("_contigs").alias("contigs"),
                F.col("_total").alias("total_length"),
                F.col("_max").alias("max_contig"),
                F.col("_gc").alias("gc_percent"),
            ).alias("fields"),
        )
    )
    return agg.select(
        F.col(id_col),
        F.lit("AssemblyStats").alias("name"),
        payload.alias("results"),
    )


def _path_values(path: str):
    """array<string> of every value matched by ``path`` in ``results``.

    ``get_json_object`` returns a JSON array string when a wildcard
    path matches several values, the bare (still-quoted, for strings)
    scalar when it matches one, and NULL when it matches none — so:
    parse as an array first, fall back to the quote-trimmed scalar
    (the trim mirrors ``trim(both '\"' ...)`` at isolatedb.sql:2188).
    """
    raw = F.get_json_object(F.col("results"), path)
    arr = F.from_json(raw, "array<string>")
    scalar = F.regexp_replace(raw, '^"|"$', "")
    return (
        F.when(arr.isNotNull(), arr)
        .when(raw.isNotNull(), F.array(scalar))
        .otherwise(F.array().cast("array<string>"))
    )


def normalize_analysis_json(
    analysis_results: DataFrame, analysis_fields: DataFrame
) -> DataFrame:
    """Flatten analysis JSON into ``analysis_results_cache`` rows
    ``(isolate_id, analysis_name, json_path, value)`` — the batch
    equivalent of ``normalize_analysis_jsonb``
    (sql/isolatedb.sql:2177-2213): one row per value matched by each
    registered JSONPath, duplicates allowed (the cache has no PK).

    ``analysis_fields`` is the bounded field registry
    ``(analysis_name, json_path)``; its rows are collected and become
    parallel column expressions, so the whole normalization is one
    scan + generate per analysis name — no joins, no Python.
    Supported paths are the reference deployments' actual shapes:
    ``$.a.b`` and ``$.arr[*].key``.
    """
    registry: dict[str, list[str]] = {}
    for row in analysis_fields.select("analysis_name", "json_path").distinct().collect():
        registry.setdefault(row["analysis_name"], []).append(row["json_path"])
    parts = []
    for name in sorted(registry):
        per_path = F.array(
            *[
                F.struct(
                    F.lit(p).alias("json_path"), _path_values(p).alias("_vals")
                )
                for p in sorted(registry[name])
            ]
        )
        parts.append(
            analysis_results.filter(F.col("name") == name)
            .select(
                "isolate_id",
                F.lit(name).alias("analysis_name"),
                F.explode(per_path).alias("_pv"),
            )
            .select(
                "isolate_id",
                "analysis_name",
                F.col("_pv.json_path").alias("json_path"),
                F.explode("_pv._vals").alias("value"),
            )
        )
    if not parts:
        return analysis_results.sparkSession.createDataFrame(
            [], "isolate_id long, analysis_name string, json_path string, value string"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def analysis_field_breakdown(
    view: DataFrame,
    cache: DataFrame,
    analysis_name: str,
    json_path: str,
    id_col: str = "id",
) -> DataFrame:
    """Value-frequency breakdown of one analysis field over a view —
    DataExplorerPage.pm:969: isolates with no cached value count
    under ``No value``; an isolate with several matched values counts
    once per value.  The cache slice is one (name, path) — broadcast.
    """
    slice_ = cache.filter(
        (F.col("analysis_name") == analysis_name)
        & (F.col("json_path") == json_path)
    ).select(F.col("isolate_id").alias("_cid"), "value")
    return (
        view.select(F.col(id_col).alias("_vid"))
        .join(F.broadcast(slice_), F.col("_vid") == F.col("_cid"), "left")
        .groupBy(F.coalesce(F.col("value"), F.lit("No value")).alias("label"))
        .agg(F.count(F.lit(1)).alias("count"))
    )
