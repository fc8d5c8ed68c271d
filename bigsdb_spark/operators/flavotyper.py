"""FlavoTyper wrapper parity (the last Plugins/* analytic without a
counterpart).

Reference behavior (WHAT): ``lib/BIGSdb/Plugins/FlavoTyper.pm``
- :164-270 ``run_job`` — per selected isolate, assemble the seqbin
  contigs into a FASTA file, run the external ``flavotyper`` binary
  (:319-347 ``_run_flavotyper``: ``flavotyper type --locus-analysis
  --genomes <file> --outdir <dir>``), read the 2-line
  ``typing_results.tsv`` (header + one result row), prepend the
  isolate id, substitute the label field for column 1, and PAD short
  result rows to the header width (:250-257);
- :272-310 ``_store_results`` — the JSON results (tagged with the
  tool version) upsert into ``analysis_results`` as a DELETE+INSERT
  per (isolate_id, 'FlavoTyper'), and ``last_run`` advances.

HOW here: the per-genome fan-out IS ``analysis.run_annotation_tool``
(one grouped-Arrow subprocess per genome across executors — the
reference's serial driver loop is the part deliberately not copied);
this module adds the FlavoTyper-specific pieces: the tool invocation
preset, the padded typing TABLE the job renders, and the
analysis_results upsert as a distributed anti-join + union (the
trigger-equivalent of DELETE+INSERT).  The real binary is feature-
gated via ``analysis.tool_available`` (none ships in this container);
the TSV contract is what tests pin, exactly as the BLAST outfmt-6
contract is pinned.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from bigsdb_spark.operators.analysis import run_annotation_tool

__all__ = [
    "FLAVOTYPER_COMMAND",
    "run_flavotyper",
    "flavotyper_table",
    "upsert_analysis_results",
]

# FlavoTyper.pm:336-338 — the invocation shape, reading the assembly
# from stdin in our pipe contract instead of --genomes tempfiles
FLAVOTYPER_COMMAND = ["flavotyper", "type", "--locus-analysis"]
_NAME = "FlavoTyper"


def run_flavotyper(
    contigs: DataFrame,
    command: list[str] | None = None,
    version: str = "unknown",
    id_col: str = "isolate_id",
    seq_col: str = "sequence",
) -> DataFrame:
    """(isolate_id, name='FlavoTyper', results json, err) — one row
    per attempted genome; failures carry NULL results + err text
    (FlavoTyper.pm:222 logs-and-continues the same way)."""
    return run_annotation_tool(
        contigs,
        command or FLAVOTYPER_COMMAND,
        name=_NAME,
        version=version,
        id_col=id_col,
        seq_col=seq_col,
    )


def flavotyper_table(
    results: DataFrame,
    isolates: DataFrame,
    label_field: str = "isolate",
    id_col: str = "isolate_id",
) -> DataFrame:
    """The job's typing table (FlavoTyper.pm:195-258): one row per
    typed isolate — ``id``, the label field (the reference substitutes
    the isolate name for the tool's first column, :243), then every
    typing field from the stored JSON; isolates whose result row was
    SHORTER than the header pad with empty strings (:250-257 pads,
    never drops).

    The JSON field layout is run_annotation_tool's
    ``{"version", "fields": [{heading: value}, ...]}``; headings are
    taken from the first non-null result (the reference reads them
    from the first output file's header line)."""
    ok = results.filter(F.col("results").isNotNull())
    # headings must be a deterministic function of the data: take them
    # from the result row with the smallest isolate id, not whichever
    # partition happens to return first (mixed tool versions would
    # otherwise give the table a nondeterministic schema across runs)
    first = ok.orderBy(F.col(id_col)).select("results").first()
    if first is None:
        return isolates.select(
            F.col("id").alias(id_col), F.col(label_field)
        ).limit(0)
    headings = [list(f)[0] for f in json.loads(first["results"])["fields"]]
    # tool column 1 is replaced by the label field, so drop it from
    # the typed columns if it duplicates the label heading
    parsed = ok.select(
        id_col,
        F.from_json(
            "results",
            "version string, fields array<map<string,string>>",
        ).alias("_r"),
    ).select(
        id_col,
        F.map_from_entries(
            F.transform(
                "_r.fields",
                lambda m: F.struct(
                    F.map_keys(m)[0].alias("k"), F.map_values(m)[0].alias("v")
                ),
            )
        ).alias("_kv"),
    )
    lab = isolates.select(
        F.col("id").alias("_iso_id"), F.col(label_field).alias(label_field)
    )
    out = parsed.join(lab, parsed[id_col] == F.col("_iso_id"), "left").select(
        id_col,
        label_field,
        *[
            F.coalesce(F.col("_kv")[h], F.lit("")).alias(h)
            for h in headings[1:]
        ],
    )
    return out.orderBy(id_col)


def upsert_analysis_results(
    analysis_results: DataFrame,
    fresh: DataFrame,
    name: str = _NAME,
) -> DataFrame:
    """FlavoTyper.pm:292-296 — DELETE FROM analysis_results WHERE
    (isolate_id, name) THEN INSERT, as one distributed plan: anti-join
    the existing table against the refreshed (isolate_id, name) keys,
    union the fresh rows.  Failed runs (NULL results) are excluded
    from the upsert but remain in ``fresh`` as the last_run log
    (annotation_candidates consumes them)."""
    ok = fresh.filter(F.col("results").isNotNull()).select(
        "isolate_id", "name", "results"
    )
    keys = ok.select(
        F.col("isolate_id").alias("_k_iso"), F.col("name").alias("_k_name")
    ).distinct()
    keep = analysis_results.join(
        F.broadcast(keys),
        (analysis_results["isolate_id"] == F.col("_k_iso"))
        & (analysis_results["name"] == F.col("_k_name")),
        "left_anti",
    )
    return keep.unionByName(ok)
