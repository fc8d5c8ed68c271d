"""Analysis-operator plugin registry (SURVEY §2.10).

The reference's plugin system (lib/BIGSdb/Plugin.pm, 1348 LoC;
lib/BIGSdb/PluginManager.pm) gives every analysis module a uniform
contract: declared attributes (name, category, input requirements),
an entry point receiving the current dataset selection + form params,
and a dual execution mode — small requests run inline in the web
process, large ones are submitted to the offline job queue
(Plugin.pm run/run_job duality; OfflineJobManager).

Spark-side the same contract is a declared transform
``(DataFrame, params) -> artifacts`` where artifacts is any
JSON-serializable or DataFrame-valued result:

- ``register_plugin`` declares the operator with its metadata;
- ``run_inline`` executes directly against a DataFrame selection;
- ``submit`` queues it on the JobService; ``run_queued`` executes the
  next queued plugin job via the same registry — one code path for
  both modes, exactly the run/run_job duality.

Plugins receive the *selection* (an already-filtered DataFrame — the
reference passes the query's isolate id list the same way) so access
control and query composition stay upstream in views.py / queryspec.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame

from bigsdb_spark.jobs import Job, JobService


@dataclass
class PluginDef:
    """Declared plugin attributes (Plugin.pm get_attributes)."""

    name: str
    category: str  # e.g. 'breakdown', 'analysis', 'export'
    fn: Callable[..., Any]  # (df: DataFrame, **params) -> artifacts
    description: str = ""
    requires: tuple[str, ...] = ()  # required input columns


@dataclass
class PluginRegistry:
    _plugins: dict[str, PluginDef] = field(default_factory=dict)

    def register_plugin(
        self,
        name: str,
        category: str,
        fn: Callable[..., Any],
        description: str = "",
        requires: tuple[str, ...] = (),
    ) -> PluginDef:
        if name in self._plugins:
            raise ValueError(f"plugin {name!r} already registered")
        p = PluginDef(name, category, fn, description, requires)
        self._plugins[name] = p
        return p

    def get(self, name: str) -> PluginDef:
        return self._plugins[name]

    def by_category(self, category: str) -> list[PluginDef]:
        return [p for p in self._plugins.values() if p.category == category]

    def _check_inputs(self, p: PluginDef, df: DataFrame) -> None:
        missing = [c for c in p.requires if c not in df.columns]
        if missing:
            raise ValueError(
                f"plugin {p.name!r} requires columns {missing} absent from selection"
            )

    # ------------------------------------------------ inline execution

    def run_inline(self, name: str, selection: DataFrame, **params) -> Any:
        """The web-process path (Plugin.pm run): execute now, return
        artifacts."""
        p = self.get(name)
        self._check_inputs(p, selection)
        return p.fn(selection, **params)

    # ------------------------------------------------ queued execution

    def submit(
        self,
        jobs: JobService,
        name: str,
        user: str,
        params: dict | None = None,
        priority: int = 5,
    ) -> Job:
        """The offline path (Plugin.pm run_job): queue on the job
        service; dedup/quota/priority semantics come from JobService."""
        self.get(name)  # unknown plugin fails at submit, not dequeue
        return jobs.add_job(
            module=name, params=params or {}, user=user, priority=priority
        )

    def run_queued(
        self, jobs: JobService, selection_for: Callable[[Job], DataFrame]
    ) -> Job | None:
        """Dequeue and execute ONE plugin job — the same plugin function
        the inline path runs (RunJobs.pm fork + run_job, minus the
        fork). ``selection_for`` resolves the job's dataset selection
        (the reference re-runs the stored query the same way)."""
        job = jobs.next_job()
        if job is None:
            return None
        try:
            p = self.get(job.module)
            df = selection_for(job)
            self._check_inputs(p, df)
            jobs.update_progress(job.job_id, 50, stage=f"running {p.name}")
            jobs.finish(job.job_id, result=p.fn(df, **job.params))
        except Exception as exc:  # job failure is a status, not a crash
            jobs.finish(
                job.job_id,
                result=f"{type(exc).__name__}: {exc}",
                status="failed",
            )
        return job


DEFAULT_REGISTRY = PluginRegistry()


def _register_builtins() -> None:
    """Built-in analysis operators exposed as plugins — each wraps the
    library operator so the plugin surface and the gate inventory share
    one implementation."""
    from bigsdb_spark.operators.breakdown import (
        combination_counts,
        crosstab_pct,
        field_frequency,
    )
    from bigsdb_spark.operators.dedup import exact_duplicates
    from bigsdb_spark.operators.stats import group_stats

    DEFAULT_REGISTRY.register_plugin(
        "FieldBreakdown", "breakdown",
        lambda df, field: field_frequency(df, field),
        description="value frequency of one field (A1)",
    )
    DEFAULT_REGISTRY.register_plugin(
        "TwoFieldBreakdown", "breakdown",
        lambda df, f1, f2: crosstab_pct(df, f1, f2),
        description="two-field crosstab with percentages (A2)",
    )
    DEFAULT_REGISTRY.register_plugin(
        "DataExplorer", "breakdown",
        lambda df, fields, rollup=True: combination_counts(df, fields, rollup=rollup),
        description="multi-field combination counts (A3)",
    )
    DEFAULT_REGISTRY.register_plugin(
        "SeqbinStats", "analysis",
        lambda df, key, value: group_stats(df, key, value),
        description="per-group moment statistics (A9)",
    )
    DEFAULT_REGISTRY.register_plugin(
        "ExactDedup", "analysis",
        lambda df, id_col, text_col: exact_duplicates(df, id_col, text_col),
        description="exact duplicate groups by normalized-text hash",
    )

    from bigsdb_spark.operators.genome_compare import (
        gene_presence,
        locus_attributes,
        pairwise_distances,
        unique_strains,
    )

    DEFAULT_REGISTRY.register_plugin(
        "GenomeComparator", "analysis",
        lambda df, **kw: {
            "locus_attributes": locus_attributes(df, by_ref=kw.get("by_ref", False)),
            "distances": pairwise_distances(
                df,
                exclude_missing=kw.get("exclude_missing", False),
                truncated_pairwise_same=kw.get("truncated_pairwise_same", False),
            ),
            "unique_strains": unique_strains(df),
        },
        description="locus categorization + pair distances + unique strains "
        "over a designation selection (GenomeComparator.pm)",
    )
    DEFAULT_REGISTRY.register_plugin(
        "GenePresence", "analysis",
        lambda df, loci, **kw: gene_presence(df, loci, **kw),
        description="presence/completion/designation/tag grid (GenePresence.pm)",
    )

    from bigsdb_spark.operators.export_dataset import dataset_export

    DEFAULT_REGISTRY.register_plugin(
        "Export", "export",
        lambda df, fields, **kw: dataset_export(df, fields, **kw),
        description="wide dataset export: fields + designations + scheme "
        "fields (Export.pm)",
    )

    from bigsdb_spark.sources.sinks import to_embl, to_gff3

    def _seqbin_export(df, tags, fmt="embl", **kw):
        if fmt == "gff3":
            return to_gff3(df, tags, **kw)
        if kw:  # gff3-only options (source/igv) or typos: loud, not silent
            raise TypeError(f"unexpected options for format {fmt!r}: {sorted(kw)}")
        return to_embl(df, tags, fmt=fmt)

    DEFAULT_REGISTRY.register_plugin(
        "SeqbinExport", "export",
        _seqbin_export,
        description="tag-annotated contig export: EMBL / GenBank / GFF3 "
        "(SeqbinToEMBL.pm, SeqbinToGFF3.pm)",
        requires=("seqbin_id", "sequence"),
    )

    from bigsdb_spark.operators.corpus import repeated_spans

    DEFAULT_REGISTRY.register_plugin(
        "RepeatedSpans", "analysis",
        lambda df, id_col, text_col, **kw: repeated_spans(df, id_col, text_col, **kw),
        description="cross-document repeated-substring spans "
        "(Lee et al. substring dedup, relational form)",
    )

    from bigsdb_spark.operators.dedup import semantic_dedup

    DEFAULT_REGISTRY.register_plugin(
        "SemanticDedup", "analysis",
        lambda df, id_col, vec_col, **kw: semantic_dedup(df, id_col, vec_col, **kw),
        description="SemDeDup-style embedding dedup: k-means cells + "
        "within-cell cosine pairs + keep-one-per-group",
    )

    from bigsdb_spark.operators.flavotyper import run_flavotyper

    DEFAULT_REGISTRY.register_plugin(
        "FlavoTyper", "analysis",
        lambda df, **kw: run_flavotyper(df, **kw),
        description="in-silico serotyping wrapper: per-genome external "
        "tool fan-out + analysis_results upsert (FlavoTyper.pm)",
        requires=("isolate_id", "sequence"),
    )


_register_builtins()
