"""Export sinks (SURVEY §2.1 S6).

The reference exports result tables as TSV/Excel/FASTA/EMBL
(Utils.pm:407 text2excel, Plugins/Export.pm:816 _write_tab_text,
SeqbinToEMBL.pm). Spark-side: distributed writers for the scalable
formats; Excel is a driver-side pandas conversion (inherently
single-file) gated behind an import-try since openpyxl may be absent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_tsv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S6: tab-separated export with header (the reference's
    _write_tab_text). ``single_file`` coalesces for download-sized
    results; leave False for lakehouse-scale output."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("sep", "\t").option("header", True).csv(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_fasta(df: DataFrame, id_col: str, seq_col: str, path: str) -> None:
    """S6/F7: FASTA export via the formatter in sources/fasta.py."""
    from bigsdb_spark.sources.fasta import to_fasta

    to_fasta(df, id_col, seq_col).coalesce(1).write.mode("overwrite").text(path)


def to_excel(df: DataFrame, path: str, max_rows: int = 1_048_575) -> bool:
    """Driver-side xlsx export (Utils.pm text2excel). Returns False when
    no xlsx engine is available — callers fall back to TSV."""
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        return False
    pdf = df.limit(max_rows).toPandas()
    pdf.to_excel(path, index=False)
    return True


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Lakehouse-style partitioned parquet export — the scale path for
    any result meant to be re-queried (partition pruning for free)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


# ------------------------------------------------- D8 phylogeny exports

def to_nexus_distances(
    pair_dist: DataFrame,
    nodes: list | None = None,
    id1: str = "id1",
    id2: str = "id2",
    dist_col: str = "hamming",
    labels: dict | None = None,
    comment: str | None = None,
) -> str:
    """D8: NEXUS distance-matrix export — the SplitsTree input the
    reference builds in GenomeComparator.pm:1497-1560 (_make_nexus_file):
    lower-triangle matrix with diagonal and labels, ``missing=?`` for
    absent pairs, taxa sorted by id.

    ``pair_dist``: one row per unordered pair (id1 < id2) as produced by
    profiles.profile_pair_distances. ``nodes`` adds taxa with no pair row
    (singletons). The matrix is download-sized by construction (ntaxa
    export), so assembly is driver-side — the distance computation
    itself is the distributed part.

    Byte-stable (no timestamp) unless ``comment`` is passed — golden
    tests pin the exact output.
    """
    rows = pair_dist.select(id1, id2, dist_col).collect()
    dist = {}
    ids = set(nodes or [])
    for r in rows:
        a, b = r[0], r[1]
        ids.add(a)
        ids.add(b)
        dist[(a, b)] = r[2]
        dist[(b, a)] = r[2]
    ordered = sorted(ids)
    labels = labels or {}
    ntax = len(ordered)
    lines = [
        "#NEXUS",
        "[Distance matrix calculated by bigsdb_spark"
        + (f" ({comment})" if comment else "")
        + "]",
        "[Jolley & Maiden 2010 BMC Bioinformatics 11:595]",
        "",
        "BEGIN taxa;",
        f"   DIMENSIONS ntax = {ntax};",
        "",
        "END;",
        "",
        "BEGIN distances;",
        f"   DIMENSIONS ntax = {ntax};",
        "   FORMAT",
        "      triangle=LOWER",
        "      diagonal",
        "      labels",
        "      missing=?",
        "   ;",
        "MATRIX",
    ]
    for i, a in enumerate(ordered):
        cells = [str(labels.get(a, a))]
        for j in range(i + 1):
            b = ordered[j]
            if a == b:
                cells.append("0")
            else:
                d = dist.get((a, b))
                cells.append("?" if d is None else str(d))
        lines.append("\t".join(cells))
    lines.append("   ;")
    lines.append("END;")
    return "\n".join(lines) + "\n"


def to_grapetree_profiles(
    profiles: DataFrame,
    loci: list[str],
    id_col: str = "profile_key",
    profile_col: str = "profile",
) -> str:
    """D8: GrapeTree/MSTree profile file
    (GrapeTree.pm:324-380 generate_profile_file): header
    ``#isolate<TAB>locus...``, one row per isolate, missing designations
    as ``-``, incomplete as ``I``, multi-designations take the lowest
    (first) value. Raises when every profile is identical — GrapeTree
    cannot build a tree from one point (the reference throws the same
    way, :382-388).
    """
    rows = profiles.select(id_col, profile_col).orderBy(id_col).collect()
    out = ["#isolate\t" + "\t".join(loci)]
    seen = set()
    for r in rows:
        vals = []
        for v in list(r[1])[: len(loci)]:
            if v is None or v == "missing":
                v = "-"
            elif v == "incomplete":
                v = "I"
            elif isinstance(v, str) and ";" in v:
                v = v.split(";")[0]
            vals.append(str(v))
        while len(vals) < len(loci):
            vals.append("-")
        seen.add(tuple(vals))
        out.append(str(r[0]) + "\t" + "\t".join(vals))
    if len(rows) > 1 and len(seen) <= 1:
        raise ValueError(
            "All isolates are identical at selected loci. Cannot generate tree."
        )
    return "\n".join(out) + "\n"
