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
