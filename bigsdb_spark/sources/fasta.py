"""FASTA reader/writer (SURVEY §2.1 S2, §2.8 F7).

The reference parses FASTA driver-side in Perl (Utils.pm:270
read_fasta). For lakehouse-scale inputs we read the file distributed:
``spark.read.text`` + a delimiter trick — records are split on '>' so
one DataFrame row per sequence, parsed with expressions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """Distributed FASTA parse -> (seq_id, description, sequence)."""
    raw = spark.read.text(path, lineSep=">")
    rec = raw.filter(F.trim("value") != "")
    # strip '\r' explicitly: CRLF files leave it on the header line and
    # F.trim removes only spaces, so a bare-id header would yield
    # 'id\r' and silently join-match nothing downstream
    header = F.regexp_replace(
        F.substring_index(F.col("value"), "\n", 1), "\r", ""
    )
    body = F.expr("substring(value, length(substring_index(value, '\n', 1)) + 2)")
    return rec.select(
        F.substring_index(F.trim(header), " ", 1).alias("seq_id"),
        F.trim(header).alias("description"),
        F.upper(F.regexp_replace(body, r"\s", "")).alias("sequence"),
    ).filter(F.col("sequence") != "")


def to_fasta(df: DataFrame, id_col: str, seq_col: str, width: int = 60) -> DataFrame:
    """F7: format rows as FASTA records (one string column 'fasta').
    The (?!$) guard skips the final wrap boundary so a sequence whose
    length is an exact multiple of ``width`` does not end in a blank
    line (strict FASTA consumers reject those)."""
    wrapped = F.regexp_replace(F.col(seq_col), f"(.{{{width}}})(?!$)", "$1\n")
    return df.select(
        F.concat(F.lit(">"), F.col(id_col).cast("string"), F.lit("\n"), wrapped).alias(
            "fasta"
        )
    )
