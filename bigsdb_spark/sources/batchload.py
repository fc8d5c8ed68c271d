"""CSV/TSV batch loader with validation (SURVEY §2.1 S3).

The reference's curator batch-add (CurateBatchAddPage.pm, 2185 LoC of
row-at-a-time Perl validation) becomes: spark.read.csv with the
registry schema, one vectorized validation pass, and a (valid, invalid)
split — invalid rows carry their error list for the curation UI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigsdb_spark.registry import TableDef, with_validation


def batch_load_csv(
    spark: SparkSession,
    path: str,
    table: TableDef,
    sep: str = "\t",
) -> tuple[DataFrame, DataFrame]:
    """Returns (valid_rows, invalid_rows_with_errors). Header names must
    match the registry field names; extra columns are rejected the way
    the reference's header check does (SubmissionHandler)."""
    raw = spark.read.option("header", True).option("sep", sep).csv(path)
    known = {f.name for f in table.fields}
    extra = [c for c in raw.columns if c not in known]
    if extra:
        raise ValueError(f"unknown columns in upload: {extra}")
    # try_cast to registry types: malformed values become NULL and trip
    # the 'required' rule rather than crashing the load (ANSI-mode cast
    # would throw on the first bad cell). Registry columns absent from
    # the upload become typed NULL literals so a missing required column
    # surfaces as a per-row validation error — the reference's header
    # check reports missing required columns the same way
    # (SubmissionHandler) — instead of an unresolved-column crash.
    # `multiple` fields arrive as their separator-joined text and are
    # split into arrays here rather than silently dropped.
    def upload_col(f):
        styp = f.spark_type()  # ArrayType(base) when f.multiple
        if f.name not in raw.columns:
            return F.lit(None).cast(styp).alias(f.name)
        if f.multiple:
            # drop empty elements ('2010;;2012' has an empty interior
            # slot meaning "not provided") BEFORE the cast — keeping
            # them would load silent NULL slots that the element-level
            # badcast check below deliberately does not flag
            return F.transform(
                F.filter(
                    F.split(F.col(f.name), ";"), lambda v: F.trim(v) != ""
                ),
                lambda v: F.trim(v).try_cast(styp.elementType),
            ).alias(f.name)
        return F.col(f.name).try_cast(styp).alias(f.name)

    # a malformed value in ANY typed field is a validation error, not a
    # silent NULL — the reference's check_format flags wrong-format
    # values whether or not the field is required. try_cast gives NULL;
    # the raw cell being non-empty is what distinguishes "bad format"
    # from "not provided".
    badcasts: list = []
    for f in table.fields:
        if f.name not in raw.columns or f.type == "text":
            continue
        raw_c = F.col(f.name)
        if f.multiple:
            # element-level check: any non-empty element of the
            # separator-joined cell that fails the cast is a bad value
            # (upload_col would otherwise load it as a silent NULL slot)
            elem_t = f.spark_type().elementType
            badcasts.append(
                F.when(
                    raw_c.isNotNull()
                    & F.exists(
                        F.split(raw_c, ";"),
                        lambda v: (F.trim(v) != "")
                        & F.trim(v).try_cast(elem_t).isNull(),
                    ),
                    F.lit(f"{f.name}: invalid {f.type}"),
                ).otherwise(F.lit(None))
            )
        else:
            badcasts.append(
                F.when(
                    raw_c.isNotNull()
                    & (F.trim(raw_c) != "")
                    & raw_c.try_cast(f.spark_type()).isNull(),
                    F.lit(f"{f.name}: invalid {f.type}"),
                ).otherwise(F.lit(None))
            )
    badcast_col = (
        F.array_compact(F.array(*badcasts)) if badcasts
        else F.array().cast("array<string>")
    )
    typed = raw.select(
        *[upload_col(f) for f in table.fields], badcast_col.alias("_badcast")
    )
    # single flagged pass, then split on the error list — an anti-join
    # split would lose rows whose key is NULL (null-unsafe equality)
    flagged = with_validation(typed, table).withColumn(
        "errors", F.concat(F.col("errors"), F.col("_badcast"))
    ).drop("_badcast")
    valid = flagged.filter(F.size("errors") == 0).drop("errors")
    invalid = flagged.filter(F.size("errors") > 0)
    return valid, invalid
