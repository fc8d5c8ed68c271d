"""Declarative schema registry (SURVEY §1.4).

The reference spreads its schema across per-deployment XML
(lib/BIGSdb/Parser.pm — field list + attribute map), a 3099-line
hand-written table-attribute module (lib/BIGSdb/TableAttributes.pm) and
live information_schema checks. Here ONE declarative registry drives:

(a) DataFrame schemas (StructType construction),
(b) the query-surface field catalog (which fields exist, their types,
    whether they are multi-valued arrays),
(c) validation rules — required / regex / min / max / optlist with
    hierarchical sub-values (the reference's validation_rules table,
    sql/isolatedb.sql:1814-1860, and optlist sub-value matching,
    IsolateQueryPage.pm:2534 _get_sub_values).

Field dicts (JSON/TOML-loadable):
    {"name": "country", "type": "text", "required": true,
     "optlist": ["France", "UK [England]", "UK [Scotland]"],
     "multiple": false, "regex": null, "min": null, "max": null}
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_TYPE_MAP: dict[str, DataType] = {
    "int": IntegerType(),
    "bigint": LongType(),
    "float": DoubleType(),
    "text": StringType(),
    "date": DateType(),
    "bool": BooleanType(),
}


@dataclass
class FieldDef:
    name: str
    type: str = "text"
    required: bool = False
    multiple: bool = False
    optlist: list[str] | None = None
    regex: str | None = None
    min: float | None = None
    max: float | None = None

    def spark_type(self) -> DataType:
        base = _TYPE_MAP[self.type]
        return ArrayType(base) if self.multiple else base


@dataclass
class TableDef:
    name: str
    fields: list[FieldDef] = dc_field(default_factory=list)

    def struct_type(self) -> StructType:
        return StructType(
            [
                StructField(f.name, f.spark_type(), nullable=not f.required)
                for f in self.fields
            ]
        )

    def field(self, name: str) -> FieldDef:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)


def load_table_def(spec: dict) -> TableDef:
    return TableDef(
        name=spec["name"],
        fields=[FieldDef(**f) for f in spec.get("fields", [])],
    )


# ------------------------------------------------------------ validation

def with_validation(df: DataFrame, table: TableDef) -> DataFrame:
    """Row-level validation — one pass, one expression per rule, all
    rules evaluated vectorized; returns every row plus an ``errors``
    array column (empty when valid). The reference validates
    row-at-a-time in Perl during batch upload (CurateBatchAddPage.pm,
    check_format QueryPage.pm:293-350)."""
    checks: list[Column] = []
    for f in table.fields:
        col = F.col(f.name)
        if f.required:
            checks.append(
                F.when(col.isNull(), F.lit(f"{f.name}: required")).otherwise(F.lit(None))
            )
        if f.regex and not f.multiple:
            checks.append(
                F.when(
                    col.isNotNull() & ~col.cast("string").rlike(f.regex),
                    F.lit(f"{f.name}: regex"),
                ).otherwise(F.lit(None))
            )
        if f.min is not None:
            # multiple fields: ANY element below the bound fails
            bad = (
                F.exists(col, lambda x: x < f.min) if f.multiple else col < f.min
            )
            checks.append(
                F.when(bad, F.lit(f"{f.name}: below min")).otherwise(F.lit(None))
            )
        if f.max is not None:
            bad = (
                F.exists(col, lambda x: x > f.max) if f.multiple else col > f.max
            )
            checks.append(
                F.when(bad, F.lit(f"{f.name}: above max")).otherwise(F.lit(None))
            )
        if f.optlist and not f.multiple:
            allowed = [v.upper() for v in f.optlist]
            checks.append(
                F.when(
                    col.isNotNull()
                    & ~F.upper(col.cast("string")).isin(*allowed),
                    F.lit(f"{f.name}: not in optlist"),
                ).otherwise(F.lit(None))
            )
    if not checks:
        return df.withColumn("errors", F.array().cast("array<string>"))
    return df.withColumn("errors", F.array_compact(F.array(*checks)))


def validation_errors(df: DataFrame, table: TableDef) -> DataFrame:
    """Only the invalid rows, with their error list."""
    return with_validation(df, table).filter(F.size("errors") > 0)


def optlist_expansion(field_def: FieldDef, value: str) -> list[str]:
    """Hierarchical optlist sub-value expansion: searching 'UK' also
    matches 'UK [England]' (IsolateQueryPage.pm:2534 _get_sub_values)."""
    out = [value]
    for v in field_def.optlist or []:
        if v.upper().startswith(value.upper() + " ["):
            out.append(v)
    return out


def optlist_predicate(field_def: FieldDef, value: str) -> Column:
    """P1 '=' with optlist sub-value semantics: equality against the
    value OR any of its hierarchical sub-values; on a multiple field,
    ANY element may match (casting the array to its string rendering
    would compare '[B, C]' against scalar values and match nothing)."""
    values = [v.upper() for v in optlist_expansion(field_def, value)]
    col = F.col(field_def.name)
    if field_def.multiple:
        return F.exists(col, lambda x: F.upper(x.cast("string")).isin(*values))
    return F.upper(col.cast("string")).isin(*values)
