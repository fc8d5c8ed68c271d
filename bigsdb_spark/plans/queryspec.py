"""QuerySpec → DataFrame composer (SURVEY §3.1).

The reference builds ONE SQL string through a 13-stage builder chain
(IsolateQueryPage.pm:2085-2128: provenance → EAV → list → filters →
designations → counts → tags → seqbin → ... → ORDER BY + paging). Here
the IR is a typed QuerySpec and each stage is a pure
``DataFrame -> DataFrame`` function; the composition is declarative, so
Catalyst gets the whole plan (pushdown, pruning, join reordering) —
nothing is stringly-typed.

Stable pagination keeps the reference's deterministic tiebreak
(IsolateQueryPage.pm:2120-2128 appends id, datestamp): without it,
LIMIT/OFFSET pages are not reproducible on a distributed engine either.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigsdb_spark.predicates import build_predicate


@dataclass
class FormRow:
    """One (field, operator, value) query-form row."""

    field: str
    op: str
    value: object
    is_array: bool = False


@dataclass
class QuerySpec:
    rows: list[FormRow] = field(default_factory=list)
    combinator: str = "AND"  # AND/OR across form rows (one per fieldset)
    id_list: list | None = None  # P10 paste-list semi-join values
    id_col: str = "id"
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (col, asc)
    tiebreak: list[str] = field(default_factory=list)
    offset: int = 0
    limit: int | None = None
    select: list[str] | None = None


def _combine(preds: list[Column], combinator: str) -> Column:
    if combinator not in ("AND", "OR"):
        raise ValueError(f"combinator must be AND or OR, got {combinator!r}")
    out = preds[0]
    for p in preds[1:]:
        out = (out & p) if combinator == "AND" else (out | p)
    return out


def apply_form_rows(df: DataFrame, spec: QuerySpec) -> DataFrame:
    if not spec.rows:
        return df
    preds = [
        build_predicate(F.col(r.field), r.op, r.value, r.is_array) for r in spec.rows
    ]
    return df.filter(_combine(preds, spec.combinator))


def apply_id_list(df: DataFrame, spec: QuerySpec) -> DataFrame:
    """P10: paste-list semi-join. A literal list becomes a broadcast
    DataFrame, not a giant IN (the reference builds an indexed temp
    table for the same reason, Datastore.pm:2333)."""
    if not spec.id_list:
        return df
    spark = df.sparkSession
    lst = spark.createDataFrame([(v,) for v in spec.id_list], [spec.id_col])
    return df.join(F.broadcast(lst), on=spec.id_col, how="left_semi")


def apply_order_page(df: DataFrame, spec: QuerySpec) -> DataFrame:
    """Ordering + paging with a GUARANTEED total order: the id column is
    always appended as the final tiebreak (the reference appends the
    primary key the same way, IsolateQueryPage.pm:2120-2128) — without
    it, ties at page boundaries make offset/limit non-reproducible
    across shuffles."""
    if spec.order_by or spec.tiebreak or spec.offset or spec.limit is not None:
        cols = [
            (F.col(c).asc() if asc else F.col(c).desc()) for c, asc in spec.order_by
        ] + [F.col(c).asc() for c in spec.tiebreak]
        named = [c for c, _ in spec.order_by] + list(spec.tiebreak)
        if spec.id_col not in named and spec.id_col in df.columns:
            cols.append(F.col(spec.id_col).asc())
        if cols:
            df = df.orderBy(*cols)
        elif spec.offset or spec.limit is not None:
            # paging over an unordered frame is nondeterministic across
            # shuffles (pages overlap / skip rows) — the exact failure
            # the docstring's total-order guarantee exists to prevent;
            # refuse rather than silently degrade
            raise ValueError(
                "cannot page without a total order: spec has no "
                f"order_by/tiebreak and the view has no {spec.id_col!r} "
                "column"
            )
    if spec.offset:
        df = df.offset(spec.offset)
    if spec.limit is not None:
        df = df.limit(spec.limit)
    return df


def run_query(view: DataFrame, spec: QuerySpec) -> DataFrame:
    """The full pipeline over a role-filtered view (S1)."""
    df = apply_form_rows(view, spec)
    df = apply_id_list(df, spec)
    df = apply_order_page(df, spec)
    if spec.select:
        df = df.select(*spec.select)
    return df
