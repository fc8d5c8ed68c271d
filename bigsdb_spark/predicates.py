"""The BIGSdb query-form predicate algebra (SURVEY §2.2, P1-P13).

The reference exposes exactly ten operators —
``= contains 'starts with' 'ends with' > >= < <= NOT 'NOT contain'``
(reference lib/BIGSdb/Constants.pm:242) — with three semantics that
differ from plain SQL and are easy to get subtly wrong:

1. **Case-insensitive everything** for text: ``=`` is
   ``UPPER(f)=UPPER(v)`` (IsolateQueryPage.pm:2471-2532).
2. **Null-inclusive negation**: ``NOT`` counts NULL as a non-match, i.e.
   ``(NOT match OR f IS NULL)`` — deliberately different from SQL
   three-valued logic (IsolateQueryPage.pm:2329-2332).
3. **The literal string 'null'** means IS NULL for ``=``
   (IsolateQueryPage.pm:2496-2500).

Array (multi-valued) fields match if ANY element matches
(``v ILIKE ANY(f)``); ordered comparison on arrays is
``exists(f, x -> x <op> v)`` (IsolateQueryPage.pm:2506-2637).

Every function here is a pure Column -> Column builder, so the composed
predicate stays inside Catalyst (whole-stage codegen; no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

OPERATORS = (
    "=",
    "contains",
    "starts with",
    "ends with",
    ">",
    ">=",
    "<",
    "<=",
    "NOT",
    "NOT contain",
)


def is_valid_operator(op: str) -> bool:
    """Operator whitelist (reference QueryPage.pm:237)."""
    return op in OPERATORS


def ci_equals(col: Column, value: str) -> Column:
    """P1: case-insensitive equality; the literal 'null' means IS NULL."""
    if isinstance(value, str) and value.lower() == "null":
        return col.isNull()
    return F.upper(col.cast("string")) == F.upper(F.lit(str(value)))


def ci_equals_any(col: Column, value: str) -> Column:
    """P1 on an array column: value matches ANY element (ILIKE ANY);
    the 'null' keyword means the field has NO value (NULL array or no
    elements), mirroring the scalar path."""
    if isinstance(value, str) and value.lower() == "null":
        return col.isNull() | (F.size(col) == 0)
    v = F.upper(F.lit(str(value)))
    return F.exists(col, lambda x: F.upper(x.cast("string")) == v)


def null_inclusive_not(match: Column, col: Column) -> Column:
    """P2: negation that also keeps NULL rows (NOT ... OR f IS NULL).

    SQL three-valued logic drops NULL rows from both a predicate and its
    negation; BIGSdb's NOT deliberately keeps them.
    """
    return (~match) | col.isNull()


def ci_contains(col: Column, value: str) -> Column:
    """P3: case-insensitive substring (ILIKE '%v%'); non-text via CAST."""
    return F.upper(col.cast("string")).contains(F.upper(F.lit(str(value))))


def ci_starts_with(col: Column, value: str) -> Column:
    """P4: ILIKE 'v%'."""
    return F.upper(col.cast("string")).startswith(str(value).upper())


def ci_ends_with(col: Column, value: str) -> Column:
    """P4: ILIKE '%v'."""
    return F.upper(col.cast("string")).endswith(str(value).upper())


def typed_compare(col: Column, op: str, value) -> Column:
    """P5: >, >=, <, <= typed comparison (text compares lexically)."""
    lit = F.lit(value)
    if op == ">":
        return col > lit
    if op == ">=":
        return col >= lit
    if op == "<":
        return col < lit
    if op == "<=":
        return col <= lit
    raise ValueError(f"not an ordered comparison operator: {op}")


def array_compare_any(col: Column, op: str, value) -> Column:
    """P5 on arrays: true if ANY element satisfies the comparison."""
    return F.exists(col, lambda x: typed_compare(x, op, value))


def grouped_field_query(cols: list[Column], value: str) -> Column:
    """P6: one search term ORed over every field in a field group
    (IsolateQueryPage.pm:2374-2470)."""
    pred = F.lit(False)
    for c in cols:
        pred = pred | ci_contains(c, value)
    return pred


def match_with_aliases(df, aliases, name_col: str, id_col: str, term: str):
    """P1 labelfield semantics: the isolate-name search also matches the
    aliases table (IsolateQueryPage.pm:2471-2532 ORs an aliases
    subquery into the '=' branch). ``aliases``: (isolate_id, alias).
    Returns rows of ``df`` whose name OR any alias equals the term,
    case-insensitively."""
    from pyspark.sql import functions as F

    direct = df.filter(ci_equals(F.col(name_col), term))
    via_alias = df.join(
        F.broadcast(
            aliases.filter(ci_equals(F.col("alias"), term)).select(
                F.col("isolate_id").alias(id_col)
            )
        ).distinct(),
        on=id_col,
        how="left_semi",
    )
    return direct.unionByName(via_alias).distinct()


def build_predicate(col: Column, op: str, value, is_array: bool = False) -> Column:
    """Dispatch one (field, operator, value) form row to its Column
    predicate — the Spark analogue of the reference's
    ``_provenance_*_type_operator`` family (IsolateQueryPage.pm:2471-2637).
    """
    if not is_valid_operator(op):
        raise ValueError(f"invalid operator: {op}")
    if op == "=":
        return ci_equals_any(col, value) if is_array else ci_equals(col, value)
    if op == "NOT":
        # 'NOT null' means the field HAS a value — routing it through
        # null_inclusive_not would OR isNull back in (a tautology)
        if isinstance(value, str) and str(value).lower() == "null":
            if is_array:
                return col.isNotNull() & (F.size(col) > 0)
            return col.isNotNull()
        m = ci_equals_any(col, value) if is_array else ci_equals(col, value)
        return null_inclusive_not(m, col)
    if op == "contains":
        if is_array:
            return F.exists(col, lambda x: ci_contains(x, value))
        return ci_contains(col, value)
    if op == "NOT contain":
        if is_array:
            m = F.exists(col, lambda x: ci_contains(x, value))
        else:
            m = ci_contains(col, value)
        return null_inclusive_not(m, col)
    if op == "starts with":
        if is_array:
            return F.exists(col, lambda x: ci_starts_with(x, value))
        return ci_starts_with(col, value)
    if op == "ends with":
        if is_array:
            return F.exists(col, lambda x: ci_ends_with(x, value))
        return ci_ends_with(col, value)
    if is_array:
        return array_compare_any(col, op, value)
    return typed_compare(col, op, value)
