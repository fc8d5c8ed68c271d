"""REST search-request parser (SURVEY §3.2).

The reference's POST /db/:db/isolates/search accepts a flat JSON object
with category-prefixed keys — ``field.country``, ``locus.abcZ``,
``scheme.1.ST`` — plus paging params, validates operators against the
whitelist and returns typed 400s on unknown fields
(REST/Routes/Isolates.pm:475-724). This module parses the same shape
into a QuerySpec; the composer does the rest.

Value forms: scalar (implies '='), or {"operator": ">", "value": 2015}.
"""

from __future__ import annotations

from dataclasses import dataclass

from bigsdb_spark.plans.queryspec import FormRow, QuerySpec
from bigsdb_spark.predicates import is_valid_operator
from bigsdb_spark.registry import TableDef


class BadRequest(ValueError):
    """Maps to HTTP 400 — unknown field / invalid operator / bad type
    (REST/Interface.pm error shape)."""


@dataclass
class RestQuery:
    spec: QuerySpec
    locus_filters: list[FormRow]
    scheme_filters: list[tuple[int, FormRow]]


def parse_search(
    body: dict,
    table: TableDef,
    page_size_default: int = 100,
    max_page_size: int = 1000,
) -> RestQuery:
    rows: list[FormRow] = []
    locus_rows: list[FormRow] = []
    scheme_rows: list[tuple[int, FormRow]] = []
    for key, raw in body.items():
        if key in ("page", "page_size", "sort", "combinator"):
            continue
        if isinstance(raw, dict):
            op = raw.get("operator", "=")
            value = raw.get("value")
        else:
            op, value = "=", raw
        if not is_valid_operator(op):
            raise BadRequest(f"invalid operator: {op}")
        if value is None:
            # JSON null / absent value: a typed 400, NOT a predicate —
            # str(None) would otherwise match the literal text 'None'.
            # (The reference's null search is the string keyword 'null'.)
            raise BadRequest(f"missing value for: {key}")
        parts = key.split(".")
        if parts[0] == "field" and len(parts) == 2:
            try:
                fdef = table.field(parts[1])
            except KeyError:
                raise BadRequest(f"unknown field: {parts[1]}") from None
            rows.append(FormRow(fdef.name, op, value, is_array=fdef.multiple))
        elif parts[0] == "locus" and len(parts) == 2:
            locus_rows.append(FormRow(parts[1], op, value))
        elif parts[0] == "scheme" and len(parts) == 3:
            try:
                scheme_id = int(parts[1])
            except ValueError:
                raise BadRequest(f"bad scheme id: {parts[1]}") from None
            scheme_rows.append((scheme_id, FormRow(parts[2], op, value)))
        else:
            raise BadRequest(f"unknown search category: {key}")

    def _int_param(name: str, default: int) -> int:
        v = body.get(name, default)
        # strict: JSON booleans and floats are NOT paging integers
        # (int(True) -> 1 and int(2.9) -> 2 would silently coerce)
        if isinstance(v, bool) or not isinstance(v, int):
            raise BadRequest("page and page_size must be integers")
        return v

    page = _int_param("page", 1)
    page_size = min(_int_param("page_size", page_size_default), max_page_size)
    if page < 1 or page_size < 1:
        raise BadRequest("page and page_size must be >= 1")
    order = body.get("sort", "id")
    if not isinstance(order, str):
        raise BadRequest(f"bad sort: {order!r}")
    descending = order.startswith("-")
    order_field = order.lstrip("-")
    # order-by whitelist (X11): unknown sort columns are a typed 400
    # here, not an AnalysisException deep inside the composer
    if order_field not in ("id", "datestamp"):
        try:
            table.field(order_field)
        except KeyError:
            raise BadRequest(f"unknown sort field: {order_field}") from None
    spec = QuerySpec(
        rows=rows,
        combinator=str(body.get("combinator", "AND")).upper(),
        order_by=[(order_field, not descending)],
        tiebreak=["id"] if order_field != "id" else [],
        offset=(page - 1) * page_size,
        limit=page_size,
    )
    if spec.combinator not in ("AND", "OR"):
        raise BadRequest(f"bad combinator: {spec.combinator}")
    return RestQuery(spec=spec, locus_filters=locus_rows, scheme_filters=scheme_rows)


def paging_links(page: int, page_size: int, total: int) -> dict:
    """The reference's paging envelope (REST/Interface.pm:687
    get_paging)."""
    last = max(1, -(-total // page_size))
    links = {"records": total, "page": page, "pages": last}
    if page > 1:
        links["previous"] = page - 1
    if page < last:
        links["next"] = page + 1
    return links
