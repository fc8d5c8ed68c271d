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


class NotFound(ValueError):
    """Maps to HTTP 404 — unknown isolate/scheme id
    (REST/Interface.pm check_isolate_is_valid error shape)."""


def route_isolates_list(
    view,
    base: str,
    page: int = 1,
    page_size: int = 100,
    id_col: str = "id",
    date_entered_col: str | None = None,
    datestamp_col: str | None = None,
) -> dict:
    """GET /db/:db/isolates (REST/Routes/Isolates.pm:41-66
    _get_isolates): count + max dates in ONE aggregate pass over the
    role-filtered view, then the page of ids ordered by id with
    offset/limit, returned as record URIs under the paging envelope.
    """
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("_n")]
    if date_entered_col and date_entered_col in view.columns:
        aggs.append(F.max(date_entered_col).alias("_added"))
    if datestamp_col and datestamp_col in view.columns:
        aggs.append(F.max(datestamp_col).alias("_updated"))
    head = view.agg(*aggs).collect()[0]
    total = head["_n"]
    values: dict = {"records": int(total)}
    if date_entered_col and date_entered_col in view.columns and head["_added"]:
        values["last_added"] = str(head["_added"])
    if datestamp_col and datestamp_col in view.columns and head["_updated"]:
        values["last_updated"] = str(head["_updated"])
    ids = (
        view.select(id_col)
        .orderBy(id_col)
        .offset((page - 1) * page_size)
        .limit(page_size)
        .collect()
    )
    values["paging"] = paging_links(page, page_size, int(total))
    values["isolates"] = [f"{base}/isolates/{r[0]}" for r in ids]
    return values


def route_isolate_record(
    view,
    table: TableDef,
    isolate_id,
    base: str,
    seqbin_stats=None,
    designations=None,
    id_col: str = "id",
) -> dict:
    """GET /db/:db/isolates/:id (REST/Routes/Isolates.pm:115-204
    _get_isolate): provenance from the view row (int fields as ints,
    sender/curator as user URIs, NULLs omitted), seqbin summary from
    the stats frame, designation count + sub-resource links. Unknown
    id -> NotFound (the reference's 404)."""
    from pyspark.sql import functions as F

    rows = view.filter(F.col(id_col) == isolate_id).limit(1).collect()
    if not rows:
        raise NotFound(f"isolate {isolate_id} does not exist")
    row = rows[0].asDict()
    provenance: dict = {}
    for f in table.fields:
        if f.name not in row or row[f.name] is None:
            continue
        if f.name in ("sender", "curator"):
            provenance[f.name] = f"{base}/users/{row[f.name]}"
        elif f.type == "int":
            provenance[f.name] = int(row[f.name])
        else:
            provenance[f.name] = row[f.name]
    values: dict = {"provenance": provenance}
    if seqbin_stats is not None:
        sb = (
            seqbin_stats.filter(F.col("isolate_id") == isolate_id)
            .limit(1)
            .collect()
        )
        if sb:
            s = sb[0].asDict()
            seqbin = {
                "contig_count": int(s["contigs"]),
                "total_length": int(s["total_length"]),
                "contigs": f"{base}/isolates/{isolate_id}/contigs",
                "contigs_fasta": f"{base}/isolates/{isolate_id}/contigs_fasta",
            }
            if s.get("n50") is not None:
                seqbin["N50"] = int(s["n50"])
            if s.get("l50") is not None:
                seqbin["L50"] = int(s["l50"])
            values["sequence_bin"] = seqbin
    if designations is not None:
        n = designations.filter(F.col("isolate_id") == isolate_id).count()
        if n:
            values["allele_designations"] = {
                "designation_count": int(n),
                "full_designations": (
                    f"{base}/isolates/{isolate_id}/allele_designations"
                ),
                "allele_ids": f"{base}/isolates/{isolate_id}/allele_ids",
            }
    return values


def route_fields(table: TableDef, base: str) -> list[dict]:
    """GET /db/:db/fields (REST/Routes/Fields.pm:39-67 _get_fields):
    one entry per registry field with type/required/min/max/regex,
    allowed_values for optlists, and values/breakdown URIs."""
    out = []
    for f in table.fields:
        entry: dict = {
            "name": f.name,
            "type": f.type,
            "required": bool(f.required),
        }
        if f.min is not None:
            entry["min"] = int(f.min) if f.type == "int" else f.min
        if f.max is not None:
            entry["max"] = int(f.max) if f.type == "int" else f.max
        if f.regex:
            entry["regex"] = f.regex
        if f.optlist:
            entry["allowed_values"] = list(f.optlist)
        entry["values"] = f"{base}/fields/{f.name}"
        entry["breakdown"] = f"{base}/fields/{f.name}/breakdown"
        out.append(entry)
    return out


def route_scheme(
    scheme_id: int,
    description: str,
    loci: list[str],
    base: str,
    profiles=None,
) -> dict:
    """GET /db/:db/schemes/:id (REST/Routes/Schemes.pm shape): scheme
    description, locus count + locus URIs, and the profile count when a
    profiles frame is supplied."""
    values: dict = {
        "id": int(scheme_id),
        "description": description,
        "locus_count": len(loci),
        "loci": [f"{base}/loci/{locus}" for locus in sorted(loci)],
    }
    if profiles is not None:
        values["profile_count"] = profiles.count()
        values["profiles"] = f"{base}/schemes/{scheme_id}/profiles"
    return values


def route_genomes_list(
    view,
    seqbin_stats,
    base: str,
    page: int = 1,
    page_size: int = 100,
    min_genome_size: int = 1_000_000,
    id_col: str = "id",
    date_entered_col: str | None = None,
    datestamp_col: str | None = None,
) -> dict:
    """GET /db/:db/genomes (REST/Routes/Isolates.pm:73-113
    _get_genomes): the isolates route restricted to records whose
    sequence bin reaches the minimum genome size (default
    MIN_GENOME_SIZE = 1 Mbp, Constants.pm:42-43) — one semi-join
    against the seqbin stats frame, then the same count/paging/links
    envelope."""
    from pyspark.sql import functions as F

    big_enough = seqbin_stats.filter(
        F.col("total_length") >= min_genome_size
    ).select(F.col("isolate_id").alias(id_col)).distinct()
    genomes = view.join(big_enough, on=id_col, how="left_semi")
    return route_isolates_list(
        genomes,
        base,
        page=page,
        page_size=page_size,
        id_col=id_col,
        date_entered_col=date_entered_col,
        datestamp_col=datestamp_col,
    )
