"""Breakdown / crosstab / combination aggregations (SURVEY §2.4 A1-A4).

The reference computes these with generated GROUP BY SQL
(Plugins/FieldBreakdown.pm:851-1008, Plugins/TwoFieldBreakdown.pm:466,
DataExplorerPage.pm:218, DashboardPage.pm) — all map-side-combinable
group-bys in Spark: one shuffle on the grouping key, partial aggregation
before the exchange, so they scale linearly with input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def field_frequency(df: DataFrame, field: str, label: str = "label") -> DataFrame:
    """A1: value frequency breakdown — GROUP BY field, COUNT(*)."""
    return df.groupBy(F.col(field).alias(label)).agg(F.count(F.lit(1)).alias("n"))


def crosstab_pct(df: DataFrame, f1: str, f2: str) -> DataFrame:
    """A2: two-field contingency table with row / dataset percentages
    (TwoFieldBreakdown.pm:466 computes the same hash-of-hashes in Perl).

    Long form (f1, f2, n, pct_row, pct_total) rather than a pivoted wide
    table: at scale the wide pivot needs a distinct-values pass and makes
    the schema data-dependent; the long form is one shuffle and feeds the
    same UI. Percentages are windows over the counted result (tiny), not
    over the input.
    """
    counts = df.groupBy(f1, f2).agg(F.count(F.lit(1)).alias("n"))
    w_row = Window.partitionBy(f1)
    w_all = Window.partitionBy()
    return counts.select(
        f1,
        f2,
        "n",
        F.round(F.col("n") * 100.0 / F.sum("n").over(w_row), 4).alias("pct_row"),
        F.round(F.col("n") * 100.0 / F.sum("n").over(w_all), 4).alias("pct_total"),
    )


def crosstab_wide(df: DataFrame, f1: str, f2: str, values: list | None = None) -> DataFrame:
    """A2 wide form: one row per f1 value, one column per f2 value
    (df.groupBy(f1).pivot(f2)). Pass ``values`` at scale to skip the
    distinct-values discovery pass and keep the schema stable."""
    piv = df.groupBy(f1).pivot(f2, values) if values else df.groupBy(f1).pivot(f2)
    out = piv.count()
    # fill only the pivoted count columns — a blanket na.fill(0) would
    # also rewrite a NULL group key in a numeric f1 to 0, merging the
    # null group with a genuine f1=0 group
    return out.na.fill(0, subset=[c for c in out.columns if c != f1])


def combination_counts(
    df: DataFrame, fields: list[str], rollup: bool = False, null_label: str = "<blank>"
) -> DataFrame:
    """A3: multi-field combination counts (Data Explorer), optionally with
    the drill-down hierarchy as a ROLLUP. The reference COALESCEs NULLs to
    a display label (DataExplorerPage.pm:286); we do the same so grouping
    NULLs and rollup NULLs stay distinguishable."""
    cols = [F.coalesce(F.col(f).cast("string"), F.lit(null_label)).alias(f) for f in fields]
    base = df.select(*cols)
    grouped = base.rollup(*fields) if rollup else base.groupBy(*fields)
    out = grouped.agg(F.count(F.lit(1)).alias("n"))
    if rollup:
        # rollup super-aggregate rows have real NULLs; label them too
        out = out.select(
            *[F.coalesce(F.col(f), F.lit("<all>")).alias(f) for f in fields], "n"
        )
    return out


def histogram(df: DataFrame, col: str, bin_width: float) -> DataFrame:
    """A4: dashboard histogram — floor(col / width) bucketing
    (DashboardPage.pm:1524 builds the same ranges in SQL CASEs)."""
    bin_col = F.floor(F.col(col) / F.lit(bin_width)).cast("long").alias("bin")
    return (
        df.select(bin_col)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("bin", (F.col("bin") * F.lit(bin_width)).alias("bin_start"), "n")
    )


def top_n(df: DataFrame, order: list[Column], n: int) -> DataFrame:
    """W1: deterministic top-N (callers must pass a tiebreak column)."""
    return df.orderBy(*order).limit(n)


def explore_hierarchy(
    df: DataFrame, fields: list[str], max_rows: int = 50_000, offset: int = 0
) -> dict:
    """Data Explorer drill-down tree (DataExplorerPage.pm:79-157
    _create_hierarchy/_populate_node over the multi-field frequency
    table of :218-305 _create_freq_table): nested nodes
    {field, value, count, children} where each level's count sums its
    descendants, root count = total records.

    The distributed part is ONE groupBy over the selected fields (the
    reference builds a TEMP freqs table the same way); the tree
    assembly is a driver-side fold over that bounded frequency table
    (its size is the product of the fields' cardinalities, the same
    table the reference pages through).  NULLs render as 'No value'
    like the analysis-field explorer (DataExplorerPage.pm:969).

    The freq pass reuses combination_counts (one NULL-labelling rule
    for explorer + A3), with an internal count alias so a field
    literally named 'count'/'n' cannot collide; sibling lookup during
    the fold is dict-keyed, so the build is O(rows x levels), not
    O(rows x sibling fan-out).

    The driver fold is BOUNDED: the frequency table's size is the
    product of the fields' cardinalities, which two high-cardinality
    fields make arbitrarily large — the reference pages this table, so
    the fold takes the ``max_rows`` highest-count combinations (the
    ones the explorer UI surfaces first) and flags the cut with
    ``root['truncated'] = True``; untruncated trees carry
    ``truncated = False``.  Counts in a truncated tree cover the kept
    combinations only, matching the reference's paged view.

    A capped tree can be CONTINUED rather than re-run (the reference
    pages the drill-down the same way, DataExplorerPage.pm:79-157):
    the frequency frame's (count desc, fields asc) order is total and
    deterministic, so ``offset`` is a stable cursor into it.  A
    truncated page carries ``next_offset``; feed it back to fetch the
    next slice and fold pages together with ``merge_hierarchy`` — the
    paged union reassembles exactly the unpaged tree (pinned in
    tests)."""
    freq_df = combination_counts(df, fields, null_label="No value")
    cnt = "__n" if "n" in fields else "n"
    if cnt != "n":
        freq_df = freq_df.withColumnRenamed("n", cnt)
    # TakeOrderedAndProject: the limit (and cursor offset) ride the
    # sort, so the driver never receives more than max_rows+1 rows
    # however wide the cardinality product is (the +1 detects the cut)
    ordered = freq_df.orderBy(F.desc(cnt), *[F.asc(f) for f in fields])
    if offset:
        ordered = ordered.offset(offset)
    freq = ordered.limit(max_rows + 1).collect()
    truncated = len(freq) > max_rows
    if truncated:
        freq = freq[:max_rows]
    root = {
        "count": 0,
        "children": [],
        "truncated": truncated,
        "offset": offset,
        "next_offset": offset + max_rows if truncated else None,
    }
    index: dict = {}  # path-tuple -> node, O(1) sibling lookup
    for rec in freq:
        root["count"] += rec[cnt]
        nodes = root["children"]
        path = ()
        for level, field in enumerate(fields):
            value = rec[field]
            path = path + (value,)
            hit = index.get(path)
            if hit is None:
                hit = {"field": field, "value": value, "count": 0}
                if level < len(fields) - 1:
                    hit["children"] = []
                nodes.append(hit)
                index[path] = hit
            hit["count"] += rec[cnt]
            nodes = hit.get("children", [])
    return root


def merge_hierarchy(into: dict, page: dict) -> dict:
    """Fold a continuation page (``explore_hierarchy`` with the prior
    page's ``next_offset``) into an accumulated tree, in place.

    Pages partition the count-ordered frequency frame, so every
    (field, value) path's count appears in exactly one page — merging
    sums disjoint contributions, and the union of all pages is exactly
    the unpaged tree.  The merged tree adopts the newest page's cursor
    state (``truncated``/``next_offset``): the fold is complete when
    the last page came back untruncated."""

    def _merge_children(a: list, b: list) -> None:
        index = {(n["field"], n["value"]): n for n in a}
        for n in b:
            hit = index.get((n["field"], n["value"]))
            if hit is None:
                a.append(n)
            else:
                hit["count"] += n["count"]
                if "children" in n:
                    _merge_children(hit.setdefault("children", []), n["children"])

    into["count"] += page["count"]
    _merge_children(into["children"], page["children"])
    into["truncated"] = page["truncated"]
    into["offset"] = page["offset"]
    into["next_offset"] = page["next_offset"]
    return into
