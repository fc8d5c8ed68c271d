"""QuerySpec composer: predicate composition, list semi-join, and the
metamorphic pagination property (union of all pages == unpaged result;
SURVEY §5 test plan #4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigsdb_spark.plans.queryspec import FormRow, QuerySpec, run_query


@pytest.fixture(scope="module")
def view(spark):
    rows = [(i, f"iso-{i}", "France" if i % 3 == 0 else "Spain", 2000 + i % 10)
            for i in range(1, 101)]
    return spark.createDataFrame(rows, "id int, isolate string, country string, year int")


def test_composed_filters(view):
    spec = QuerySpec(
        rows=[FormRow("country", "=", "france"), FormRow("year", ">=", 2005)],
        combinator="AND",
    )
    got = run_query(view, spec).collect()
    assert all(r.country == "France" and r.year >= 2005 for r in got)
    assert len(got) > 0


def test_or_combinator(view):
    spec = QuerySpec(
        rows=[FormRow("year", "=", "2001"), FormRow("year", "=", "2002")],
        combinator="OR",
    )
    assert {r.year for r in run_query(view, spec).collect()} == {2001, 2002}


def test_id_list_semijoin(view):
    spec = QuerySpec(id_list=[5, 10, 15], id_col="id")
    assert sorted(r.id for r in run_query(view, spec).collect()) == [5, 10, 15]


def test_pagination_metamorphic(view):
    """Union of all pages == unpaged result, no dup/loss — holds only
    under the deterministic tiebreak (reference X5)."""
    base = QuerySpec(order_by=[("year", True)], tiebreak=["id"])
    unpaged = [r.id for r in run_query(view, base).collect()]
    paged = []
    page_size = 17
    for off in range(0, 120, page_size):
        spec = QuerySpec(
            order_by=[("year", True)], tiebreak=["id"], offset=off, limit=page_size
        )
        paged.extend(r.id for r in run_query(view, spec).collect())
    assert paged == unpaged


def test_pagination_total_order_is_implicit(spark):
    """Regression: offset/limit always get the id tiebreak appended, so
    tied sort keys cannot produce overlapping/dropped pages."""
    from bigsdb_spark.plans.queryspec import QuerySpec, apply_order_page

    df = spark.createDataFrame(
        [(i, 2000) for i in range(50)], "id int, year int"
    ).repartition(8)
    page1 = apply_order_page(df, QuerySpec(order_by=[("year", True)], limit=20))
    page2 = apply_order_page(
        df, QuerySpec(order_by=[("year", True)], offset=20, limit=20)
    )
    ids1 = [r.id for r in page1.collect()]
    ids2 = [r.id for r in page2.collect()]
    assert ids1 == list(range(20)) and ids2 == list(range(20, 40))

    import pytest as _pytest
    from bigsdb_spark.plans.queryspec import _combine
    from pyspark.sql import functions as F
    with _pytest.raises(ValueError):
        _combine([F.lit(True)] * 2, "and")


def test_pagination_refuses_unordered_frames(spark):
    """Paging a view with no order columns and no id column would be
    nondeterministic across shuffles — a typed error, not silent
    wrong pages."""
    from bigsdb_spark.plans.queryspec import QuerySpec, apply_order_page

    df = spark.createDataFrame([(2000,), (2001,)], "year int")  # no 'id'
    with pytest.raises(ValueError, match="total order"):
        apply_order_page(df, QuerySpec(offset=1, limit=1))


def test_count_predicate_keeps_entity_id_column(spark):
    """An entities frame whose key is literally named 'entity_id' must
    survive with_count_predicate (drop('entity_id') would delete every
    column of that name, including the caller's key)."""
    from bigsdb_spark.operators.counts import with_count_predicate

    entities = spark.createDataFrame(
        [(1, "a"), (2, "b")], "entity_id int, name string"
    )
    fact = spark.createDataFrame([(1,), (1,), (2,)], "eid int")
    got = with_count_predicate(entities, fact, "entity_id", "eid", ">=", 2)
    assert set(got.columns) == {"entity_id", "name", "n"}
    rows = got.collect()
    assert len(rows) == 1 and rows[0].entity_id == 1 and rows[0].n == 2
