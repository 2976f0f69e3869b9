"""Query-layer semantics (SURVEY.md §2.12): JSON filter DSL,
ListOptions pagination, point lookup, first, count."""

from __future__ import annotations

import pytest

from etl_rs_spark.plans.filter_dsl import (
    FilterError,
    ListOptions,
    count_query,
    filter_to_column,
    first,
    get_by_id,
    list_query,
)

ROWS = [
    (1, "Jen Donnavan", "ok", 10.0),
    (2, "Mike A", "ok", 25.0),
    (3, "Jen B", "closed", 5.0),
    (4, None, "ok", 50.0),
    (5, "jenny", None, 7.5),
]


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(ROWS, "id int, name string, state string, score double")


def ids(df):
    return sorted(r["id"] for r in df.collect())


def test_eq_shorthand_and_ops(tbl):
    assert ids(tbl.filter(filter_to_column({"state": "ok"}))) == [1, 2, 4]
    assert ids(tbl.filter(filter_to_column({"id": {"$in": [1, 3, 99]}}))) == [1, 3]
    assert ids(tbl.filter(filter_to_column({"score": {"$gte": 10, "$lt": 50}}))) == [1, 2]
    # $contains mirrors agent.rs:128-131 ({"name": {"$contains": "Je"}})
    assert ids(tbl.filter(filter_to_column({"name": {"$contains": "Je"}}))) == [1, 3]
    assert ids(tbl.filter(filter_to_column({"name": {"$containsCi": "JEN"}}))) == [1, 3, 5]
    assert ids(tbl.filter(filter_to_column({"name": {"$startsWith": "Jen"}}))) == [1, 3]
    assert ids(tbl.filter(filter_to_column({"name": {"$null": True}}))) == [4]
    assert ids(tbl.filter(filter_to_column({"state": None}))) == [5]


def test_or_semantics(tbl):
    # list-of-filters = OR (modql Vec<F>)
    assert ids(tbl.filter(filter_to_column([{"id": 1}, {"state": "closed"}]))) == [1, 3]
    assert ids(
        tbl.filter(filter_to_column({"state": "ok", "$or": [{"id": 1}, {"id": 4}]}))
    ) == [1, 4]


def test_like_escaping(spark):
    df = spark.createDataFrame(
        [(1, "100%"), (2, "100x"), (3, "a_b"), (4, "axb")], "id int, s string"
    )
    assert ids(df.filter(filter_to_column({"s": {"$contains": "0%"}}))) == [1]
    assert ids(df.filter(filter_to_column({"s": {"$contains": "_"}}))) == [3]


def test_list_options_order_limit_offset(tbl):
    # '!' prefix = descending (modql order_bys convention)
    out = list_query(tbl, None, ListOptions(limit=2, order_bys=["!score"]))
    assert [r["id"] for r in out.collect()] == [4, 2]
    out = list_query(tbl, None, ListOptions(limit=2, offset=1, order_bys=["id"]))
    assert [r["id"] for r in out.collect()] == [2, 3]


def test_limit_guardrails(tbl):
    # default limit 1000 applies (base.rs:14)
    assert list_query(tbl).count() == 5
    with pytest.raises(FilterError):
        list_query(tbl, None, ListOptions(limit=5001))
    with pytest.raises(FilterError):
        filter_to_column({"id": {"$regex": "x"}})


def test_point_lookup_first_count(tbl):
    assert [r["name"] for r in get_by_id(tbl, "id", 2).collect()] == ["Mike A"]
    assert [r["id"] for r in first(tbl, {"state": "ok"}).collect()] == [1]
    assert count_query(tbl, {"state": "ok"}) == 3
    assert count_query(tbl) == 5


def test_first_does_not_mutate_options(tbl):
    opts = ListOptions(limit=4, order_bys=["id"])
    assert first(tbl, None, opts).count() == 1
    assert opts.limit == 4  # caller's options untouched
    assert list_query(tbl, None, opts).count() == 4


def test_hostile_inputs_raise_typed_errors(tbl):
    """Malformed filters/options must be FilterError, never a bare
    TypeError/AttributeError from the compiler internals — found by
    fuzzing (tools-free inline fuzz, 400 hostile filters)."""
    # $in with a scalar (list() would TypeError) or a STRING (list()
    # would silently explode it into characters)
    with pytest.raises(FilterError, match=r"\$in needs a list"):
        filter_to_column({"id": {"$in": 7}})
    with pytest.raises(FilterError, match=r"\$in needs a list"):
        filter_to_column({"name": {"$in": "abc"}})
    # string ops with non-string operands (.replace/.lower would leak)
    with pytest.raises(FilterError, match=r"\$contains needs a string"):
        filter_to_column({"name": {"$contains": 3.5}})
    with pytest.raises(FilterError, match=r"\$startsWithCi needs a string"):
        filter_to_column({"name": {"$startsWithCi": None}})
    # non-string / empty filter keys
    with pytest.raises(FilterError, match="column names"):
        filter_to_column({3: "x"})
    with pytest.raises(FilterError, match="column names"):
        filter_to_column({"": "x"})
    # $or with a non-list operand (list() would TypeError)
    with pytest.raises(FilterError, match=r"\$or needs a list"):
        filter_to_column({"$or": 5})
    with pytest.raises(FilterError, match=r"\$or needs a list"):
        filter_to_column({"$or": None})
    # negative paging and broken order_bys entries
    with pytest.raises(FilterError, match="limit must be >= 0"):
        list_query(tbl, None, ListOptions(limit=-3)).count()
    with pytest.raises(FilterError, match="offset must be >= 0"):
        list_query(tbl, None, ListOptions(offset=-1)).count()
    with pytest.raises(FilterError, match="order_by entries"):
        list_query(tbl, None, ListOptions(order_bys=["!"])).count()
    with pytest.raises(FilterError, match="order_by entries"):
        list_query(tbl, None, ListOptions(order_bys=[None])).count()
    # '!!col' passed the old lstrip('!') check but built F.col('!col'),
    # failing later as an AnalysisException instead of the typed error
    with pytest.raises(FilterError, match="order_by entries"):
        list_query(tbl, None, ListOptions(order_bys=["!!score"])).count()
    # order_bys=None falls back to deterministic id ordering
    opts = ListOptions(limit=2, order_bys=None)
    assert [r["id"] for r in list_query(tbl, None, opts).collect()] == [1, 2]
