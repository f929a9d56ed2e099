"""Join methods (match/master/detail), compound keys, post-calc order
normalization and table_rows — closing SURVEY §2 rows 23/24/47/53
(semantics parity: /root/reference/tests/sql/test_query.py)."""

import pytest

from cubes_spark.sources.workspace import Workspace


def build_ws(spark, method):
    facts = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "zz", 30)],  # 'zz' has no dim row
        ["id", "code", "amount"],
    )
    dim = spark.createDataFrame(
        [("a", "Alpha"), ("b", "Beta"), ("c", "Gamma")],  # 'c' unused
        ["code", "name"],
    )
    model = {
        "dimensions": [
            {"name": "thing",
             "levels": [{"name": "thing", "attributes": ["code", "name"],
                         "key": "code", "label_attribute": "name"}]},
        ],
        "cubes": [{
            "name": "sales",
            "fact": "facts",
            "key": "id",
            "dimensions": ["thing"],
            "measures": [{"name": "amount"}],
            "aggregates": [
                {"name": "amount_sum", "function": "sum",
                 "measure": "amount"},
                {"name": "fact_count", "function": "count"},
            ],
            "joins": [{"master": "facts.code", "detail": "dim_thing.code",
                       "method": method}],
            "mappings": {
                "amount": "facts.amount",
                "id": "facts.id",
                "thing.code": "dim_thing.code",
                "thing.name": "dim_thing.name",
            },
        }],
    }
    ws = Workspace(spark, store={"facts": facts, "dim_thing": dim})
    ws.import_model(model)
    return ws.browser("sales")


def test_match_join_drops_unmatched_facts(spark):
    browser = build_ws(spark, "match")
    # summary references no dimension attribute → join-relevance pruning
    # skips the join entirely (reference semantics: "join only what is
    # needed"), so all 3 facts count
    summary = browser.aggregate(aggregates=["fact_count"]).summary
    assert summary["fact_count"] == 3
    # once the dimension is referenced, the inner join drops 'zz'
    result = browser.aggregate(drilldown=["thing"],
                               aggregates=["amount_sum", "fact_count"])
    assert result.summary["fact_count"] == 3  # summary still unjoined
    assert sum(c["fact_count"] for c in result.cells) == 2
    assert sum(c["amount_sum"] for c in result.cells) == 30


def test_master_join_keeps_all_facts(spark):
    browser = build_ws(spark, "master")
    result = browser.aggregate(drilldown=["thing"],
                               aggregates=["fact_count"])
    assert result.summary["fact_count"] == 3        # 'zz' kept, null dim
    keys = [c["thing.code"] for c in result.cells]
    assert None in keys or "zz" in keys


def test_detail_join_keeps_all_dimension_rows(spark):
    browser = build_ws(spark, "detail")
    result = browser.aggregate(drilldown=["thing"],
                               aggregates=["fact_count", "amount_sum"])
    # 'c' dimension row appears with no facts (COUNT(*) counts its null
    # row — reference semantics); 'zz' fact dropped by the right join
    by_name = {c["thing.name"]: c for c in result.cells}
    assert set(by_name) == {"Alpha", "Beta", "Gamma"}
    assert by_name["Gamma"]["fact_count"] == 1
    assert by_name["Gamma"]["amount_sum"] is None
    assert by_name["Alpha"]["amount_sum"] == 10


def test_compound_join_keys(spark):
    facts = spark.createDataFrame(
        [(1, "a", 1, 10), (2, "a", 2, 20), (3, "b", 1, 30)],
        ["id", "k1", "k2", "amount"],
    )
    dim = spark.createDataFrame(
        [("a", 1, "A1"), ("a", 2, "A2"), ("b", 1, "B1")],
        ["k1", "k2", "label"],
    )
    model = {
        "dimensions": [
            {"name": "combo",
             "levels": [{"name": "combo",
                         "attributes": ["k1", "k2", "label"],
                         "key": "k1", "label_attribute": "label"}]},
        ],
        "cubes": [{
            "name": "sales",
            "fact": "facts",
            "dimensions": ["combo"],
            "measures": [{"name": "amount"}],
            "aggregates": [{"name": "amount_sum", "function": "sum",
                            "measure": "amount"}],
            "joins": [{
                "master": {"table": "facts", "column": ["k1", "k2"]},
                "detail": {"table": "dim_combo", "column": ["k1", "k2"]},
            }],
            "mappings": {
                "amount": "facts.amount",
                "combo.k1": "dim_combo.k1",
                "combo.k2": "dim_combo.k2",
                "combo.label": "dim_combo.label",
            },
        }],
    }
    ws = Workspace(spark, store={"facts": facts, "dim_combo": dim})
    ws.import_model(model)
    browser = ws.browser("sales")
    result = browser.aggregate(drilldown=["combo"],
                               aggregates=["amount_sum"])
    by_label = {c["combo.label"]: c["amount_sum"] for c in result.cells}
    assert by_label == {"A1": 10, "A2": 20, "B1": 30}


def test_order_by_postcalc_redirects_to_source(tpch_browser):
    # ordering by price_sma must order by its source aggregate price_sum
    by_sma = tpch_browser.aggregate(
        cell="date:1995", drilldown=["date@ym:month"],
        aggregates=["price_sum", "price_sma"], order=["price_sma:desc"],
    )
    by_sum = tpch_browser.aggregate(
        cell="date:1995", drilldown=["date@ym:month"],
        aggregates=["price_sum", "price_sma"], order=["price_sum:desc"],
    )
    assert [c["date.month"] for c in by_sma.cells] \
        == [c["date.month"] for c in by_sum.cells]


def test_table_rows(tpch_browser):
    result = tpch_browser.aggregate(
        drilldown=["customer_geo:region"], aggregates=["fact_count"],
    )
    rows = list(result.table_rows("customer_geo"))
    assert len(rows) == 5
    assert rows[0].label == "AFRICA"
    assert rows[0].key == 0
    assert not rows[0].is_base  # region is not the deepest level
