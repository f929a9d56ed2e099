"""Localization: per-locale physical columns resolved by browser locale
(parity: /root/reference/cubes/sql/mapper.py:240-248 and the
sql_star_test.json localized mappings)."""

import pytest

from cubes_spark.sources.workspace import Workspace

MODEL = {
    "dimensions": [
        {
            "name": "category",
            "levels": [
                {"name": "category",
                 "attributes": [
                     {"name": "code"},
                     {"name": "name", "locales": ["en", "sk"]},
                 ],
                 "key": "code", "label_attribute": "name"},
            ],
        },
    ],
    "cubes": [
        {
            "name": "sales",
            "fact": "facts",
            "dimensions": ["category"],
            "measures": [{"name": "amount"}],
            "aggregates": [
                {"name": "amount_sum", "function": "sum",
                 "measure": "amount"},
            ],
            "joins": [
                {"master": "facts.category_code",
                 "detail": "dim_category.code"},
            ],
            "mappings": {
                "amount": "facts.amount",
                "category.code": "dim_category.code",
                # explicit per-locale physical columns
                "category.name.en": "dim_category.name_en",
                "category.name.sk": "dim_category.name_sk",
            },
        },
    ],
}


@pytest.fixture(scope="module")
def localized_ws(spark):
    facts = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)],
        ["id", "category_code", "amount"],
    )
    categories = spark.createDataFrame(
        [("a", "Drinks", "Napoje"), ("b", "Food", "Jedlo")],
        ["code", "name_en", "name_sk"],
    )
    ws = Workspace(spark, store={"facts": facts,
                                 "dim_category": categories})
    ws.import_model(MODEL)
    return ws


def test_english_locale(localized_ws):
    browser = localized_ws.browser("sales", locale="en")
    result = browser.aggregate(drilldown=["category"],
                               aggregates=["amount_sum"])
    names = sorted(c["category.name"] for c in result.cells)
    assert names == ["Drinks", "Food"]


def test_slovak_locale(localized_ws):
    browser = localized_ws.browser("sales", locale="sk")
    result = browser.aggregate(drilldown=["category"],
                               aggregates=["amount_sum"])
    names = sorted(c["category.name"] for c in result.cells)
    assert names == ["Jedlo", "Napoje"]
    by_name = {c["category.name"]: c["amount_sum"] for c in result.cells}
    assert by_name["Napoje"] == 30


def test_default_locale_falls_back_to_first(localized_ws):
    browser = localized_ws.browser("sales")
    result = browser.aggregate(drilldown=["category"],
                               aggregates=["amount_sum"])
    names = sorted(c["category.name"] for c in result.cells)
    assert names == ["Drinks", "Food"]


def test_members_localized(localized_ws):
    browser = localized_ws.browser("sales", locale="sk")
    members = browser.members(dimension="category")
    assert sorted(m["category.name"] for m in members) \
        == ["Jedlo", "Napoje"]


def test_localized_cut_values(localized_ws):
    # cuts address level KEYS, which are locale-independent
    browser = localized_ws.browser("sales", locale="sk")
    result = browser.aggregate(cell="category:a",
                               aggregates=["amount_sum"])
    assert result.summary["amount_sum"] == 30
