"""Namespaces and model-label translations (parity:
/root/reference/cubes/namespace.py:13-180,
/root/reference/cubes/metadata/localization.py:14-60)."""

import pytest

from cubes_spark.demo import TPCH_MODEL, tpch_workspace
from cubes_spark.errors import NoSuchCubeError, NoSuchDimensionError
from cubes_spark.namespace import Namespace
from cubes_spark.sources.workspace import Workspace
from tests.conftest import SF_DIR

EXTRA_MODEL = {
    "dimensions": [
        {"name": "flag", "levels": [
            {"name": "flag", "attributes": ["flag"]}]},
    ],
    "cubes": [
        {
            "name": "orders_only",
            "fact": "orders",
            "dimensions": ["flag"],
            "aggregates": [{"name": "fact_count", "function": "count"}],
            "mappings": {"flag.flag": "orders.o_orderstatus"},
        }
    ],
}

TRANSLATION_DE = {
    "cubes": {
        "sales": {
            "label": "Verkäufe",
            "description": "Auftragspositionen",
            "aggregates": {"quantity_sum": "Menge gesamt"},
            "dimensions": {
                "date": {
                    "label": "Datum",
                    "levels": {"month": {"label": "Monat"}},
                },
            },
        },
    },
    "dimensions": {"returnflag": "Rückgabe"},
}


def test_namespace_paths():
    root = Namespace()
    ns, remainder = root.namespace("a.b.c", create=True)
    assert ns.name == "a.b.c"
    assert remainder is None
    found, rem = root.namespace("a.b.c.d")
    assert found.name == "a.b.c" and rem == "d"
    assert root.namespace("a")[0].parent is root


def test_namespaced_cube_resolution(spark):
    ws = tpch_workspace(spark, SF_DIR)
    ws.import_model(EXTRA_MODEL, namespace="extra.orders")

    cube = ws.cube("extra.orders.orders_only")
    assert cube.name == "extra.orders.orders_only"
    # root cubes unaffected
    assert ws.cube("sales").name == "sales"
    with pytest.raises(NoSuchCubeError):
        ws.cube("extra.no_such")
    with pytest.raises(NoSuchCubeError):
        ws.cube("orders_only")     # lives only in the sub-namespace

    names = [c["name"] for c in ws.list_cubes()]
    assert "extra.orders.orders_only" in names
    assert "sales" in names

    # a namespaced cube browses like any other
    browser = ws.browser("extra.orders.orders_only")
    result = browser.aggregate(drilldown=["flag"],
                               aggregates=["fact_count"])
    assert sum(c["fact_count"] for c in result.cells) > 0


def test_namespace_dimension_fallback(spark):
    ws = tpch_workspace(spark, SF_DIR)
    ws.import_model(EXTRA_MODEL, namespace="extra")
    # child namespace sees its own dimension...
    assert ws.dimension("flag", namespace="extra").name == "flag"
    # ...and falls back to the parent for root dimensions
    assert ws.dimension("date", namespace="extra").name == "date"
    with pytest.raises(NoSuchDimensionError):
        ws.dimension("flag")       # root does NOT see child dimensions


def test_model_label_translation(spark):
    ws = tpch_workspace(spark, SF_DIR)
    ws.add_translation("de", TRANSLATION_DE)

    cube = ws.cube("sales", locale="de")
    assert cube.label == "Verkäufe"
    assert cube.description == "Auftragspositionen"
    agg = {a.name: a for a in cube.aggregates}["quantity_sum"]
    assert agg.label == "Menge gesamt"
    date = cube.dimension("date")
    assert date.label == "Datum"
    assert date.level("month").label == "Monat"
    # global dimension translation fills the cube-local gap
    assert cube.dimension("returnflag").label == "Rückgabe"

    # untranslated: untouched originals
    plain = ws.cube("sales")
    assert plain.label != "Verkäufe"
    assert plain.dimension("date").level("month").label != "Monat"
    # physical binding identical: the localized cube still browses
    browser = ws.browser(cube)
    result = browser.aggregate(cell="date:1995",
                               aggregates=["fact_count"])
    assert result.summary["fact_count"] > 0


def test_translations_in_model_metadata(spark):
    ws = Workspace(spark, store=SF_DIR)
    model = dict(TPCH_MODEL)
    model["translations"] = {"de": TRANSLATION_DE}
    ws.import_model(model)
    assert ws.cube("sales", locale="de").label == "Verkäufe"
    infos = {c["name"]: c for c in ws.list_cubes(locale="de")}
    assert infos["sales"]["label"] == "Verkäufe"


def test_server_localized_model(spark):
    import json

    from cubes_spark.server import create_server

    ws = tpch_workspace(spark, SF_DIR)
    ws.add_translation("de", TRANSLATION_DE)
    app = create_server(ws)
    app.testing = True
    client = app.test_client()

    data = json.loads(client.get("/cube/sales/model?lang=de").data)
    assert data["label"] == "Verkäufe"
    data = json.loads(client.get("/cube/sales/model").data)
    assert data.get("label") != "Verkäufe"
    cubes = {c["name"]: c for c in
             json.loads(client.get("/cubes?lang=de").data)}
    assert cubes["sales"]["label"] == "Verkäufe"
