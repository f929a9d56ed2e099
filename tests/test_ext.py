"""Extension discovery (cubes_spark.ext; parity surface:
/root/reference/cubes/ext.py:75-260 ExtensionFinder over entry
points).  The entry-point tests synthesize an installed distribution
(dist-info + module on sys.path) — no pip involved."""

from __future__ import annotations

import sys
import textwrap

import pytest

from cubes_spark import ext
from cubes_spark.errors import InternalError
from tests.conftest import SF_DIR


@pytest.fixture()
def fake_dist(tmp_path, monkeypatch):
    """An 'installed' distribution contributing one extension of every
    supported kind via entry points."""
    site = tmp_path / "site"
    site.mkdir()
    (site / "fake_ext_mod.py").write_text(textwrap.dedent("""
        from pyspark.sql import functions as F

        from cubes_spark.formatters import Formatter
        from cubes_spark.server.authenticators import Authenticator


        class PipeFormatter(Formatter):
            __label__ = "Pipe separated"
            mime_type = "text/x-pipe"

            def format(self, cube, result):
                fields = list(result.labels)
                lines = ["|".join(fields)]
                for cell in result.cells:
                    lines.append("|".join(
                        str(cell.get(f)) for f in fields))
                return "\\n".join(lines)


        class HeaderTokenAuthenticator(Authenticator):
            def __init__(self, header="X-Token", **options):
                self.header = header

            def authenticate(self, request):
                return request.headers.get(self.header)


        def geometric_sum(column, **kwargs):
            return F.exp(F.sum(F.log(column)))


        def smax_calculator(source, window_spec):
            return F.max(source).over(window_spec)
    """))
    dist_info = site / "fake_ext-1.0.dist-info"
    dist_info.mkdir()
    (dist_info / "METADATA").write_text(
        "Metadata-Version: 2.1\nName: fake-ext\nVersion: 1.0\n")
    (dist_info / "entry_points.txt").write_text(textwrap.dedent("""
        [cubes_spark.formatter]
        pipe = fake_ext_mod:PipeFormatter

        [cubes_spark.authenticator]
        header_token = fake_ext_mod:HeaderTokenAuthenticator

        [cubes_spark.aggregate_function]
        geometric_sum = fake_ext_mod:geometric_sum

        [cubes_spark.calculator]
        smax = fake_ext_mod:smax_calculator
    """))
    (dist_info / "RECORD").write_text("")
    monkeypatch.syspath_prepend(str(site))
    # finders cache discovery; reset the module-level ones under test
    fresh = {}
    from cubes_spark.functions import calculators as _calcmod

    monkeypatch.setattr(_calcmod, "_entry_points_loaded", False)
    _calc_keys = set(_calcmod.CALCULATED_AGGREGATIONS)
    for name in ("formatter", "authenticator", "aggregate_function",
                 "calculator"):
        finder = ext.ExtensionFinder(name)
        fresh[name] = finder
        monkeypatch.setattr(ext, name, finder)
        monkeypatch.setitem(ext._FINDERS, name, finder)
    yield fresh
    sys.modules.pop("fake_ext_mod", None)
    # lazy loads mutate the registry dict itself; drop what we added
    for key in set(_calcmod.CALCULATED_AGGREGATIONS) - _calc_keys:
        del _calcmod.CALCULATED_AGGREGATIONS[key]


def test_builtin_names_and_create():
    assert "csv" in ext.formatter.names()
    from cubes_spark.formatters import CSVFormatter

    assert isinstance(ext.formatter.create("csv"), CSVFormatter)
    assert ext.formatter.get("csv").is_builtin


def test_unknown_extension_raises():
    with pytest.raises(InternalError, match="no_such"):
        ext.formatter.get("no_such")


def test_register_programmatically():
    finder = ext.ExtensionFinder("formatter")

    class X:
        pass

    finder.register("x", X)
    assert "x" in finder
    assert isinstance(finder.create("x"), X)


def test_entry_point_discovery(fake_dist):
    names = ext.formatter.names()
    assert "pipe" in names and "csv" in names
    e = ext.formatter.get("pipe")
    assert not e.is_builtin
    assert e.label == "Pipe separated"
    assert ext.authenticator.get("header_token") is not None


def test_entry_point_formatter_through_server(fake_dist, spark):
    """The VERDICT done-criterion: a custom formatter from a synthetic
    entry point drives a real server response via ?format=pipe."""
    from cubes_spark.demo import tpch_workspace
    from cubes_spark.server import create_server
    from tests.conftest import SF_DIR

    ws = tpch_workspace(spark, SF_DIR)
    client = create_server(ws).test_client()
    resp = client.get(
        "/cube/sales/aggregate?drilldown=returnflag"
        "&aggregates=fact_count&format=pipe")
    assert resp.status_code == 200
    assert resp.mimetype == "text/x-pipe"
    lines = resp.get_data(as_text=True).splitlines()
    assert lines[0].count("|") >= 1
    assert len(lines) >= 4  # header + 3 return flags
    # unknown format is a client error, not a 500
    bad = client.get("/cube/sales/aggregate?format=nope")
    assert bad.status_code == 400


def test_entry_point_authenticator_through_config(fake_dist):
    from cubes_spark.server.authenticators import create_authenticator

    auth = create_authenticator("header_token", header="X-Me")
    assert auth.header == "X-Me"


def test_entry_point_aggregate_function(fake_dist, spark):
    from cubes_spark.functions.aggregates import (
        available_aggregate_functions,
        get_aggregate_function,
    )

    assert "geometric_sum" in available_aggregate_functions()
    fn = get_aggregate_function("geometric_sum")
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(2.0,), (8.0,)], "x double")
    got = df.agg(fn.builder(F.col("x")).alias("g")).head().g
    assert got == pytest.approx(16.0)


def test_finder_lookup_unknown_type():
    from cubes_spark.errors import ArgumentError

    with pytest.raises(ArgumentError):
        ext.finder("wormhole")


def test_entry_point_calculator(fake_dist, spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cubes_spark.functions.calculators import (
        CALCULATED_AGGREGATIONS,
        available_calculators,
    )

    assert "smax" in available_calculators()
    df = spark.createDataFrame(
        [(1, 5.0), (2, 3.0), (3, 9.0)], "t long, v double")
    w = Window.orderBy("t").rowsBetween(-1, 0)
    out = df.withColumn(
        "m", CALCULATED_AGGREGATIONS["smax"](F.col("v"), w))
    assert [r.m for r in out.orderBy("t").collect()] == [5.0, 5.0, 9.0]


def test_search_backend_through_server(spark):
    """/search delegates to the `searcher` extension (parity:
    blueprint.py:542-575 external-engine delegation): a toy backend
    registered on the finder is selected by [search] engine and
    answers the request; the builtin `simple` stays the default."""
    from cubes_spark.demo import tpch_workspace
    from cubes_spark.server import create_server
    from cubes_spark.server.search import Searcher
    from tests.conftest import SF_DIR

    class CannedSearcher(Searcher):
        def search(self, query, dimension, hierarchy=None, cell=None,
                   locale=None, limit=None):
            return [{"dimension": "customer_geo", "level": "region",
                     "attribute": "canned", "value": query.upper(),
                     "path": ["X"]}]

    ext.searcher.register("canned", CannedSearcher)
    try:
        ws = tpch_workspace(spark, SF_DIR)
        client = create_server(
            ws, search={"engine": "canned"}).test_client()
        resp = client.get(
            "/cube/sales/search?dimension=customer_geo&q=africa")
        assert resp.status_code == 200
        doc = resp.get_json()
        assert doc["matches"] == [
            {"dimension": "customer_geo", "level": "region",
             "attribute": "canned", "value": "AFRICA", "path": ["X"]}]

        # default engine (no search config) is the builtin scan
        plain = create_server(ws).test_client()
        resp = plain.get(
            "/cube/sales/search?dimension=customer_geo&q=africa")
        assert resp.status_code == 200
        doc = resp.get_json()
        assert any(m["value"] == "AFRICA" for m in doc["matches"])

        # unknown engine is a client error, not a 500
        broken = create_server(
            ws, search={"engine": "wormhole"}).test_client()
        resp = broken.get(
            "/cube/sales/search?dimension=customer_geo&q=africa")
        assert resp.status_code == 400
    finally:
        ext.searcher._extensions.pop("canned", None)


def test_model_provider_default_static(spark):
    """model_provider extension type (reference ext.py:75-260 +
    metadata/providers.py:156-432, thin form): the builtin 'default'
    provider resolves through the registry and imports the metadata
    it wraps."""
    from cubes_spark.metadata.providers import StaticModelProvider
    from cubes_spark.sources.workspace import Workspace

    assert "default" in ext.model_provider.names()
    assert isinstance(ext.model_provider.create("default", {}),
                      StaticModelProvider)

    model = {
        "dimensions": [{"name": "flag",
                        "levels": [{"name": "flag",
                                    "attributes": ["flag"]}]}],
        "cubes": [{"name": "mini", "fact": "lineitem",
                   "dimensions": ["flag"],
                   "measures": [{"name": "quantity"}],
                   "aggregates": [{"name": "quantity_sum",
                                   "function": "sum",
                                   "measure": "quantity"}],
                   "mappings": {"flag.flag": "lineitem.l_returnflag",
                                "quantity": "lineitem.l_quantity"}}],
    }
    ws = Workspace(spark, store=SF_DIR)
    ws.import_model(model, provider="default")
    assert ws.cube("mini") is not None


def test_model_provider_custom_registered(spark):
    """A ported custom provider: synthesizes model metadata from a
    non-model source, registered programmatically (the in-process
    analog of a cubes_spark.model_provider entry point)."""
    from cubes_spark.metadata.providers import ModelProvider
    from cubes_spark.sources.workspace import Workspace

    class CatalogProvider(ModelProvider):
        def model_metadata(self):
            # "catalog" source: a bare list of (cube, fact) pairs
            return {"cubes": [
                {"name": c, "fact": f,
                 "measures": [{"name": "quantity"}],
                 "aggregates": [{"name": "quantity_sum",
                                 "function": "sum",
                                 "measure": "quantity"}],
                 "mappings": {"quantity": f"{f}.l_quantity"}}
                for c, f in self.source]}

    ext.model_provider.register("catalog", CatalogProvider)
    ws = Workspace(spark, store=SF_DIR)
    ws.import_model([("sales_lite", "lineitem")], provider="catalog")
    b = ws.browser("sales_lite")
    r = b.aggregate(aggregates=["quantity_sum"])
    assert float(r.summary["quantity_sum"]) > 0


def test_model_provider_rejects_non_provider(spark):
    from cubes_spark.errors import ArgumentError
    from cubes_spark.sources.workspace import Workspace

    ws = Workspace(spark, store=SF_DIR)
    with pytest.raises((ArgumentError, InternalError)):
        ws.import_model({}, provider=object())
