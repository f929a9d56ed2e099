"""Remote Slicer store/browser integration (parity:
/root/reference/cubes/server/store.py SlicerStore + SlicerModelProvider,
/root/reference/cubes/server/browser.py SlicerBrowser).

The loopback test hosts the repo's own Flask server on an ephemeral
port (a REAL http round-trip through urllib) and federates it into a
second workspace; every relayed operation must equal the local
browser's answer bit-for-bit."""

import json
import threading

import pytest

from cubes_spark.demo import tpch_workspace
from cubes_spark.errors import (
    BackendError,
    ConfigurationError,
    MissingObjectError,
    NoSuchCubeError,
)
from cubes_spark.server import create_server
from cubes_spark.sources.slicer import SlicerBrowser, SlicerHTTPStore
from cubes_spark.sources.workspace import Workspace
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def local_ws(spark):
    return tpch_workspace(spark, SF_DIR)


@pytest.fixture(scope="module")
def server_url(local_ws):
    from werkzeug.serving import make_server

    app = create_server(local_ws)
    server = make_server("127.0.0.1", 0, app)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()
    thread.join(timeout=5)


@pytest.fixture(scope="module")
def remote_ws(spark, server_url):
    ws = Workspace(spark)
    names = ws.import_slicer(server_url)
    assert "sales" in names
    return ws


def _jsonable(value):
    # serialize with the SERVER's encoder so local values (Decimal,
    # datetime) normalize exactly as the HTTP relay does
    from cubes_spark.formatters import SlicerJSONEncoder

    return json.loads(SlicerJSONEncoder(indent=None).encode(value))


def test_import_slicer_registers_remote_cubes(remote_ws, local_ws):
    local_names = [c["name"] for c in local_ws.list_cubes()]
    remote_names = [c["name"] for c in remote_ws.list_cubes()]
    assert remote_names == local_names


def test_remote_browser_type(remote_ws):
    browser = remote_ws.browser("sales")
    assert isinstance(browser, SlicerBrowser)
    assert "aggregate" in browser.features()["actions"]


def test_aggregate_roundtrip_equals_local(remote_ws, local_ws):
    kwargs = dict(cell="date:1995", drilldown=["date:month"],
                  aggregates=["price_sum", "fact_count"])
    local = local_ws.browser("sales").aggregate(**kwargs).to_dict()
    remote = remote_ws.browser("sales").aggregate(**kwargs).to_dict()
    assert _jsonable(remote["summary"]) == _jsonable(local["summary"])
    assert _jsonable(remote["cells"]) == _jsonable(local["cells"])
    assert remote["total_cell_count"] == local["total_cell_count"]
    assert remote["aggregates"] == local["aggregates"]
    assert remote["levels"] == local["levels"]
    assert _jsonable(remote["cell"]) == _jsonable(local["cell"])


def test_aggregate_order_page_roundtrip(remote_ws, local_ws):
    kwargs = dict(drilldown=["customer_geo:nation"],
                  aggregates=["price_sum"],
                  order=[("price_sum", "desc")],
                  page=1, page_size=3)
    local = local_ws.browser("sales").aggregate(**kwargs).to_dict()
    remote = remote_ws.browser("sales").aggregate(**kwargs).to_dict()
    assert _jsonable(remote["cells"]) == _jsonable(local["cells"])


def test_facts_roundtrip_equals_local(remote_ws, local_ws):
    local_df = local_ws.browser("sales").facts(
        cell="returnflag:R", page=0, page_size=5)
    local_rows = _jsonable([r.asDict() for r in local_df.collect()])
    remote_rows = _jsonable(
        remote_ws.browser("sales").facts(
            cell="returnflag:R", page=0, page_size=5))
    assert remote_rows == local_rows


def test_fact_roundtrip_and_missing(remote_ws, local_ws):
    local = local_ws.browser("sales").fact(1)
    remote = remote_ws.browser("sales").fact(1)
    assert remote is not None
    assert _jsonable(remote) == _jsonable(local)
    assert remote_ws.browser("sales").fact(-999999999) is None


def test_members_roundtrip_equals_local(remote_ws, local_ws):
    local = _jsonable(local_ws.browser("sales").members(
        None, "returnflag"))
    remote = _jsonable(remote_ws.browser("sales").members(
        None, "returnflag"))
    assert remote == local


def test_cell_details_roundtrip(remote_ws, local_ws):
    local = _jsonable(
        local_ws.browser("sales").cell_details(
            local_ws.browser("sales").prepare_cell("date:1995")))
    remote = _jsonable(
        remote_ws.browser("sales").cell_details("date:1995"))
    assert remote == local


def test_store_registry_and_dict_config(remote_ws, server_url):
    ws = Workspace(remote_ws.spark)
    ws.register_store("remote", {"type": "slicer", "url": server_url})
    store = ws.get_store("remote")
    assert isinstance(store, SlicerHTTPStore)
    assert [c["name"] for c in store.list_cubes()][0] == "sales"
    cube = store.cube("sales")
    assert cube.store is store
    assert [d.name for d in cube.dimensions]


def test_missing_cube_and_bad_auth_config(server_url):
    store = SlicerHTTPStore(url=server_url)
    with pytest.raises(NoSuchCubeError):
        store.cube("no_such_cube")
    with pytest.raises(MissingObjectError):
        store.request("cube/sales/no_such_action")
    with pytest.raises(ConfigurationError):
        SlicerHTTPStore(url=server_url, authentication="kerberos")


def test_pass_parameter_auth_is_sent(server_url):
    seen = {}

    def transport(url, headers):
        seen["url"] = url
        return 200, b"[]"

    store = SlicerHTTPStore(url=server_url,
                            authentication="pass_parameter",
                            auth_identity="alice",
                            transport=transport)
    store.list_cubes()
    assert "api_key=alice" in seen["url"]


def test_basic_auth_header_is_sent():
    seen = {}

    def transport(url, headers):
        seen["headers"] = headers
        return 200, b"[]"

    store = SlicerHTTPStore(url="http://x", username="u",
                            password="p", transport=transport)
    store.list_cubes()
    assert seen["headers"]["Authorization"].startswith("Basic ")


def test_backend_error_on_500():
    store = SlicerHTTPStore(
        url="http://x", transport=lambda url, headers: (500, b"boom"))
    with pytest.raises(BackendError):
        store.request("cubes")


def test_default_store_type_slicer_auto_imports(spark, server_url):
    ws = Workspace(spark, store={"type": "slicer", "url": server_url})
    assert [c["name"] for c in ws.list_cubes()][0] == "sales"
    browser = ws.browser("sales")
    assert isinstance(browser, SlicerBrowser)
    result = browser.aggregate(aggregates=["fact_count"])
    assert result.summary["fact_count"] > 0
