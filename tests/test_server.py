"""Slicer HTTP API over the Spark workspace (parity:
/root/reference/tests/test_server.py — Flask test client, no network)."""

import json

import pytest

from cubes_spark.auth import SimpleAuthorizer
from cubes_spark.demo import tpch_workspace
from cubes_spark.server import create_server
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def client(spark):
    ws = tpch_workspace(spark, SF_DIR)
    app = create_server(ws)
    app.testing = True
    return app.test_client()


@pytest.fixture(scope="module")
def secured_client(spark):
    ws = tpch_workspace(spark, SF_DIR)
    authz = SimpleAuthorizer(
        rights={
            "analyst": {"allowed_cubes": ["sales"]},
            "restricted": {
                "allowed_cubes": ["sales"],
                "cell_restrictions": {"sales": ["returnflag:A"]},
            },
        },
        order="allow_deny",
    )
    app = create_server(ws, authorizer=authz)
    app.testing = True
    return app.test_client()


def get_json(client, url):
    response = client.get(url)
    return response.status_code, json.loads(response.data)


def test_version(client):
    status, data = get_json(client, "/version")
    assert status == 200
    assert data["api_version"] == 2


def test_list_cubes(client):
    status, data = get_json(client, "/cubes")
    assert status == 200
    assert [c["name"] for c in data] == [
        "sales", "sales_outer", "events", "sales_detail"]


def test_cube_model(client):
    status, data = get_json(client, "/cube/sales/model")
    assert status == 200
    assert data["name"] == "sales"
    assert any(d["name"] == "date" for d in data["dimensions"])


def test_unknown_cube_404(client):
    status, data = get_json(client, "/cube/nope/model")
    assert status == 404


def test_aggregate_endpoint(client):
    status, data = get_json(
        client,
        "/cube/sales/aggregate?cut=date:1995&drilldown=date:month"
        "&aggregates=fact_count,quantity_sum",
    )
    assert status == 200
    assert len(data["cells"]) == 12
    assert data["total_cell_count"] == 12
    assert data["summary"]["fact_count"] == sum(
        c["fact_count"] for c in data["cells"]
    )


def test_aggregate_order_and_paging(client):
    status, data = get_json(
        client,
        "/cube/sales/aggregate?drilldown=date@ym:month"
        "&aggregates=price_sum&order=price_sum:desc&page=0&pagesize=3",
    )
    assert status == 200
    sums = [c["price_sum"] for c in data["cells"]]
    assert len(sums) == 3
    assert sums == sorted(sums, reverse=True)


def test_aggregate_csv_format(client):
    response = client.get(
        "/cube/sales/aggregate?drilldown=returnflag"
        "&aggregates=fact_count&format=csv"
    )
    assert response.status_code == 200
    assert response.mimetype == "text/csv"
    lines = response.data.decode().strip().splitlines()
    assert lines[0] == "returnflag.returnflag,fact_count"
    assert len(lines) == 4


def test_facts_endpoint(client):
    status, data = get_json(
        client,
        "/cube/sales/facts?cut=date:1995,1&fields=quantity,returnflag"
        "&pagesize=5",
    )
    assert status == 200
    assert len(data) == 5
    assert set(data[0]) == {"quantity", "returnflag.returnflag"}


def test_fact_endpoint(client):
    status, data = get_json(client, "/cube/sales/fact/1")
    assert status == 200
    assert data["fact_key"] == 1


def test_members_endpoint(client):
    status, data = get_json(
        client, "/cube/sales/members/customer_geo?depth=1"
    )
    assert status == 200
    assert data["dimension"] == "customer_geo"
    assert len(data["data"]) == 5


def test_cell_endpoint(client):
    status, data = get_json(client, "/cube/sales/cell?cut=date:1995")
    assert status == 200
    assert data["cuts"][0]["dimension"] == "date"
    assert data["cuts"][0]["details"] is not None


def test_report_endpoint(client):
    response = client.post(
        "/cube/sales/report",
        json={"queries": {
            "byflag": {"query": "aggregate", "drilldown": ["returnflag"],
                       "aggregates": ["fact_count"]},
        }},
    )
    assert response.status_code == 200
    data = json.loads(response.data)
    assert len(data["byflag"]["cells"]) == 3


def test_report_get_matches_post(client):
    """GET /report (reference blueprint.py:507 accepts both methods):
    same spec via JSON body or via the queries= URL parameter."""
    spec = {"byflag": {"query": "aggregate", "drilldown": ["returnflag"],
                       "aggregates": ["fact_count"]}}
    post = client.post("/cube/sales/report", json={"queries": spec})
    get_body = client.get("/cube/sales/report", json={"queries": spec})
    get_param = client.get(
        "/cube/sales/report?queries=" +
        __import__("urllib.parse", fromlist=["quote"]).quote(
            json.dumps(spec)))
    assert post.status_code == get_body.status_code == \
        get_param.status_code == 200
    assert json.loads(post.data) == json.loads(get_body.data) \
        == json.loads(get_param.data)


def test_bad_request_400(client):
    status, data = get_json(client, "/cube/sales/aggregate?cut=nonsense")
    assert status == 400


def test_authorization_denied(secured_client):
    response = secured_client.get("/cube/sales/aggregate")
    assert response.status_code == 403
    status, data = get_json(
        secured_client, "/cube/sales/aggregate?identity=analyst"
    )
    assert status == 200


def test_restricted_cell_enforced(secured_client):
    status, data = get_json(
        secured_client,
        "/cube/sales/aggregate?identity=restricted&drilldown=returnflag"
        "&aggregates=fact_count",
    )
    assert status == 200
    flags = [c["returnflag.returnflag"] for c in data["cells"]]
    assert flags == ["A"]


def test_cubes_listing_filtered(secured_client):
    status, data = get_json(secured_client, "/cubes")
    assert status == 200
    assert data == []
    status, data = get_json(secured_client, "/cubes?identity=analyst")
    assert [c["name"] for c in data] == ["sales"]


def test_hierarchy_limits_enforced(spark):
    ws = tpch_workspace(spark, SF_DIR)
    authz = SimpleAuthorizer(rights={
        "limited": {
            "allowed_cubes": ["sales"],
            "hierarchy_limits": {
                "sales": [["customer_geo", None, "nation"]],
            },
        },
    })
    app = create_server(ws, authorizer=authz)
    app.testing = True
    client = app.test_client()

    ok = client.get(
        "/cube/sales/aggregate?identity=limited"
        "&drilldown=customer_geo:nation&aggregates=fact_count"
    )
    assert ok.status_code == 200

    denied = client.get(
        "/cube/sales/aggregate?identity=limited"
        "&drilldown=customer_geo:customer&aggregates=fact_count"
        "&pagesize=5"
    )
    assert denied.status_code == 403


def test_pipe_separator_accepted(client):
    """Reference slicer clients separate list params with '|'
    (blueprint.py:341-352)."""
    status, data = get_json(
        client,
        "/cube/sales/aggregate?drilldown=returnflag|order"
        "&aggregates=fact_count|quantity_sum",
    )
    assert status == 200
    assert set(data["cells"][0]) >= {
        "returnflag.returnflag", "order.status", "fact_count",
        "quantity_sum",
    }


def test_malformed_page_is_400(client):
    status, data = get_json(
        client, "/cube/sales/aggregate?page=abc&drilldown=returnflag"
    )
    assert status == 400
    assert "page" in data["message"]
    status, _ = get_json(
        client, "/cube/sales/aggregate?pagesize=1.5&drilldown=returnflag"
    )
    assert status == 400


def test_report_cell_as_cut_dicts(client):
    """/report 'cell' as a list of cut dicts
    (parity: blueprint.py:518-523)."""
    response = client.post(
        "/cube/sales/report",
        json={
            "cell": [{"type": "point", "dimension": "date",
                      "path": [1995]}],
            "queries": {
                "byflag": {"query": "aggregate",
                           "drilldown": ["returnflag"],
                           "aggregates": ["fact_count"]},
                "total": {"query": "aggregate",
                          "aggregates": ["fact_count"]},
            },
        },
    )
    assert response.status_code == 200
    data = json.loads(response.data)
    total = data["total"]["summary"]["fact_count"]
    assert total == sum(
        c["fact_count"] for c in data["byflag"]["cells"]
    )
    # and the cell actually filtered: less than the full fact count
    unfiltered = client.post(
        "/cube/sales/report",
        json={"queries": {"total": {"query": "aggregate",
                                    "aggregates": ["fact_count"]}}},
    )
    assert total < json.loads(unfiltered.data)["total"]["summary"][
        "fact_count"]


def test_bad_hierarchy_limit_config_is_clean_error(spark):
    ws = tpch_workspace(spark, SF_DIR)
    authz = SimpleAuthorizer(rights={
        "limited": {
            "allowed_cubes": ["sales"],
            "hierarchy_limits": {
                "sales": [["customer_geo", None, "no_such_level"]],
            },
        },
    })
    app = create_server(ws, authorizer=authz)
    app.testing = True
    client = app.test_client()
    response = client.get(
        "/cube/sales/aggregate?identity=limited"
        "&drilldown=customer_geo:nation&aggregates=fact_count"
    )
    # ConfigurationError -> CubesError handler -> 400, not a 500
    assert response.status_code == 400
    assert "no_such_level" in json.loads(response.data)["message"]


# -- authenticators ---------------------------------------------------------


def _auth_app(spark, method, **options):
    ws = tpch_workspace(spark, SF_DIR)
    authz = SimpleAuthorizer(
        rights={"alice": {"allowed_cubes": ["sales"]}},
        order="allow_deny",
    )
    from cubes_spark.server.authenticators import create_authenticator

    app = create_server(
        ws, authorizer=authz,
        authenticator=create_authenticator(method, **options),
    )
    app.testing = True
    return app.test_client()


def test_http_basic_proxy_authenticator(spark):
    import base64

    client = _auth_app(spark, "http_basic_proxy")
    # no credentials -> 401
    response = client.get("/cube/sales/aggregate?identity=alice")
    assert response.status_code == 401
    # proxy-verified basic auth: username becomes the identity
    creds = base64.b64encode(b"alice:whatever").decode()
    response = client.get(
        "/cube/sales/aggregate",
        headers={"Authorization": f"Basic {creds}"},
    )
    assert response.status_code == 200
    # forwarded-user header fallback
    response = client.get(
        "/cube/sales/aggregate", headers={"X-Forwarded-User": "alice"}
    )
    assert response.status_code == 200
    # client ?identity= claim is ignored: bob is not authorized
    creds = base64.b64encode(b"bob:whatever").decode()
    response = client.get(
        "/cube/sales/aggregate?identity=alice",
        headers={"Authorization": f"Basic {creds}"},
    )
    assert response.status_code == 403


def test_none_authenticator_ignores_identity_claims(spark):
    client = _auth_app(spark, "none")
    response = client.get("/cube/sales/aggregate?identity=alice")
    # identity is None -> no right -> not authorized, despite the claim
    assert response.status_code == 403


def test_admin_admin_authenticator(spark):
    import base64

    client = _auth_app(spark, "admin_admin")
    ok = base64.b64encode(b"alice:alice").decode()
    bad = base64.b64encode(b"alice:wrong").decode()
    assert client.get(
        "/cube/sales/aggregate",
        headers={"Authorization": f"Basic {ok}"},
    ).status_code == 200
    assert client.get(
        "/cube/sales/aggregate",
        headers={"Authorization": f"Basic {bad}"},
    ).status_code == 401


def test_search_endpoint(client):
    status, data = get_json(
        client, "/cube/sales/search?dimension=customer_geo&q=asia"
    )
    assert status == 200
    assert data["dimension"] == "customer_geo"
    assert data["total_found"] >= 1
    match = data["matches"][0]
    assert match["value"].lower().find("asia") >= 0
    assert match["level"] == "region"
    assert isinstance(match["path"], list) and len(match["path"]) == 1
    # missing params are clean 400s
    assert client.get("/cube/sales/search").status_code == 400
    assert client.get(
        "/cube/sales/search?dimension=customer_geo"
    ).status_code == 400


def test_request_logging(spark, tmp_path):
    import json as _json

    from cubes_spark.demo import tpch_workspace
    from cubes_spark.server import create_server
    from cubes_spark.server.request_log import (
        JSONLRequestLogHandler,
        RequestLogger,
    )
    from tests.conftest import SF_DIR as _SF

    log_path = tmp_path / "queries.jsonl"
    logger = RequestLogger([JSONLRequestLogHandler(str(log_path))])
    ws = tpch_workspace(spark, _SF)
    app = create_server(ws, request_logger=logger)
    app.testing = True
    c = app.test_client()

    assert c.get(
        "/cube/sales/aggregate?cut=date:1995&drilldown=returnflag"
        "&identity=alice"
    ).status_code == 200
    assert c.get("/cube/sales/facts?pagesize=2").status_code == 200

    records = [_json.loads(line) for line in
               log_path.read_text().splitlines()]
    assert [r["method"] for r in records] == ["aggregate", "facts"]
    agg = records[0]
    assert agg["cube"] == "sales"
    assert "date" in agg["cell"] and "1995" in agg["cell"]
    assert agg["identity"] == "alice"
    assert agg["elapsed_time"] > 0


def test_html_index_page(client):
    # only explicit text/html Accept (browsers) gets the page
    resp = client.get("/", headers={"Accept": "text/html,*/*;q=0.8"})
    assert resp.status_code == 200
    assert resp.mimetype == "text/html"
    text = resp.get_data(as_text=True)
    assert "sales" in text and "/cubes" in text
    # scripts with no Accept (or */*) keep the pre-page JSON behavior
    resp = client.get("/")
    assert resp.mimetype == "application/json"
    assert resp.get_json()["api_version"] == 2
    resp = client.get("/", headers={"Accept": "*/*"})
    assert resp.mimetype == "application/json"


def test_html_index_respects_authorization(spark):
    """The index page applies the same cube visibility as /cubes —
    restricted cube names must not leak to an anonymous client."""
    from cubes_spark.auth import SimpleAuthorizer
    from cubes_spark.demo import tpch_workspace
    from cubes_spark.server import create_server
    from tests.conftest import SF_DIR

    ws = tpch_workspace(spark, SF_DIR)
    authorizer = SimpleAuthorizer(
        rights={"alice": {"allowed_cubes": ["sales"]}})
    c = create_server(ws, authorizer=authorizer).test_client()
    anon = c.get("/", headers={"Accept": "text/html"})         .get_data(as_text=True)
    assert "sales" not in anon
    seen = c.get("/?identity=alice", headers={"Accept": "text/html"})         .get_data(as_text=True)
    assert "sales" in seen


def test_html_cross_table_format(client):
    resp = client.get(
        "/cube/sales/aggregate?drilldown=returnflag"
        "&aggregates=fact_count&format=html_cross_table"
        "&oncolumns=returnflag.returnflag")
    assert resp.status_code == 200
    assert resp.mimetype == "text/html"
    text = resp.get_data(as_text=True)
    assert text.startswith("<table")
    assert "<th>A</th>" in text or "<th>R</th>" in text


def test_logout_default_and_basic(spark):
    from cubes_spark.demo import tpch_workspace
    from cubes_spark.server import create_server
    from tests.conftest import SF_DIR

    ws = tpch_workspace(spark, SF_DIR)
    # default (pass_parameter): plain-text logout
    c = create_server(ws).test_client()
    resp = c.get("/logout")
    assert resp.status_code == 200
    assert b"logged out" in resp.data
    # admin_admin (HTTP Basic): 401 + WWW-Authenticate to clear creds
    c = create_server(ws, authenticator="admin_admin").test_client()
    resp = c.get("/logout")
    assert resp.status_code == 401
    assert resp.headers["WWW-Authenticate"].startswith("Basic")


def test_visualizer_redirect_and_cors(spark):
    from cubes_spark.demo import tpch_workspace
    from cubes_spark.server import create_server
    from tests.conftest import SF_DIR

    ws = tpch_workspace(spark, SF_DIR)
    app = create_server(ws, visualizer="http://viz.example/x",
                        allow_cors_origin="*")
    c = app.test_client()
    resp = c.get("/visualizer/")
    assert resp.status_code == 302
    assert resp.headers["Location"] == "http://viz.example/x"
    resp = c.get("/version")
    assert resp.headers["Access-Control-Allow-Origin"] == "*"
    # not configured -> 404
    c2 = create_server(ws).test_client()
    assert c2.get("/visualizer/index.html").status_code == 404
    assert "Access-Control-Allow-Origin" not in \
        c2.get("/version").headers


def _restricted_client(spark, **kwargs):
    from cubes_spark.auth import SimpleAuthorizer
    from cubes_spark.demo import tpch_workspace
    from cubes_spark.server import create_server
    from tests.conftest import SF_DIR

    ws = tpch_workspace(spark, SF_DIR)
    authorizer = SimpleAuthorizer(rights={
        "alice": {"allowed_cubes": ["sales"], **kwargs},
    })
    return create_server(ws, authorizer=authorizer).test_client()


def test_hierarchy_limit_string_form(spark):
    """'dim:level' string limits (the reference's documented form)
    must be parsed, not iterated char-wise into nothing."""
    c = _restricted_client(
        spark, hierarchy_limits={"sales": ["date:month"]})
    ok = c.get("/cube/sales/aggregate?identity=alice"
               "&drilldown=date:month&aggregates=fact_count")
    assert ok.status_code == 200
    deep = c.get("/cube/sales/aggregate?identity=alice"
                 "&drilldown=date:day&aggregates=fact_count")
    assert deep.status_code == 403
    # a spec WITHOUT an explicit level drills one level (year) — that
    # is within the month limit and must not be false-denied
    default = c.get("/cube/sales/aggregate?identity=alice"
                    "&drilldown=date&aggregates=fact_count")
    assert default.status_code == 200


def test_search_honors_restriction_cell(spark):
    """/search must not enumerate member values outside the
    identity's restriction cell (side-channel around /members)."""
    c = _restricted_client(
        spark,
        cell_restrictions={"sales": ["returnflag:A"]})
    resp = c.get("/cube/sales/search?identity=alice"
                 "&dimension=returnflag&q=R")
    assert resp.status_code == 200
    hits = [m for m in resp.get_json()["matches"]]
    assert hits == []
    resp = c.get("/cube/sales/search?identity=alice"
                 "&dimension=returnflag&q=A")
    assert any(m.get("value") == "A" or "A" in str(m)
               for m in resp.get_json()["matches"])


def test_hidden_restriction_cuts_not_disclosed(spark):
    """/cell and /aggregate responses must not serialize the
    authorizer's hidden restriction cuts."""
    c = _restricted_client(
        spark,
        cell_restrictions={"sales": ["returnflag:A"]})
    cell = c.get("/cube/sales/cell?identity=alice").get_json()
    assert all("returnflag" not in str(cut.get("dimension"))
               for cut in cell["cuts"])
    agg = c.get("/cube/sales/aggregate?identity=alice"
                "&aggregates=fact_count").get_json()
    assert all("returnflag" not in str(cut.get("dimension"))
               for cut in agg["cell"])
    # ...but the restriction is ENFORCED (A-only count < total)
    free = _restricted_client(spark).get(
        "/cube/sales/aggregate?identity=alice&aggregates=fact_count"
    ).get_json()
    assert agg["summary"]["fact_count"] < free["summary"]["fact_count"]


def test_fact_by_key_honors_restriction_cell(spark):
    """Key enumeration must not read facts outside the restriction."""
    c = _restricted_client(
        spark,
        cell_restrictions={"sales": ["returnflag:A"]})
    # find one fact id per flag via the unrestricted workspace
    from cubes_spark.demo import tpch_workspace
    from tests.conftest import SF_DIR

    ws = tpch_workspace(spark, SF_DIR)
    b = ws.browser("sales")
    rows = b.facts(fields=["fact_key", "returnflag.returnflag"]) \
        .collect()
    # the fact key (order key) is not unique per flag: pick keys whose
    # EVERY row carries the target flag so the probe is unambiguous
    flags_by_key: dict = {}
    for r in rows:
        flags_by_key.setdefault(r["fact_key"], set()).add(
            r["returnflag.returnflag"])
    only_a = next(k for k, v in flags_by_key.items() if v == {"A"})
    only_r = next(k for k, v in flags_by_key.items() if v == {"R"})
    ok = c.get(f"/cube/sales/fact/{only_a}?identity=alice")
    assert ok.status_code == 200
    denied = c.get(f"/cube/sales/fact/{only_r}?identity=alice")
    assert denied.status_code == 404
