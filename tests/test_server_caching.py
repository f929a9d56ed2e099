"""HTTP caching on the slicer server (parity:
/root/reference/cubes/server/caching.py — Cache/@cacheable/TTL
backend; plus proper ETag / max-age / 304 semantics)."""

import json

import pytest

from cubes_spark.demo import tpch_workspace
from cubes_spark.server import create_server
from cubes_spark.server.caching import (
    Cache,
    MemoryCache,
    cacheable,
    make_key,
)
from tests.conftest import SF_DIR

AGG_URL = ("/cube/sales/aggregate?drilldown=date"
           "&aggregates=price_sum")


@pytest.fixture(scope="module")
def cached_client(spark):
    ws = tpch_workspace(spark, SF_DIR)
    app = create_server(ws, http_cache=True, http_cache_ttl=300)
    app.testing = True
    return app.test_client()


@pytest.fixture(scope="module")
def plain_client(spark):
    ws = tpch_workspace(spark, SF_DIR)
    app = create_server(ws)
    app.testing = True
    return app.test_client()


def test_etag_and_304_without_cache(plain_client):
    first = plain_client.get(AGG_URL)
    assert first.status_code == 200
    etag = first.headers["ETag"]
    assert etag
    assert "Cache-Control" not in first.headers

    revalidate = plain_client.get(
        AGG_URL, headers={"If-None-Match": etag})
    assert revalidate.status_code == 304
    assert revalidate.data == b""

    stale = plain_client.get(
        AGG_URL, headers={"If-None-Match": '"deadbeef"'})
    assert stale.status_code == 200


def test_cache_hit_serves_same_body(cached_client):
    first = cached_client.get(AGG_URL)
    assert first.status_code == 200
    assert first.headers["X-Cache"] == "MISS"
    assert first.headers["Cache-Control"].startswith("max-age=")
    second = cached_client.get(AGG_URL)
    assert second.headers["X-Cache"] == "HIT"
    assert second.data == first.data
    assert json.loads(second.data)["summary"]


def test_cache_key_includes_identity_and_query(cached_client):
    a = cached_client.get(AGG_URL + "&identity=alice")
    b = cached_client.get(AGG_URL + "&identity=bob")
    assert a.headers["X-Cache"] == "MISS"
    assert b.headers["X-Cache"] == "MISS"
    assert "Vary" in a.headers
    other = cached_client.get(
        "/cube/sales/aggregate?drilldown=returnflag"
        "&aggregates=price_sum")
    assert other.headers["X-Cache"] == "MISS"
    assert json.loads(other.data)["cells"] != \
        json.loads(cached_client.get(AGG_URL).data)["cells"]


def test_cached_304_revalidation(cached_client):
    first = cached_client.get(AGG_URL)
    etag = first.headers["ETag"]
    revalidate = cached_client.get(
        AGG_URL, headers={"If-None-Match": etag})
    assert revalidate.status_code == 304


def test_facts_and_members_cached(cached_client):
    for url in ("/cube/sales/facts?pagesize=3",
                "/cube/sales/members/returnflag"):
        first = cached_client.get(url)
        assert first.status_code == 200
        second = cached_client.get(url)
        assert second.headers["X-Cache"] == "HIT"
        assert second.data == first.data


def test_memory_cache_ttl_and_lru(monkeypatch):
    import cubes_spark.server.caching as mod

    now = [1000.0]
    monkeypatch.setattr(mod.time, "monotonic", lambda: now[0])
    cache = MemoryCache(ttl=10, maxsize=2)
    cache.set("a", 1)
    assert cache.get("a") == 1
    now[0] += 11
    assert cache.get("a") is None            # expired
    cache.set("a", 1)
    cache.set("b", 2)
    assert cache.get("a") == 1               # refresh LRU order
    cache.set("c", 3)                        # evicts b
    assert cache.get("b") is None
    assert cache.get("a") == 1 and cache.get("c") == 3
    assert cache.rem("a") is True
    assert cache.rem("a") is False
    cache["x"] = 9
    assert cache["x"] == 9
    del cache["x"]
    assert cache["x"] is None


def test_cacheable_decorator():
    calls = []

    class Browser:
        def __init__(self, cache):
            self.cache = cache

        @cacheable
        def compute(self, x, mult=2):
            calls.append(x)
            return x * mult

    b = Browser(MemoryCache(ttl=60))
    assert b.compute(3) == 6
    assert b.compute(3) == 6
    assert calls == [3]                      # memoized
    assert b.compute(4, mult=3) == 12
    assert calls == [3, 4]

    # no cache attribute → warn-and-compute fallback
    class Bare:
        cache = None

        @cacheable
        def compute(self, x):
            calls.append(x)
            return x

    assert Bare().compute(5) == 5
    assert calls == [3, 4, 5]

    # broken backend → compute anyway
    class Broken(Cache):
        def get(self, key):
            raise RuntimeError("down")

    b2 = Browser(Broken())
    assert b2.compute(7) == 14


def test_make_key_deterministic():
    k1 = make_key("n", 1, "x", b=2, a=1)
    k2 = make_key("n", 1, "x", a=1, b=2)
    assert k1 == k2 == "n::1::x::a=1::b=2"
