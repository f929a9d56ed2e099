"""HTTP response caching for the slicer server (parity:
reference ``cubes/server/caching.py`` — Cache base class with
get/set/rem + item sugar, the ``@cacheable`` method decorator, and a
TTL'd backend; the Mongo backend is replaced by a dependency-free
in-process LRU+TTL store, and the HTTP layer adds proper ``ETag`` /
``Cache-Control: max-age`` / ``304 Not Modified`` semantics that the
reference's response pickling never had).

Design notes for a Spark-backed server: an aggregate response is the
result of a distributed job, so revalidation has to be CHEAP — the
ETag is a strong hash of the serialized body, the cache key is the
canonicalized request (path + sorted query + identity), and a hit
serves bytes without touching the SparkSession.  Identity is part of
the key because authorization shapes responses (restriction cells,
allowed cubes); a shared proxy must never serve one identity's cells
to another (also signalled with ``Vary``).
"""

from __future__ import annotations

import hashlib
import logging
import threading
import time
from collections import OrderedDict
from functools import update_wrapper, wraps
from typing import Any, Callable, Optional, Tuple

__all__ = ["Cache", "MemoryCache", "cacheable", "make_key",
           "cached_response"]

logger = logging.getLogger("cubes_spark.server.caching")


def make_key(name: str, *args: Any, **kwargs: Any) -> str:
    """Deterministic cache key ``name::arg::k=v`` (parity: reference
    caching.py:14-22 _make_key_str; kwargs sorted)."""
    key = name
    if args:
        key += "::" + "::".join(str(a) for a in args)
    if kwargs:
        key += "::" + "::".join(
            f"{k}={v}" for k, v in sorted(kwargs.items()))
    return key


class Cache:
    """get/set/rem interface with item-access sugar (parity:
    reference caching.py:96-105)."""

    def get(self, key: str) -> Any:
        raise NotImplementedError

    def set(self, key: str, value: Any,
            ttl: Optional[float] = None) -> bool:
        raise NotImplementedError

    def rem(self, key: str) -> bool:
        raise NotImplementedError

    def __setitem__(self, key: str, value: Any) -> bool:
        return self.set(key, value)

    def __getitem__(self, key: str) -> Any:
        return self.get(key)

    def __delitem__(self, key: str) -> bool:
        return self.rem(key)


class MemoryCache(Cache):
    """Thread-safe in-process LRU with per-entry TTL — the default
    backend (the reference's MongoCache role, caching.py:117-174,
    without the external datastore).  ``maxsize`` bounds memory;
    stale entries are dropped on read, LRU order evicts on write."""

    def __init__(self, ttl: float = 60.0, maxsize: int = 1024,
                 ttl_strategy: Optional[Callable[[Any],
                                                 Optional[float]]] = None,
                 ) -> None:
        self.ttl = ttl
        self.maxsize = maxsize
        self.ttl_strategy = ttl_strategy or (lambda value: None)
        self._data: "OrderedDict[str, Tuple[float, Any]]" = OrderedDict()
        self._lock = threading.Lock()

    def set(self, key: str, value: Any,
            ttl: Optional[float] = None) -> bool:
        t = ttl or self.ttl_strategy(value) or self.ttl
        expires = time.monotonic() + t
        with self._lock:
            self._data.pop(key, None)
            self._data[key] = (expires, value)
            while len(self._data) > self.maxsize:
                self._data.popitem(last=False)
        return True

    def get(self, key: str) -> Any:
        now = time.monotonic()
        with self._lock:
            item = self._data.get(key)
            if item is None:
                return None
            expires, value = item
            if expires < now:
                del self._data[key]
                return None
            self._data.move_to_end(key)
            return value

    def rem(self, key: str) -> bool:
        with self._lock:
            return self._data.pop(key, None) is not None

    def clear(self) -> None:
        with self._lock:
            self._data.clear()


def cacheable(fn: Callable) -> Callable:
    """Method decorator: memoize through ``self.cache`` when present
    (parity: reference caching.py:58-93 — including the
    warn-and-compute fallback when the object has no cache, and the
    compute-then-best-effort-store path on backend errors)."""

    @wraps(fn)
    def _cache(self: Any, *args: Any, **kwargs: Any) -> Any:
        cache = getattr(self, "cache", None)
        if cache is None:
            logger.warning(
                "Object %r is not configured with a cache for "
                "@cacheable %s", self, fn.__name__)
            return fn(self, *args, **kwargs)
        extra = dict(getattr(self, "args", {}) or {})
        extra.update(kwargs)
        key = make_key(f"{type(self).__name__}.{fn.__name__}",
                       *args, **extra)
        try:
            value = cache.get(key)
            if value is None:
                value = fn(self, *args, **kwargs)
                cache.set(key, value)
            return value
        except Exception:
            logger.exception("cache error, skipping cache")
            return fn(self, *args, **kwargs)

    return update_wrapper(_cache, fn)


def cached_response(action: str) -> Callable:
    """Flask view decorator: HTTP caching for idempotent browse GETs.

    Always: strong ``ETag`` on the response and ``304 Not Modified``
    when the client's ``If-None-Match`` matches — a revalidation
    round-trip never reruns the Spark job if the body is byte-equal.

    With a cache configured (``app.config['http_cache']`` non-None):
    responses are served from the cache for ``http_cache_ttl`` seconds
    keyed on (path, sorted query, identity), with
    ``Cache-Control: max-age=<remaining>`` advertising freshness and
    ``Vary: X-Identity, Authorization`` guarding shared proxies.
    """

    def decorator(fn: Callable) -> Callable:
        @wraps(fn)
        def view(*args: Any, **kwargs: Any):
            from flask import current_app, request

            cache = current_app.config.get("http_cache")
            ttl = current_app.config.get("http_cache_ttl", 60)

            def finalize(response, age: float = 0.0):
                response.set_etag(
                    hashlib.md5(response.get_data()).hexdigest())
                response.headers["Vary"] = "X-Identity, Authorization"
                if cache:
                    remaining = max(int(ttl - age), 0)
                    response.headers["Cache-Control"] = \
                        f"max-age={remaining}"
                if request.method in ("GET", "HEAD"):
                    # werkzeug turns a matching If-None-Match into 304
                    response = response.make_conditional(request)
                return response

            if not cache or request.method != "GET":
                return finalize(fn(*args, **kwargs))

            from cubes_spark.server.app import _identity

            query = "&".join(
                f"{k}={v}" for k in sorted(request.args)
                for v in request.args.getlist(k))
            key = make_key(f"http.{action}", request.path, query,
                           identity=_identity() or "")
            hit = cache.get(key)
            if hit is not None:
                body, status, mimetype, stored_at = hit
                from flask import Response

                response = Response(body, status=status,
                                    mimetype=mimetype)
                response.headers["X-Cache"] = "HIT"
                return finalize(response, age=time.monotonic()
                                - stored_at)
            response = fn(*args, **kwargs)
            if response.status_code == 200:
                cache.set(key, (response.get_data(),
                                response.status_code,
                                response.mimetype,
                                time.monotonic()), ttl=ttl)
            response.headers["X-Cache"] = "MISS"
            return finalize(response)

        return view

    return decorator
