"""Remote Slicer store: use another Slicer OLAP server as a data
store — aggregation runs on the remote server and results are
relayed (parity: reference ``cubes/server/store.py:19-130``
SlicerStore, ``cubes/server/store.py:141-186`` SlicerModelProvider,
``cubes/server/browser.py:8-173`` SlicerBrowser).

Spark-first framing: this backend is deliberately NOT a Spark
execution path — it federates a cube to a remote engine over the
published HTTP protocol, so a workspace can mix local Spark cubes
with cubes served elsewhere (the reference's only federation
mechanism).  The remote side may itself be a ``cubes_spark`` server,
which is exactly what the loopback integration test drives.

Protocol surface used (all read-only GETs, matching the routes in
``cubes_spark/server/app.py``):

* ``/cubes``                              — model discovery
* ``/cube/<name>/model``                  — cube + expanded dimensions
* ``/cube/<name>/aggregate``              — summary/cells/levels
* ``/cube/<name>/facts``                  — fact listing (JSON rows)
* ``/cube/<name>/fact/<id>``              — single fact
* ``/cube/<name>/members/<dim>``          — dimension members
* ``/cube/<name>/cell``                   — cell details

Authentication mirrors the reference options: ``pass_parameter``
(identity appended as a URL parameter, default name ``api_key``) or
HTTP basic auth via ``username``/``password``.
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Any, Callable, Dict, List, Optional, Tuple

from cubes_spark.errors import (
    ArgumentError,
    BackendError,
    ConfigurationError,
    MissingObjectError,
)
from cubes_spark.metadata.cube import Cube
from cubes_spark.metadata.dimension import Dimension
from cubes_spark.query.cells import Cell, cuts_from_string
from cubes_spark.query.result import AggregationResult

__all__ = ["SlicerHTTPStore", "SlicerBrowser", "create_slicer_cube"]

DEFAULT_SLICER_URL = "http://localhost:5000"


def _default_transport(url: str,
                       headers: Dict[str, str]) -> Tuple[int, bytes]:
    """GET ``url`` → (status, body).  Separated out so tests (and
    embedded deployments) can inject a transport that talks to an
    in-process WSGI app instead of a socket."""
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.getcode(), resp.read()
    except urllib.error.HTTPError as exc:  # 4xx/5xx carry a body too
        return exc.code, exc.read()


class SlicerHTTPStore:
    """HTTP client for a remote Slicer server (parity: reference
    server/store.py:19-130).

    Options
    -------
    url: base URL of the remote server (default ``localhost:5000``).
    authentication: ``pass_parameter`` or ``none``.
    auth_identity / auth_parameter: identity value and URL parameter
        name (default ``api_key``) for ``pass_parameter``.
    username / password: HTTP basic auth credentials.
    transport: optional ``(url, headers) -> (status, bytes)``
        callable replacing the urllib opener.
    """

    related_model_provider = "slicer"

    def __init__(self, url: Optional[str] = None,
                 authentication: Optional[str] = None,
                 auth_identity: Optional[str] = None,
                 auth_parameter: Optional[str] = None,
                 username: Optional[str] = None,
                 password: Optional[str] = None,
                 transport: Optional[Callable[..., Tuple[int, bytes]]]
                 = None,
                 **options: Any) -> None:
        if authentication and authentication not in (
                "pass_parameter", "none"):
            raise ConfigurationError(
                f"Unsupported authentication method '{authentication}'")
        self.url = (url or DEFAULT_SLICER_URL).rstrip("/")
        self.authentication = authentication
        self.auth_identity = auth_identity
        self.auth_parameter = auth_parameter or "api_key"
        self._headers: Dict[str, str] = {}
        if username is not None and password is not None:
            token = base64.b64encode(
                f"{username}:{password}".encode()).decode()
            self._headers["Authorization"] = f"Basic {token}"
        self.transport = transport or _default_transport

    # -- protocol ----------------------------------------------------------

    def request(self, action: str,
                params: Optional[dict] = None) -> Any:
        """GET ``<url>/<action>?<params>`` → parsed JSON.  404 raises
        MissingObjectError, other non-200 raises BackendError (parity:
        server/store.py:92-126)."""
        params = dict(params or {})
        if self.authentication == "pass_parameter":
            params[self.auth_parameter] = self.auth_identity
        query = urllib.parse.urlencode(
            {k: v for k, v in params.items() if v is not None})
        request_url = f"{self.url}/{action.lstrip('/')}"
        if query:
            request_url += "?" + query
        status, body = self.transport(request_url, dict(self._headers))
        if status == 404:
            raise MissingObjectError(
                f"Remote slicer has no '{action}'")
        if status != 200:
            raise BackendError(
                f"Slicer request error ({status}): "
                f"{body[:500]!r}")
        try:
            return json.loads(body)
        except ValueError:
            return {}

    def cube_request(self, action: str, cube: str,
                     params: Optional[dict] = None) -> Any:
        return self.request(f"cube/{cube}/{action}", params)

    # -- model provider (parity: server/store.py:141-186) ------------------

    def list_cubes(self) -> List[dict]:
        return self.request("cubes")

    def cube(self, name: str, locale: Optional[str] = None) -> Cube:
        params = {"lang": locale} if locale else None
        try:
            desc = self.cube_request("model", name, params)
        except MissingObjectError:
            from cubes_spark.errors import NoSuchCubeError
            raise NoSuchCubeError(f"Unknown remote cube '{name}'", name)
        return create_slicer_cube(desc, self)


def create_slicer_cube(desc: dict, store: SlicerHTTPStore) -> Cube:
    """Build a linked Cube from a remote ``/cube/<name>/model``
    response (dimensions arrive fully expanded, not as name links —
    parity: server/store.py:160-184)."""
    desc = dict(desc)
    dimensions = desc.pop("dimensions", [])
    # mappings/joins describe the REMOTE server's physical schema;
    # they must not leak into local planning
    desc.pop("mappings", None)
    desc.pop("joins", None)
    features = desc.pop("features", None)
    if features:
        browser_options = desc.pop("browser_options", {}) or {}
        browser_options["features"] = features
        desc["browser_options"] = browser_options
    cube = Cube.from_metadata(desc)
    for dim_md in dimensions:
        if isinstance(dim_md, dict):
            cube.link_dimension(Dimension.from_metadata(dim_md))
    cube.store = store
    # the name the REMOTE server addresses this cube by — survives any
    # local re-registration under a workspace namespace prefix
    cube.remote_name = cube.name
    return cube


class SlicerBrowser:
    """Aggregation browser over a remote Slicer server (parity:
    reference server/browser.py:8-173): every operation serializes
    its arguments to the published URL parameters, relays the HTTP
    response and re-wraps it in the local result types, so callers
    cannot tell a federated cube from a local Spark one."""

    def __init__(self, cube: Cube, store: SlicerHTTPStore,
                 locale: Optional[str] = None, **options: Any) -> None:
        self.cube = cube
        self.store = store
        self.locale = locale
        self._remote_name = getattr(cube, "remote_name", None) \
            or cube.basename

    # -- helpers -----------------------------------------------------------

    def _cut_param(self, cell: Any) -> Optional[str]:
        if cell is None:
            return None
        if isinstance(cell, str):
            return cell or None
        if isinstance(cell, Cell):
            s = cell.to_str()
            return s or None
        raise ArgumentError(f"Unknown cell: {cell!r}")

    def prepare_cell(self, cell: Any = None) -> Cell:
        if isinstance(cell, Cell):
            return cell
        if cell is None:
            return Cell(self.cube)
        return Cell(self.cube, cuts_from_string(self.cube, str(cell)))

    @staticmethod
    def _order_param(order: Any) -> Optional[str]:
        if not order:
            return None
        items = []
        for item in order if not isinstance(order, str) else [order]:
            if isinstance(item, (tuple, list)):
                items.append(f"{item[0]}:{item[1]}")
            else:
                items.append(str(item))
        return ",".join(items)

    def features(self) -> dict:
        features = dict(
            (self.cube.browser_options or {}).get("features", {}))
        features["actions"] = [
            "aggregate", "facts", "fact", "cell", "members"]
        return features

    # -- operations --------------------------------------------------------

    def aggregate(self, cell: Any = None,
                  aggregates: Optional[list] = None,
                  measures: Optional[list] = None,
                  drilldown: Any = None, split: Any = None,
                  order: Any = None, page: Optional[int] = None,
                  page_size: Optional[int] = None,
                  **options: Any) -> AggregationResult:
        params: Dict[str, Any] = {"cut": self._cut_param(cell)}
        if drilldown:
            if isinstance(drilldown, str):
                drilldown = [drilldown]
            params["drilldown"] = ",".join(str(d) for d in drilldown)
        if split is not None:
            params["split"] = self._cut_param(split) \
                if not isinstance(split, str) else split
        if aggregates:
            params["aggregates"] = ",".join(
                str(a) for a in aggregates)
        if measures:
            params["measures"] = ",".join(str(m) for m in measures)
        params["order"] = self._order_param(order)
        if page is not None:
            params["page"] = page
        if page_size is not None:
            params["pagesize"] = page_size

        response = self.store.cube_request(
            "aggregate", self._remote_name, params)

        result = AggregationResult()
        result.cells = response.get("cells", [])
        result.summary = response.get("summary") or {}
        result.levels = response.get("levels")
        result.labels = response.get("labels", [])
        result.total_cell_count = response.get("total_cell_count")
        result.remainder = response.get("remainder") or {}
        result.aggregates = response.get("aggregates", [])
        result.cell = self.prepare_cell(cell)
        return result

    def facts(self, cell: Any = None, fields: Optional[list] = None,
              order: Any = None, page: Optional[int] = None,
              page_size: Optional[int] = None,
              **options: Any) -> List[dict]:
        params: Dict[str, Any] = {
            "cut": self._cut_param(cell),
            "order": self._order_param(order),
        }
        if page is not None:
            params["page"] = page
        if page_size is not None:
            params["pagesize"] = page_size
        if fields:
            params["fields"] = ",".join(str(f) for f in fields)
        return self.store.cube_request(
            "facts", self._remote_name, params)

    def fact(self, key_value: Any, **options: Any) -> Optional[dict]:
        try:
            return self.store.request(
                f"cube/{self._remote_name}/fact/{key_value}")
        except MissingObjectError:
            return None

    def members(self, cell: Any = None, dimension: Any = None,
                level: Any = None, depth: Optional[int] = None,
                hierarchy: Any = None, page: Optional[int] = None,
                page_size: Optional[int] = None, order: Any = None,
                **options: Any) -> List[dict]:
        params: Dict[str, Any] = {
            "cut": self._cut_param(cell),
            "order": self._order_param(order),
        }
        if level is not None:
            params["level"] = str(level)
        if depth is not None:
            params["depth"] = depth
        if hierarchy is not None:
            params["hierarchy"] = str(hierarchy)
        if page is not None:
            params["page"] = page
        if page_size is not None:
            params["pagesize"] = page_size
        response = self.store.request(
            f"cube/{self._remote_name}/members/{dimension}", params)
        return response.get("data", [])

    def cell_details(self, cell: Any = None,
                     dimension: Any = None) -> list:
        params: Dict[str, Any] = {"cut": self._cut_param(cell)}
        if dimension is not None:
            params["dimension"] = str(dimension)
        response = self.store.cube_request(
            "cell", self._remote_name, params)
        return [cut.get("details") for cut in response.get("cuts", [])]

    def is_builtin_function(self, name: str, aggregate: Any) -> bool:
        # the remote server computes; accept whatever it declares
        # (parity: server/browser.py:168-169)
        return True
