"""Extension discovery: builtins + setuptools entry points.

Parity surface: /root/reference/cubes/ext.py:75-260 (`_Extension` /
`ExtensionFinder` over ``pkg_resources`` entry points feeding
browsers, stores, formatters, authenticators into the workspace and
server).  Re-expressed on ``importlib.metadata`` — any installed
distribution can contribute an extension by declaring::

    [project.entry-points."cubes_spark.formatter"]
    my_format = my_package.formats:MyFormatter

and a server request for ``?format=my_format`` (or a config
``authentication = my_method`` …) finds it without this package
changing.  One finder per extension type, module-level, lazily
loaded; the factory's ``__extension_name__`` / ``__label__`` /
``__description__`` attributes feed ``slicer ext-info``.
"""

from __future__ import annotations

import importlib
from importlib import metadata as _ilmd
from typing import Any, Callable, Dict, Optional

from cubes_spark.errors import ArgumentError, InternalError

__all__ = [
    "EXTENSION_TYPES",
    "ExtensionFinder",
    "aggregate_function",
    "authenticator",
    "authorizer",
    "calculator",
    "formatter",
    "model_provider",
    "request_log_handler",
    "store",
]

#: extension type -> human description (parity: reference
#: EXTENSION_TYPES; `browser` is not a separate extension point here —
#: there is one Spark browser.  `model_provider` IS one (parity:
#: reference ext.py:75-260 + metadata/providers.py:156-432), in the
#: thin form Workspace.import_model consumes: a provider turns an
#: opaque source into model metadata)
EXTENSION_TYPES: Dict[str, str] = {
    "aggregate_function": "Aggregate function",
    "model_provider": "Model metadata provider",
    "calculator": "Post-aggregation window calculator",
    "formatter": "Result formatter",
    "authenticator": "Server authenticator",
    "authorizer": "Authorizer",
    "request_log_handler": "Request log handler",
    "store": "Data store",
    "searcher": "Member search backend",
}

#: built-in extensions, loaded lazily by dotted path (parity:
#: reference _BUILTIN_EXTENSIONS)
_BUILTINS: Dict[str, Dict[str, str]] = {
    "formatter": {
        "cross_table": "cubes_spark.formatters:CrossTableFormatter",
        "html_cross_table":
            "cubes_spark.formatters:HTMLCrossTableFormatter",
        "csv": "cubes_spark.formatters:CSVFormatter",
        "json_lines": "cubes_spark.formatters:JSONLinesFormatter",
        "xlsx": "cubes_spark.formatters:XLSXFormatter",
    },
    "authenticator": {
        "none": "cubes_spark.server.authenticators:NoneAuthenticator",
        "pass_parameter":
            "cubes_spark.server.authenticators:PassParameterAuthenticator",
        "http_basic_proxy":
            "cubes_spark.server.authenticators:HTTPBasicProxyAuthenticator",
        "admin_admin":
            "cubes_spark.server.authenticators:AdminAdminAuthenticator",
    },
    "authorizer": {
        "simple": "cubes_spark.auth:SimpleAuthorizer",
    },
    "request_log_handler": {
        "default":
            "cubes_spark.server.request_log:DefaultRequestLogHandler",
        "jsonl": "cubes_spark.server.request_log:JSONLRequestLogHandler",
    },
    "store": {
        "parquet": "cubes_spark.sources.workspace:ParquetStore",
        "spark": "cubes_spark.sources.workspace:ParquetStore",
        "slicer": "cubes_spark.sources.slicer:SlicerHTTPStore",
        "slicer_http": "cubes_spark.sources.slicer:SlicerHTTPStore",
    },
    "searcher": {
        "simple": "cubes_spark.server.search:SimpleSearcher",
    },
    "model_provider": {
        "default": "cubes_spark.metadata.providers:StaticModelProvider",
        "static": "cubes_spark.metadata.providers:StaticModelProvider",
    },
    # aggregate_function / calculator builtins live in their own
    # registries (functions/aggregates.py, functions/calculators.py);
    # the finders below only ADD entry-point extras to those
}


def _load_dotted(path: str) -> Any:
    modname, _, attr = path.partition(":")
    module = importlib.import_module(modname)
    try:
        return getattr(module, attr)
    except AttributeError:
        raise InternalError(
            f"Extension path '{path}': module '{modname}' has no "
            f"attribute '{attr}'")


class Extension:
    """A named factory with lazy loading (parity: reference
    ext.py:77-168 `_Extension`)."""

    def __init__(self, type_: str, name: str,
                 factory: Optional[Callable] = None,
                 entry: Any = None) -> None:
        if (factory is None) == (entry is None):
            raise ArgumentError(
                f"Extension '{name}': exactly one of factory/entry "
                f"required")
        self.type_ = type_
        self.name = name
        self.entry = entry
        self._factory = factory

    @property
    def factory(self) -> Callable:
        if self._factory is None:
            self._factory = self.entry.load()
        return self._factory

    @property
    def is_builtin(self) -> bool:
        return self.entry is None

    @property
    def label(self) -> str:
        return getattr(self.factory, "__label__", self.factory.__name__)

    @property
    def description(self) -> str:
        return getattr(self.factory, "__description__", "") or ""

    def create(self, *args: Any, **kwargs: Any) -> Any:
        return self.factory(*args, **kwargs)


class ExtensionFinder:
    """All extensions of one type: builtins, programmatic registrations
    and ``cubes_spark.<type>`` entry points (parity: reference
    ext.py:171-260)."""

    def __init__(self, type_: str) -> None:
        self.type_ = type_
        self.group = f"cubes_spark.{type_}"
        self._extensions: Dict[str, Extension] = {}
        self._discovered = False

    def discover(self) -> None:
        """Scan installed distributions once per finder; precedence:
        explicit register() and entry points shadow builtins (get()
        always discovers before falling back to a builtin, so
        resolution does not depend on call order)."""
        if self._discovered:
            return
        self._discovered = True
        for ep in _ilmd.entry_points(group=self.group):
            self._extensions.setdefault(
                ep.name, Extension(self.type_, ep.name, entry=ep))

    def register(self, name: str, factory: Callable) -> Extension:
        ext = Extension(self.type_, name, factory=factory)
        self._extensions[name] = ext
        return ext

    def names(self) -> list:
        self.discover()
        builtin = _BUILTINS.get(self.type_, {})
        return sorted(set(builtin) | set(self._extensions))

    def get(self, name: str) -> Extension:
        # discover FIRST so resolution is deterministic: an entry
        # point shadowing a builtin name always wins, regardless of
        # whether names()/__contains__ happened to run earlier
        # (precedence: register() == entry points > builtins)
        self.discover()
        ext = self._extensions.get(name)
        if ext is None and name in _BUILTINS.get(self.type_, {}):
            ext = Extension(self.type_, name,
                            factory=_load_dotted(
                                _BUILTINS[self.type_][name]))
            self._extensions[name] = ext
        if ext is None:
            raise InternalError(
                f"Unknown {self.type_} extension '{name}' "
                f"(known: {self.names()})")
        return ext

    def factory(self, name: str) -> Callable:
        return self.get(name).factory

    def create(self, _ext_name: str, *args: Any, **kwargs: Any) -> Any:
        return self.get(_ext_name).create(*args, **kwargs)

    def __call__(self, _ext_name: str, *args: Any, **kwargs: Any) -> Any:
        return self.create(_ext_name, *args, **kwargs)

    def __contains__(self, name: str) -> bool:
        if name in _BUILTINS.get(self.type_, {}):
            return True
        self.discover()
        return name in self._extensions


aggregate_function = ExtensionFinder("aggregate_function")
calculator = ExtensionFinder("calculator")
formatter = ExtensionFinder("formatter")
authenticator = ExtensionFinder("authenticator")
authorizer = ExtensionFinder("authorizer")
request_log_handler = ExtensionFinder("request_log_handler")
store = ExtensionFinder("store")
searcher = ExtensionFinder("searcher")
model_provider = ExtensionFinder("model_provider")

_FINDERS: Dict[str, ExtensionFinder] = {
    "model_provider": model_provider,
    "aggregate_function": aggregate_function,
    "calculator": calculator,
    "formatter": formatter,
    "authenticator": authenticator,
    "authorizer": authorizer,
    "request_log_handler": request_log_handler,
    "store": store,
    "searcher": searcher,
}


def finder(type_: str) -> ExtensionFinder:
    try:
        return _FINDERS[type_]
    except KeyError:
        raise ArgumentError(
            f"Unknown extension type '{type_}' "
            f"(expected one of {sorted(_FINDERS)})")
