"""Model providers — the ``model_provider`` extension type.

Parity surface: /root/reference/cubes/metadata/providers.py:156-432
(`ModelProvider` / `StaticModelProvider`) + ext.py:75-260 (provider
resolution through the extension registry).  The reference makes
providers a full lazy lookup object (per-cube/per-dimension calls
backed by a store); this engine keeps models declarative, so the
provider protocol is the THIN form :meth:`Workspace.import_model`
consumes: a provider turns an opaque source — a dict, a file, a
database catalog, a remote registry — into one model-metadata dict.
A reference user's custom provider ports by implementing
:meth:`model_metadata` (typically a re-wrap of their old
``list_cubes``/``cube_metadata`` bodies) and registering it under
``cubes_spark.model_provider``.
"""

from __future__ import annotations

from typing import Any, Dict

__all__ = ["ModelProvider", "StaticModelProvider"]


class ModelProvider:
    """Base model provider: wraps a metadata source and yields the
    model dict to import.  Subclasses override :meth:`model_metadata`
    (and may use ``self.source`` however they like — path, DSN,
    catalog handle, …)."""

    __label__ = "Model provider"
    __description__ = "Turns a metadata source into a model dict"

    def __init__(self, source: Any = None, **options: Any) -> None:
        self.source = source
        self.options = options

    def model_metadata(self) -> Dict[str, Any]:
        """Return the model-metadata dict (``dimensions`` / ``cubes``
        / ``table_expressions`` / ``translations`` sections)."""
        raise NotImplementedError(
            f"{type(self).__name__} does not implement model_metadata()")


class StaticModelProvider(ModelProvider):
    """The default provider (parity: reference StaticModelProvider):
    the source already IS model metadata — a dict, a JSON file path,
    or a bundle directory — resolved through the same loader
    ``import_model`` uses directly."""

    __label__ = "Static model provider"
    __description__ = "Model metadata from a dict, JSON file or bundle"

    def model_metadata(self) -> Dict[str, Any]:
        from cubes_spark.sources.workspace import read_model

        return read_model(self.source)
