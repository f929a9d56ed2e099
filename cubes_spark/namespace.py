"""Hierarchical model namespaces.

Parity: /root/reference/cubes/namespace.py:13-180 — dotted-path
namespaces (``ns.subns.cube``), per-namespace model registries and
per-namespace translation stacks, with dimension lookup falling back
through parent namespaces and cube lookup resolving the longest
namespace prefix of a dotted reference.

The Spark design keeps namespaces eager: a namespace holds the
Cube/Dimension objects directly.  The reference's provider
indirection survives in the THIN form of the ``model_provider``
extension type (metadata/providers.py + ext.py): a provider turns an
opaque source into model metadata at import time, rather than
serving lazy per-cube lookups.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from cubes_spark.errors import ModelError, NoSuchCubeError, \
    NoSuchDimensionError

__all__ = ["Namespace"]


class Namespace:
    """One level of the model-registry hierarchy."""

    def __init__(self, name: Optional[str] = None,
                 parent: Optional["Namespace"] = None) -> None:
        self.name = name
        self.parent = parent
        self.namespaces: Dict[str, Namespace] = {}
        self.cubes: Dict[str, Any] = {}
        self.dimensions: Dict[str, Any] = {}
        #: locale -> merged translation dictionary
        self.translations: Dict[str, dict] = {}

    # -- structure ---------------------------------------------------------

    def namespace(self, path: Any,
                  create: bool = False) -> Tuple["Namespace", Optional[str]]:
        """(deepest namespace, unresolved remainder) for a dotted path
        (parity: namespace.py:25-58).  With ``create=True`` missing
        levels are created and the remainder is always None."""
        if not path:
            return (self, None)
        if isinstance(path, str):
            path = path.split(".")

        namespace = self
        remainder: List[str] = []
        for i, element in enumerate(path):
            if element in namespace.namespaces:
                namespace = namespace.namespaces[element]
            else:
                remainder = path[i:]
                break
        else:
            remainder = []

        if not create:
            return (namespace, ".".join(remainder) or None)
        for element in remainder:
            namespace = namespace.create_namespace(element)
        return (namespace, None)

    def create_namespace(self, name: str) -> "Namespace":
        """Parity: namespace.py:60-70."""
        nsname = f"{self.name}.{name}" if self.name else name
        namespace = Namespace(nsname, parent=self)
        self.namespaces[name] = namespace
        return namespace

    # -- model objects -----------------------------------------------------

    def add_cube(self, cube: Any) -> None:
        if cube.name in self.cubes:
            raise ModelError(
                f"Duplicate cube '{cube.name}' in namespace "
                f"'{self.name or ''}'"
            )
        self.cubes[cube.name] = cube

    def add_dimension(self, dimension: Any) -> None:
        self.dimensions[dimension.name] = dimension

    def find_cube(self, cube_ref: str) -> Tuple["Namespace", Any]:
        """(owning namespace, cube) for a possibly-dotted reference —
        the longest namespace prefix wins; the rest is the cube's base
        name (parity: namespace.py:72-111)."""
        cube_ref = str(cube_ref)
        split = cube_ref.split(".")
        path, basename = split[:-1], split[-1]

        namespace, remainder = self.namespace(path)
        if remainder:
            basename = f"{remainder}.{basename}"
        try:
            return namespace, namespace.cubes[basename]
        except KeyError:
            raise NoSuchCubeError(
                f"Unknown cube '{cube_ref}'", name=cube_ref
            )

    def dimension(self, name: str, local_only: bool = False) -> Any:
        """Dimension lookup falling back through parents
        (parity: namespace.py:143-161)."""
        if name in self.dimensions:
            return self.dimensions[name]
        if not local_only and self.parent is not None:
            return self.parent.dimension(name)
        raise NoSuchDimensionError(
            f"Unknown dimension '{name}'", name=name
        )

    def list_cubes(self, recursive: bool = False) -> list:
        """Cube info dicts; child-namespace cubes get dotted names
        (parity: namespace.py:113-139)."""
        infos = [
            {
                "name": cube.name,
                "label": cube.label,
                "category": cube.category,
                "info": cube.info,
            }
            for cube in self.cubes.values()
        ]
        if recursive:
            for name, ns in self.namespaces.items():
                for info in ns.list_cubes(recursive=True):
                    info = dict(info)
                    info["name"] = f"{name}.{info['name']}"
                    infos.append(info)
        return infos

    # -- translations ------------------------------------------------------

    def add_translation(self, lang: str, translation: Any) -> None:
        """Register and merge a translation for ``lang``; a string is a
        JSON file path (parity: namespace.py:166-180)."""
        if isinstance(translation, str):
            import json

            with open(translation, encoding="utf-8") as f:
                translation = json.load(f)
        self.translations.setdefault(lang, {}).update(translation)

    def translation_lookup(self, lang: str) -> List[dict]:
        """Translations for ``lang`` from this namespace up the parent
        chain, nearest first (parity: namespace.py:181-189)."""
        lookup: List[dict] = []
        ns: Optional[Namespace] = self
        while ns is not None:
            trans = ns.translations.get(lang)
            if trans:
                lookup.append(trans)
            ns = ns.parent
        return lookup
