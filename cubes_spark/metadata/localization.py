"""Model-label localization: translated copies of model objects.

Parity: /root/reference/cubes/metadata/localization.py:14-60
(LocalizationContext / ModelObjectLocalizationContext) and
metadata/base.py:63-83 (``localized()`` shallow-copy machinery).

A translation dictionary maps object types to per-object translations::

    {
        "cubes": {
            "sales": {
                "label": "Verkäufe",
                "measures": {"quantity": "Menge"},
                "aggregates": {"quantity_sum": {"label": "Summe Menge"}},
                "dimensions": {
                    "date": {
                        "label": "Datum",
                        "levels": {"month": "Monat"},
                    }
                },
            }
        },
        "dimensions": {"date": "Datum"},
    }

String values are label shorthand.  Cube-local translations win over
global ``dimensions`` entries (local context before global context).
Localization copies are shallow and presentation-only: physical
mappings, joins and attribute references are untouched, so a localized
cube browses identically.
"""

from __future__ import annotations

import copy as _copy
from typing import Any, Optional

__all__ = ["LocalizationContext", "localized_cube", "localized_dimension"]


class LocalizationContext:
    """One translation dictionary scoped to an object, with fallback to
    the enclosing (parent) context (parity: localization.py:14-60,
    collapsing the reference's two classes into one)."""

    def __init__(self, translation: Any,
                 parent: Optional["LocalizationContext"] = None) -> None:
        if isinstance(translation, str):
            translation = {"label": translation}
        self.translation = dict(translation or {})
        self.parent = parent

    def get(self, key: str, default: Any = None) -> Any:
        return self.translation.get(key, default)

    def object_localization(self, object_type: str,
                            name: str) -> "LocalizationContext":
        """Context for a child object (e.g. ``("levels", "month")``)."""
        objects = self.translation.get(object_type) or {}
        return LocalizationContext(objects.get(name), parent=self)


def _localized_copy(obj: Any, context: LocalizationContext,
                    list_attrs: dict) -> Any:
    """Shallow copy with label/description/category translated and the
    given list attributes recursed (parity: metadata/base.py:63-83)."""
    clone = _copy.copy(obj)
    for attr in ("label", "description", "category"):
        if hasattr(obj, attr):
            value = context.get(attr, getattr(obj, attr))
            setattr(clone, attr, value)
    for attr, child_lists in list_attrs.items():
        children = getattr(obj, attr, None)
        if not children:
            continue
        localized = [
            _localized_copy(
                child,
                context.object_localization(attr, child.name),
                child_lists,
            )
            for child in children
        ]
        setattr(clone, attr, localized)
    return clone


def localized_dimension(dimension: Any,
                        context: LocalizationContext) -> Any:
    clone = _localized_copy(dimension, context, {})
    levels = [
        _localized_copy(
            level,
            context.object_localization("levels", level.name),
            {"attributes": {}},
        )
        for level in dimension._levels
    ]
    clone._levels = levels
    clone._level_index = {level.name: level for level in levels}
    # hierarchies reference level objects; point them at the localized
    # ones so /model shows translated level labels inside hierarchies
    by_name = clone._level_index
    hierarchies = {}
    for hname, hier in dimension.hierarchies.items():
        hier_context = context.object_localization("hierarchies", hname)
        hclone = _localized_copy(hier, hier_context, {})
        hclone.levels = [by_name.get(l.name, l) for l in hier.levels]
        hierarchies[hname] = hclone
    clone.hierarchies = hierarchies
    return clone


def localized_cube(cube: Any, context: LocalizationContext) -> Any:
    """Translated presentation copy of a cube."""
    clone = _localized_copy(
        cube, context,
        {"measures": {}, "aggregates": {}, "details": {}},
    )
    localized_dims = {}
    for name, dim in cube._dimensions.items():
        dim_context = context.object_localization("dimensions", name)
        localized_dims[name] = localized_dimension(dim, dim_context)
    clone._dimensions = localized_dims
    return clone
