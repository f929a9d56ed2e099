"""Dimension, Hierarchy and Level model objects.

Parity: /root/reference/cubes/metadata/dimension.py (Dimension 49-344,
Hierarchy 745-979, Level 982-1210, expansion helpers 1236-1383).
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

from cubes_spark.errors import (
    ArgumentError,
    HierarchyError,
    ModelError,
    ModelInconsistencyError,
    NoSuchAttributeError,
)
from cubes_spark.metadata.attributes import Attribute, expand_attribute_metadata

__all__ = [
    "Dimension",
    "Hierarchy",
    "Level",
    "expand_dimension_metadata",
    "expand_level_metadata",
    "expand_hierarchy_metadata",
]


def _normalize_nonadditive(nonadditive: Optional[str], what: str) -> Optional[str]:
    """Parity: dimension.py:1066-1074 / attributes.py:329-338."""
    if not nonadditive or nonadditive == "none":
        return None
    if nonadditive in ("all", "any"):
        return "all"
    if nonadditive == "time":
        return "time"
    raise ModelError(f"Unknown non-additive {what} type '{nonadditive}'")


class Level:
    """One grain of a hierarchy (parity: dimension.py:982-1210).

    Key defaulting: explicit ``key`` else first attribute; label
    attribute: explicit else second attribute else key; order
    attribute: explicit else first attribute (dimension.py:1076-1108).
    """

    def __init__(
        self,
        name: str,
        attributes: list,
        key: Optional[str] = None,
        order_attribute: Optional[str] = None,
        order: Optional[str] = None,
        label_attribute: Optional[str] = None,
        label: Optional[str] = None,
        info: Optional[dict] = None,
        cardinality: Optional[str] = None,
        role: Optional[str] = None,
        nonadditive: Optional[str] = None,
        description: Optional[str] = None,
        **kwargs: Any,
    ) -> None:
        if not attributes:
            raise ModelInconsistencyError("Attribute list should not be empty")
        self.name = name
        self.label = label
        self.description = description
        self.info = info or {}
        self.cardinality = cardinality
        self.role = role
        self.attributes = list(attributes)
        self.nonadditive = _normalize_nonadditive(nonadditive, "level")

        if key:
            self.key = self.attribute(key)
        else:
            self.key = self.attributes[0]

        if label_attribute:
            self.label_attribute = self.attribute(label_attribute)
        elif len(self.attributes) > 1:
            self.label_attribute = self.attributes[1]
        else:
            self.label_attribute = self.key

        if order_attribute:
            try:
                self.order_attribute = self.attribute(order_attribute)
            except NoSuchAttributeError:
                raise NoSuchAttributeError(
                    f"Unknown order attribute {order_attribute} in level {name}"
                )
        else:
            self.order_attribute = self.attributes[0]

        self.order = order

    @classmethod
    def from_metadata(cls, metadata: Any, dimension: Any = None) -> "Level":
        md = expand_level_metadata(metadata)
        attributes = [
            Attribute(dimension=dimension, **expand_attribute_metadata(a))
            for a in md.pop("attributes")
        ]
        return cls(attributes=attributes, **md)

    def attribute(self, name: str) -> Attribute:
        for attr in self.attributes:
            if attr.name == name:
                return attr
        raise NoSuchAttributeError(
            f"Level {self.name} has no attribute '{name}'"
        )

    def __str__(self) -> str:
        return self.name

    def __repr__(self) -> str:
        return f"<Level {self.name!r}>"

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, Level)
            and self.name == other.name
            and self.key == other.key
            and self.attributes == other.attributes
        )

    def __hash__(self) -> int:
        return hash(self.name)

    def to_dict(self, full_attribute_names: bool = False, **options: Any) -> dict:
        d: dict = {"name": self.name}
        if self.label is not None:
            d["label"] = self.label
        if self.cardinality is not None:
            d["cardinality"] = self.cardinality
        if self.role is not None:
            d["role"] = self.role
        if self.info:
            d["info"] = self.info
        if full_attribute_names:
            d["key"] = self.key.ref
            d["label_attribute"] = self.label_attribute.ref
            d["order_attribute"] = self.order_attribute.ref
        else:
            d["key"] = self.key.name
            d["label_attribute"] = self.label_attribute.name
            d["order_attribute"] = self.order_attribute.name
        if self.order is not None:
            d["order"] = self.order
        d["attributes"] = [a.to_dict(**options) for a in self.attributes]
        return d


class Hierarchy:
    """Ordered list of levels (parity: dimension.py:745-979)."""

    def __init__(self, name: str, levels: list, label: Optional[str] = None,
                 info: Optional[dict] = None, description: Optional[str] = None) -> None:
        if not levels:
            raise ModelInconsistencyError(
                f"Hierarchy '{name}' has no levels"
            )
        self.name = name
        self.label = label
        self.description = description
        self.info = info or {}
        self.levels = list(levels)
        self._level_index = {level.name: i for i, level in enumerate(self.levels)}

    def __len__(self) -> int:
        return len(self.levels)

    def __iter__(self):
        return iter(self.levels)

    def __getitem__(self, item):
        try:
            return self.levels[item]
        except IndexError:
            raise HierarchyError(
                f"Hierarchy '{self.name}' has only {len(self.levels)} levels, "
                f"asking for deeper level"
            )

    def __str__(self) -> str:
        return self.name

    def __repr__(self) -> str:
        return f"<Hierarchy {self.name!r}: {[str(l) for l in self.levels]}>"

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, Hierarchy)
            and self.name == other.name
            and self.levels == other.levels
        )

    def __hash__(self) -> int:
        return hash(self.name)

    @property
    def level_names(self) -> list:
        return [level.name for level in self.levels]

    def level(self, name: str) -> Level:
        try:
            return self.levels[self._level_index[name]]
        except KeyError:
            raise HierarchyError(
                f"Hierarchy '{self.name}' has no level '{name}'"
            )

    def level_index(self, level: Any) -> int:
        try:
            return self._level_index[str(level)]
        except KeyError:
            raise HierarchyError(
                f"Level {level} is not part of hierarchy {self.name}"
            )

    def levels_for_depth(self, depth: Optional[int], drilldown: bool = False) -> list:
        """Levels from top to `depth`; `drilldown` allows one deeper
        (parity: dimension.py:841-866)."""
        depth = depth or 0
        extend = 1 if drilldown else 0
        if depth + extend > len(self.levels):
            raise HierarchyError(
                f"Depth {depth} is longer than hierarchy '{self.name}'"
            )
        return self.levels[0: depth + extend]

    def levels_for_path(self, path: Optional[list], drilldown: bool = False) -> list:
        return self.levels_for_depth(len(path or []), drilldown)

    def next_level(self, level: Any) -> Optional[Level]:
        """Parity: dimension.py:868-884."""
        if level is None:
            return self.levels[0]
        index = self.level_index(level)
        if index + 1 >= len(self.levels):
            return None
        return self.levels[index + 1]

    def previous_level(self, level: Any) -> Optional[Level]:
        """Parity: dimension.py:886-899."""
        if level is None:
            return None
        index = self.level_index(level)
        if index == 0:
            return None
        return self.levels[index - 1]

    def is_last(self, level: Any) -> bool:
        return self.level_index(level) == len(self.levels) - 1

    def rollup(self, path: list, level: Any = None) -> list:
        """Roll up path to `level` (default: one level up)
        (parity: dimension.py:907-930)."""
        if level:
            last = self.level_index(level) + 1
            if last > len(path):
                raise HierarchyError(
                    f"Can not roll-up: level '{level}' in dimension hierarchy "
                    f"'{self.name}' is deeper than deepest element of path {path}"
                )
        else:
            if not path:
                return []
            last = len(path) - 1
        return path[0:last]

    def path_is_base(self, path: Optional[list]) -> bool:
        return bool(path) and len(path) == len(self.levels)

    def key_attributes(self) -> list:
        return [level.key for level in self.levels]

    @property
    def all_attributes(self) -> list:
        return [attr for level in self.levels for attr in level.attributes]

    def to_dict(self, **options: Any) -> dict:
        d: dict = {"name": self.name, "levels": [str(l) for l in self.levels]}
        if self.label is not None:
            d["label"] = self.label
        if self.info:
            d["info"] = self.info
        return d


class Dimension:
    """Named set of levels and hierarchies (parity: dimension.py:49-344)."""

    def __init__(
        self,
        name: str,
        levels: list,
        hierarchies: Optional[list] = None,
        default_hierarchy_name: Optional[str] = None,
        label: Optional[str] = None,
        description: Optional[str] = None,
        info: Optional[dict] = None,
        role: Optional[str] = None,
        cardinality: Optional[str] = None,
        category: Optional[str] = None,
        master: Optional["Dimension"] = None,
        nonadditive: Optional[str] = None,
        **kwargs: Any,
    ) -> None:
        if not levels:
            raise ModelError(f"Dimension '{name}' has no levels")
        self.name = name
        self.label = label
        self.description = description
        self.info = info or {}
        self.role = role
        self.cardinality = cardinality
        self.category = category
        self.master = master
        self.nonadditive = _normalize_nonadditive(nonadditive, "dimension")

        # DEEP-COPY levels (and their attributes): templates and
        # clone() pass the SOURCE dimension's Level objects, and the
        # back-link below re-points attr.dimension — without a copy
        # that silently rewrites the source dimension's attribute refs
        # (reference deep-copies too: dimension.py:80,505).  The memo
        # pins each attribute's current dimension backref so deepcopy
        # does not drag a whole dimension graph along.
        import copy as _copy

        copied = []
        for level in levels:
            memo: dict = {}
            for attr in level.attributes:
                current = getattr(attr, "dimension", None)
                if current is not None:
                    memo[id(current)] = current
            copied.append(_copy.deepcopy(level, memo))
        self._levels = copied
        self._level_index = {level.name: level for level in self._levels}

        # Back-link level attributes to this dimension
        for level in self._levels:
            for attr in level.attributes:
                attr.dimension = self

        if hierarchies:
            # rebuild against the COPIED levels (incoming Hierarchy
            # objects reference the source dimension's level objects)
            self.hierarchies = {}
            for h in hierarchies:
                hlevels = [self._level_index[l.name] for l in h.levels]
                self.hierarchies[h.name] = Hierarchy(
                    h.name, hlevels, label=h.label,
                    info=dict(h.info), description=h.description)
        else:
            # default hierarchy over all levels, named "default"
            default = Hierarchy("default", self._levels)
            self.hierarchies = {"default": default}

        self.default_hierarchy_name = default_hierarchy_name or (
            "default" if "default" in self.hierarchies
            else next(iter(self.hierarchies))
        )

    # -- construction -----------------------------------------------------

    @classmethod
    def from_metadata(cls, metadata: Any, templates: Optional[dict] = None) -> "Dimension":
        """Create dimension from JSON-compatible metadata; supports
        ``template`` inheritance (parity: dimension.py:58-215,73-102)."""
        # Resolve the template BEFORE synthesizing a default flat level:
        # a bare {"name": ..., "template": ...} must inherit the
        # template's levels, not shadow them with an implicit one
        # (parity: dimension.py:73-102).
        has_template = isinstance(metadata, dict) and metadata.get("template")
        md = expand_dimension_metadata(metadata,
                                       expand_levels=not has_template)
        templates = templates or {}

        template_name = md.pop("template", None)
        if template_name:
            try:
                template = templates[template_name]
            except KeyError:
                raise ModelError(
                    f"Unknown dimension template '{template_name}' "
                    f"for dimension '{md.get('name')}'"
                )
            base = template.to_template_metadata()
            # template values are defaults; explicit metadata wins
            base.update(md)
            md = base

        name = md["name"]

        levels_md = md.get("levels")
        if levels_md and isinstance(levels_md[0], Level):
            levels = levels_md
        else:
            levels = [Level.from_metadata(l) for l in (levels_md or [])]
        if not levels:
            raise ModelError(f"Dimension '{name}' has no levels")

        by_name = {level.name: level for level in levels}

        hierarchies_md = md.get("hierarchies")
        hierarchies = []
        if hierarchies_md:
            for hmd in hierarchies_md:
                if isinstance(hmd, Hierarchy):
                    hierarchies.append(hmd)
                    continue
                hmd = expand_hierarchy_metadata(hmd)
                hlevels = []
                for lname in hmd["levels"]:
                    lname = str(lname)
                    try:
                        hlevels.append(by_name[lname])
                    except KeyError:
                        raise ModelError(
                            f"Unknown level '{lname}' in hierarchy "
                            f"'{hmd['name']}' of dimension '{name}'"
                        )
                hierarchies.append(
                    Hierarchy(
                        hmd["name"],
                        hlevels,
                        label=hmd.get("label"),
                        info=hmd.get("info"),
                    )
                )

        return cls(
            name=name,
            levels=levels,
            hierarchies=hierarchies or None,
            default_hierarchy_name=md.get("default_hierarchy_name"),
            label=md.get("label"),
            description=md.get("description"),
            info=md.get("info"),
            role=md.get("role"),
            cardinality=md.get("cardinality"),
            category=md.get("category"),
            nonadditive=md.get("nonadditive"),
        )

    def to_template_metadata(self) -> dict:
        """Metadata dict used when this dimension serves as a template."""
        return {
            "name": self.name,
            "levels": list(self._levels),
            "hierarchies": list(self.hierarchies.values()),
            "default_hierarchy_name": self.default_hierarchy_name,
            "label": self.label,
            "description": self.description,
            "info": dict(self.info),
            "role": self.role,
            "cardinality": self.cardinality,
            "category": self.category,
            "nonadditive": self.nonadditive,
        }

    def clone(
        self,
        hierarchies: Optional[list] = None,
        exclude_hierarchies: Optional[list] = None,
        nonadditive: Any = False,
        default_hierarchy_name: Optional[str] = None,
        cardinality: Optional[str] = None,
        alias: Optional[str] = None,
        **extra: Any,
    ) -> "Dimension":
        """Per-cube dimension customization (parity: dimension.py:473-559)."""
        if hierarchies == []:
            raise ModelInconsistencyError(
                f"Can not remove all hierarchies from dimension ({self.name})"
            )
        if hierarchies:
            keep = [self.hierarchy(str(h)) for h in hierarchies]
        elif exclude_hierarchies:
            excluded = {str(h) for h in exclude_hierarchies}
            keep = [h for h in self.hierarchies.values() if h.name not in excluded]
        else:
            keep = list(self.hierarchies.values())

        # levels restricted to those used by kept hierarchies, in original order
        used = {level.name for h in keep for level in h.levels}
        levels = [l for l in self._levels if l.name in used]

        name = alias or self.name
        if default_hierarchy_name is None:
            default_hierarchy_name = self.default_hierarchy_name
        if default_hierarchy_name not in {h.name for h in keep}:
            default_hierarchy_name = keep[0].name
        dim = Dimension(
            name=name,
            levels=levels,
            hierarchies=keep,
            default_hierarchy_name=default_hierarchy_name,
            label=self.label,
            description=self.description,
            info=self.info,
            role=self.role,
            cardinality=cardinality or self.cardinality,
            category=self.category,
            master=self,
            nonadditive=(
                self.nonadditive if nonadditive is False else nonadditive
            ),
        )
        return dim

    # -- access -------------------------------------------------------

    @property
    def levels(self) -> list:
        return list(self._levels)

    @property
    def level_names(self) -> list:
        return [level.name for level in self._levels]

    def level(self, obj: Any) -> Level:
        if isinstance(obj, Level):
            return obj
        try:
            return self._level_index[str(obj)]
        except KeyError:
            raise KeyError(f"No level {obj} in dimension {self.name}")

    def hierarchy(self, obj: Any = None) -> Hierarchy:
        if obj is None:
            return self.hierarchies[self.default_hierarchy_name]
        if isinstance(obj, Hierarchy):
            return obj
        try:
            return self.hierarchies[str(obj)]
        except KeyError:
            raise HierarchyError(
                f"No hierarchy '{obj}' in dimension '{self.name}'"
            )

    @property
    def is_flat(self) -> bool:
        """Flat = single level with single attribute
        (parity: dimension.py:~640)."""
        return len(self._levels) == 1

    @property
    def has_details(self) -> bool:
        return any(len(level.attributes) > 1 for level in self._levels)

    @property
    def all_attributes(self) -> list:
        return [attr for level in self._levels for attr in level.attributes]

    def attribute(self, name: str, by_ref: bool = False) -> Attribute:
        for attr in self.all_attributes:
            if (by_ref and attr.ref == name) or attr.name == name:
                return attr
        raise NoSuchAttributeError(
            f"Unknown attribute '{name}' in dimension '{self.name}'"
        )

    @property
    def key_attributes(self) -> list:
        return [level.key for level in self._levels]

    def __str__(self) -> str:
        return self.name

    def __repr__(self) -> str:
        return f"<Dimension {self.name!r}>"

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, Dimension)
            and self.name == other.name
            and self._levels == other._levels
        )

    def __hash__(self) -> int:
        return hash(self.name)

    def to_dict(self, **options: Any) -> dict:
        d: dict = {
            "name": self.name,
            "levels": [l.to_dict(**options) for l in self._levels],
            "hierarchies": [h.to_dict(**options) for h in self.hierarchies.values()],
            "default_hierarchy_name": self.default_hierarchy_name,
            "is_flat": self.is_flat,
            "has_details": self.has_details,
        }
        for key in ("label", "role", "cardinality", "category", "nonadditive"):
            value = getattr(self, key)
            if value is not None:
                d[key] = value
        if self.info:
            d["info"] = self.info
        return d

    def validate(self) -> list:
        """Basic model validation; returns list of (severity, message)."""
        results = []
        if not self.levels:
            results.append(("error", f"No levels in dimension '{self.name}'"))
        if not self.hierarchies:
            results.append(("error", f"No hierarchies in dimension '{self.name}'"))
        return results


# ---------------------------------------------------------------------------
# Metadata expansion (parity: dimension.py:1236-1383)
# ---------------------------------------------------------------------------


def expand_dimension_metadata(metadata: Any, expand_levels: bool = False) -> dict:
    """A bare string becomes a one-level dimension named after itself;
    a dict with only ``attributes`` becomes a single flat level
    (parity: dimension.py:1236-1290)."""
    if isinstance(metadata, str):
        metadata = {"name": metadata, "levels": [metadata]}
    else:
        metadata = dict(metadata)

    if "name" not in metadata:
        raise ModelError("Dimension has no name")
    name = metadata["name"]

    levels = metadata.get("levels", [])
    if not levels and expand_levels:
        level: dict = {}
        for key in ("attributes", "key", "order_attribute", "order", "label_attribute"):
            if key in metadata:
                level[key] = metadata[key]
        level["cardinality"] = metadata.get("cardinality")
        level["name"] = name
        level["label"] = metadata.get("label")
        levels = [level]

    if levels:
        metadata["levels"] = [expand_level_metadata(l) for l in levels]

    if "hierarchy" in metadata and "hierarchies" in metadata:
        raise ModelInconsistencyError(
            "Both 'hierarchy' and 'hierarchies' specified. Use only one"
        )
    hierarchy = metadata.pop("hierarchy", None)
    if hierarchy:
        metadata["hierarchies"] = [{"name": "default", "levels": hierarchy}]

    return metadata


def expand_hierarchy_metadata(metadata: Any) -> dict:
    if isinstance(metadata, str):
        raise ModelError("Hierarchy metadata should be a dictionary")
    metadata = dict(metadata)
    if "name" not in metadata:
        raise ModelError("Hierarchy has no name")
    if "levels" not in metadata:
        raise ModelError(f"Hierarchy '{metadata['name']}' has no levels")
    return metadata


def expand_level_metadata(metadata: Any) -> dict:
    """A bare string becomes a level with one same-named attribute
    (parity: dimension.py:1305-1341)."""
    if isinstance(metadata, str):
        metadata = {"name": metadata, "attributes": [metadata]}
    else:
        metadata = dict(metadata)

    if "name" not in metadata:
        raise ModelError("Level has no name")
    name = metadata["name"]

    attributes = metadata.get("attributes")
    if not attributes:
        attributes = [{"name": name, "label": metadata.get("label")}]
    metadata["attributes"] = [expand_attribute_metadata(a) for a in attributes]

    # Backward compatibility: info.high_cardinality
    if "cardinality" not in metadata:
        info = metadata.get("info") or {}
        if "high_cardinality" in info:
            metadata["cardinality"] = "high"

    return metadata
