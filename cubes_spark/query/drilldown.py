"""Drilldown — the GROUP BY grain of an aggregation request.

Parity: /root/reference/cubes/query/browser.py:865-1128
(Drilldown class, DrilldownItem, levels_from_drilldown).
"""

from __future__ import annotations

import re
from collections import namedtuple
from typing import Any, Optional

from cubes_spark.errors import ArgumentError, HierarchyError
from cubes_spark.metadata.dimension import Dimension
from cubes_spark.query.cells import Cell

__all__ = ["Drilldown", "DrilldownItem", "levels_from_drilldown",
           "string_to_dimension_level", "SPLIT_DIMENSION_NAME"]

#: Name of the virtual split dimension (parity: query/browser.py:35)
SPLIT_DIMENSION_NAME = "__within_split__"

DrilldownItem = namedtuple("DrilldownItem",
                           ["dimension", "hierarchy", "levels", "keys"])

_DIM_LEVEL_PATTERN = re.compile(
    r"(?P<dim>\w+)(@(?P<hier>\w+))?(:(?P<level>\w+))?$"
)


def string_to_dimension_level(astring: str) -> tuple:
    """Parse ``dimension@hierarchy:level`` string → (dim, hier, level)
    (parity: cubes/query/browser.py ``string_to_dimension_level``)."""
    if not astring:
        raise ArgumentError("Drilldown string should not be empty")
    match = _DIM_LEVEL_PATTERN.match(astring)
    if not match:
        raise ArgumentError(
            f"String '{astring}' does not match drilldown level pattern "
            "'dimension@hierarchy:level'"
        )
    d = match.groupdict()
    return (d["dim"], d["hier"], d["level"])


def levels_from_drilldown(cell: Cell, drilldown: Any) -> list:
    """Convert a drilldown specification into DrilldownItems.

    The implicit "next level" comes from the cell's PointCut of the
    dimension; an inverted cut does not auto-drill deeper
    (parity: query/browser.py:1043-1128).
    """
    if not drilldown:
        return []

    result = []

    if isinstance(drilldown, dict):
        drilldown = [(dim, None, level) for dim, level in drilldown.items()]

    for obj in drilldown:
        if isinstance(obj, str):
            obj = string_to_dimension_level(obj)
        elif isinstance(obj, DrilldownItem):
            obj = (obj.dimension, obj.hierarchy, obj.levels[-1])
        elif isinstance(obj, Dimension):
            obj = (obj, obj.hierarchy(), obj.hierarchy().levels[-1])
        elif len(obj) != 3:
            raise ArgumentError(
                "Drilldown item should be either a string or a tuple of "
                f"three elements. Is: {obj}"
            )

        dim, hier, level = obj
        dim = cell.cube.dimension(dim)
        hier = dim.hierarchy(hier)

        if level:
            index = hier.level_index(level)
            levels = hier.levels[: index + 1]
        elif dim.is_flat:
            levels = hier.levels[:]
        else:
            cut = cell.point_cut_for_dimension(dim)
            if cut:
                cut_hierarchy = dim.hierarchy(cut.hierarchy)
                depth = cut.level_depth()
                # inverted cut means not to auto-drill to the next level
                if cut.invert:
                    depth -= 1
            else:
                cut_hierarchy = hier
                depth = 0

            if cut_hierarchy != hier:
                raise HierarchyError(
                    f"Cut hierarchy {hier} for dimension {dim} is different "
                    f"than drilldown hierarchy {cut_hierarchy}. Can not "
                    "determine implicit next level."
                )
            if depth >= len(hier):
                raise HierarchyError(
                    f"Hierarchy {hier} in dimension {dim} has only "
                    f"{len(hier)} levels, can not drill to {depth + 1}"
                )
            levels = hier.levels[: depth + 1]

        levels = tuple(levels)
        keys = [level.key.ref for level in levels]
        result.append(DrilldownItem(dim, hier, levels, keys))

    return result


class Drilldown:
    """Parsed drilldown: list of DrilldownItems
    (parity: query/browser.py:865-1036)."""

    def __init__(self, drilldown: Any = None, cell: Optional[Cell] = None) -> None:
        self.drilldown = levels_from_drilldown(cell, drilldown)
        self.dimensions = [dd.dimension for dd in self.drilldown]
        self._contained_dimensions = {dd.dimension.name for dd in self.drilldown}

    def __str__(self) -> str:
        return ",".join(self.items_as_strings())

    def items_as_strings(self) -> list:
        strings = []
        for item in self.drilldown:
            if item.hierarchy != item.dimension.hierarchy():
                hierstr = f"@{item.hierarchy}"
            else:
                hierstr = ""
            strings.append(
                f"{item.dimension.name}{hierstr}:{item.levels[-1].name}"
            )
        return strings

    def drilldown_for_dimension(self, dim: Any) -> list:
        dimname = str(dim)
        return [item for item in self.drilldown
                if str(item.dimension) == dimname]

    def __getitem__(self, key):
        return self.drilldown[key]

    def deepest_levels(self) -> list:
        return [
            (item.dimension, item.hierarchy, item.levels[-1])
            for item in self.drilldown
        ]

    def high_cardinality_levels(self, cell: Cell) -> list:
        """Levels of high cardinality without a cut in `cell`
        (parity: query/browser.py:945-959)."""
        for item in self.drilldown:
            dim, hier = item.dimension, item.hierarchy
            not_contained = []
            for level in item.levels:
                if (level.cardinality == "high" or dim.cardinality == "high") \
                        and not cell.contains_level(dim, level, hier):
                    not_contained.append(level)
            if not_contained:
                return not_contained
        return []

    def result_levels(self, include_split: bool = False) -> dict:
        result = {}
        for item in self.drilldown:
            dim, hier, levels = item.dimension, item.hierarchy, item.levels
            if dim.hierarchy().name == hier.name:
                dim_key = dim.name
            else:
                dim_key = f"{dim.name}@{hier.name}"
            result[dim_key] = [str(level) for level in levels]
        if include_split:
            result[SPLIT_DIMENSION_NAME] = [SPLIT_DIMENSION_NAME]
        return result

    @property
    def key_attributes(self) -> list:
        return [
            level.key
            for item in self.drilldown
            for level in item.levels
        ]

    @property
    def all_attributes(self) -> list:
        return [
            attr
            for item in self.drilldown
            for level in item.levels
            for attr in level.attributes
        ]

    @property
    def natural_order(self) -> list:
        """List of (attribute, order) for the drilldown's natural order
        (parity: query/browser.py:1010-1024)."""
        order = []
        for item in self.drilldown:
            for level in item.levels:
                lvl_attr = level.order_attribute or level.key
                lvl_order = level.order or "asc"
                order.append((lvl_attr, lvl_order))
        return order

    def has_dimension(self, dim: Any) -> bool:
        return str(dim) in self._contained_dimensions

    def __len__(self) -> int:
        return len(self.drilldown)

    def __iter__(self):
        return iter(self.drilldown)

    def __bool__(self) -> bool:
        return len(self.drilldown) > 0
