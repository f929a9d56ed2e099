"""AggregationResult — result of an aggregation query.

Parity: /root/reference/cubes/query/browser.py:676-862
(AggregationResult, table_rows).
"""

from __future__ import annotations

from collections import namedtuple
from typing import Any, Iterable, Optional

from cubes_spark.errors import ArgumentError

__all__ = ["AggregationResult", "TableRow"]

TableRow = namedtuple("TableRow", ["key", "label", "path", "is_base", "record"])


class AggregationResult:
    """Result of aggregation: summary row, iterable cells, levels info.

    * `summary` — dict of aggregate values for the whole cell
    * `cells` — iterable of drilldown row dicts
    * `levels` — dimension → drilled level names
    * `total_cell_count` — row count of the drilldown before pagination
    * `labels` — column labels in result order
    """

    def __init__(self, cell: Any = None, aggregates: Optional[list] = None,
                 drilldown: Any = None, has_split: bool = False) -> None:
        self.cell = cell
        self.aggregates = aggregates or []
        self.drilldown = drilldown
        self.has_split = has_split

        self.summary: dict = {}
        self.cells: Iterable = []
        self.levels: Optional[dict] = None
        self.total_cell_count: Optional[int] = None
        self.remainder: dict = {}
        self.labels: list = []

        if drilldown is not None:
            try:
                self.levels = drilldown.result_levels(include_split=has_split)
            except AttributeError:
                self.levels = None

    def to_dict(self) -> dict:
        """JSON-serializable dict (parity: query/browser.py:748-771)."""
        d: dict = {}
        d["summary"] = self.summary
        d["remainder"] = self.remainder
        d["cells"] = list(self.cells)
        d["total_cell_count"] = self.total_cell_count
        d["aggregates"] = [str(m) for m in self.aggregates]
        if self.levels:
            d["levels"] = self.levels
        # hidden cuts (authorizer restrictions) never serialize —
        # their values are exactly what the restriction hides
        d["cell"] = [cut.to_dict() for cut in self.cell.cuts
                     if not cut.hidden] if self.cell else []
        return d

    def table_rows(self, dimension: Any, depth: Optional[int] = None,
                   hierarchy: Any = None):
        """Yield TableRows for one-dimensional presentation
        (parity: query/browser.py:782-837)."""
        cut = self.cell.point_cut_for_dimension(dimension) if self.cell else None
        path = cut.path if cut else []

        # depth=0 means "no explicit depth" for BOTH the level pick
        # and the is_base computation (an inconsistent split here made
        # depth=0 pick the path level but report is_base=len==0)
        depth = depth or None

        if not hasattr(dimension, "hierarchy"):
            if self.cell is None:
                raise ArgumentError(
                    "table_rows needs a Dimension object when the "
                    "result carries no cell to resolve names against")
            dimension = self.cell.cube.dimension(dimension)
        hierarchy = dimension.hierarchy(hierarchy)

        if depth:
            current_level = hierarchy.levels[depth - 1]
        else:
            levels = hierarchy.levels_for_path(path, drilldown=True)
            current_level = levels[-1]

        level_key = current_level.key.ref
        level_label = current_level.label_attribute.ref

        if depth is not None:
            is_base = len(hierarchy) == depth
        else:
            is_base = hierarchy.is_last(current_level)

        for row in self.cells:
            sub_path = path + [row[level_key]]
            yield TableRow(
                row[level_key],
                row.get(level_label, row[level_key]),
                sub_path,
                is_base,
                row,
            )

    def cached(self) -> "AggregationResult":
        """Materialize the cells iterator."""
        self.cells = list(self.cells)
        return self

    def __iter__(self):
        return iter(self.cells)
