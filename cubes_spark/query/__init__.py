"""Backend-independent query abstraction: Cell/Cut algebra, Drilldown,
result objects (parity: /root/reference/cubes/query/)."""

from cubes_spark.query.cells import (
    Cell,
    Cut,
    PointCut,
    RangeCut,
    SetCut,
    cut_from_dict,
    cut_from_string,
    cuts_from_string,
    string_from_cuts,
)
from cubes_spark.query.drilldown import Drilldown, DrilldownItem
from cubes_spark.query.result import AggregationResult

__all__ = [
    "AggregationResult",
    "Cell",
    "Cut",
    "Drilldown",
    "DrilldownItem",
    "PointCut",
    "RangeCut",
    "SetCut",
    "cut_from_dict",
    "cut_from_string",
    "cuts_from_string",
    "string_from_cuts",
]
