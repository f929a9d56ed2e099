"""cubes_spark — a PySpark-native OLAP engine.

A brand-new engine with the query and data-processing capabilities of
DataBrewery/cubes (the reference), re-expressed Spark-first: the logical
model (Cube/Dimension/Hierarchy/Level/Attribute) and the query algebra
(Cell/Cut/Drilldown) are a thin pure-Python layer; everything physical is
a lazily-built ``pyspark.sql.DataFrame`` plan optimized by Catalyst.

Reference parity map lives in SURVEY.md; citations in docstrings point
into /root/reference (DataBrewery/cubes) as ``file:line``.
"""

from cubes_spark.errors import (
    ArgumentError,
    CubesError,
    ExpressionError,
    HierarchyError,
    ModelError,
    NoSuchAttributeError,
    NoSuchCubeError,
    NoSuchDimensionError,
)
from cubes_spark.metadata.attributes import (
    Attribute,
    AttributeBase,
    Measure,
    MeasureAggregate,
    depsort_attributes,
)
from cubes_spark.metadata.dimension import Dimension, Hierarchy, Level
from cubes_spark.metadata.cube import Cube
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
from cubes_spark.query.drilldown import Drilldown
from cubes_spark.sources.workspace import Workspace

__version__ = "0.1.0"

__all__ = [
    "ArgumentError",
    "Attribute",
    "AttributeBase",
    "Cell",
    "Cube",
    "CubesError",
    "Cut",
    "Dimension",
    "Drilldown",
    "ExpressionError",
    "Hierarchy",
    "HierarchyError",
    "Level",
    "Measure",
    "MeasureAggregate",
    "ModelError",
    "NoSuchAttributeError",
    "NoSuchCubeError",
    "NoSuchDimensionError",
    "PointCut",
    "RangeCut",
    "SetCut",
    "Workspace",
    "cut_from_dict",
    "cut_from_string",
    "cuts_from_string",
    "depsort_attributes",
    "string_from_cuts",
]
