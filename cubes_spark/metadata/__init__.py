"""Logical model: Cube, Dimension, Hierarchy, Level, attributes.

Parity: /root/reference/cubes/metadata/ — semantics re-implemented,
physical layer replaced by Spark DataFrames.
"""

from cubes_spark.metadata.attributes import (
    Attribute,
    AttributeBase,
    Measure,
    MeasureAggregate,
    collect_attributes,
    collect_dependencies,
    depsort_attributes,
    expand_attribute_metadata,
)
from cubes_spark.metadata.dimension import (
    Dimension,
    Hierarchy,
    Level,
    expand_dimension_metadata,
    expand_level_metadata,
)
from cubes_spark.metadata.cube import Cube

__all__ = [
    "Attribute",
    "AttributeBase",
    "Cube",
    "Dimension",
    "Hierarchy",
    "Level",
    "Measure",
    "MeasureAggregate",
    "collect_attributes",
    "collect_dependencies",
    "depsort_attributes",
    "expand_attribute_metadata",
    "expand_dimension_metadata",
    "expand_level_metadata",
]
