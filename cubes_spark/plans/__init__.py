"""Physical planning layer: logical model → lazily-built DataFrame plans.

Replaces the reference's SQLAlchemy statement generation
(/root/reference/cubes/sql/query.py) with DataFrame construction —
Catalyst is our optimizer, Tungsten our executor.
"""

from cubes_spark.plans.expressions import SparkExpressionCompiler, compile_expression
from cubes_spark.plans.mapper import Mapper, Naming, StarSchemaMapper, DenormalizedMapper, map_base_attributes
from cubes_spark.plans.star import (
    ColumnRef,
    Join,
    JoinKey,
    StarSchema,
    QueryContext,
    to_column,
    to_join,
    to_join_key,
)

__all__ = [
    "ColumnRef",
    "DenormalizedMapper",
    "Join",
    "JoinKey",
    "Mapper",
    "Naming",
    "QueryContext",
    "SparkExpressionCompiler",
    "StarSchema",
    "StarSchemaMapper",
    "compile_expression",
    "map_base_attributes",
    "to_column",
    "to_join",
    "to_join_key",
]
