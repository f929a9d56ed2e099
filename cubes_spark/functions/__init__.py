"""Aggregate function registry and window post-calculators."""

from cubes_spark.functions.aggregates import (
    available_aggregate_functions,
    get_aggregate_function,
    register_aggregate_function,
)
from cubes_spark.functions.calculators import (
    CALCULATED_AGGREGATIONS,
    available_calculators,
    calculators_for_aggregates,
)

__all__ = [
    "CALCULATED_AGGREGATIONS",
    "available_aggregate_functions",
    "available_calculators",
    "calculators_for_aggregates",
    "get_aggregate_function",
    "register_aggregate_function",
]
