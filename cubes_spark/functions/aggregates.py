"""Aggregate functions: name → Column builder.

Parity: /root/reference/cubes/sql/functions.py:60-201.  Null-handling
quirks preserved: with ``coalesce`` enabled, ``min``/``max``/``avg``/
``stddev``/``variance`` coalesce the *value* to 0 before aggregation
(ValueCoalescingFunction, functions.py:104-110), ``sum``/
``count_nonempty`` coalesce the *result* to 0 (SummaryCoalescingFunction,
functions.py:113-118), and ``count`` counts the fact key column instead
of ``COUNT(1)`` (FactCountFunction, functions.py:131-145).

Unlike the reference's fixed ``_functions`` table, the registry here is
user-extensible via :func:`register_aggregate_function` — any callable
``(Column) -> Column`` works, including ``F.expr`` wrappers or Pandas
UDAFs.  At 100 TB prefer JVM-side builtins: everything registered below
stays inside whole-stage codegen with map-side partial aggregation.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "AggregateFunction",
    "available_aggregate_functions",
    "get_aggregate_function",
    "register_aggregate_function",
]


class AggregateFunction:
    """An aggregate function; `builder(column)` returns the aggregate
    Column expression."""

    #: coalesce value before aggregation (min/max/avg/stddev/variance)
    coalesce_value = False
    #: coalesce aggregated result (sum/count_nonempty)
    coalesce_aggregate = False
    #: function needs no measure column (count)
    generative = False

    def __init__(self, name: str, builder: Callable[..., Column],
                 coalesce_value: bool = False,
                 coalesce_aggregate: bool = False,
                 generative: bool = False) -> None:
        self.name = name
        self.builder = builder
        self.coalesce_value = coalesce_value
        self.coalesce_aggregate = coalesce_aggregate
        self.generative = generative

    def apply(self, column: Optional[Column],
              context: Optional[Dict[str, Any]] = None,
              coalesce: bool = False) -> Column:
        if self.generative:
            if coalesce and context and "__fact_key__" in context:
                # COUNT(fact_key): count only existing facts
                # (parity: functions.py:131-145)
                return F.count(context["__fact_key__"])
            return self.builder()
        if column is None:
            raise ValueError(
                f"Aggregate function '{self.name}' requires a measure column"
            )
        if coalesce and self.coalesce_value:
            column = F.coalesce(column, F.lit(0))
        expr = self.builder(column)
        if coalesce and self.coalesce_aggregate:
            expr = F.coalesce(expr, F.lit(0))
        return expr

    def __str__(self) -> str:
        return self.name


_FUNCTIONS: Dict[str, AggregateFunction] = {}


def register_aggregate_function(
    name: str,
    builder: Callable[..., Column],
    coalesce_value: bool = False,
    coalesce_aggregate: bool = False,
    generative: bool = False,
) -> AggregateFunction:
    fn = AggregateFunction(
        name, builder,
        coalesce_value=coalesce_value,
        coalesce_aggregate=coalesce_aggregate,
        generative=generative,
    )
    _FUNCTIONS[name] = fn
    return fn


# Parity table: functions.py:168-178
register_aggregate_function("sum", F.sum, coalesce_aggregate=True)
register_aggregate_function("count_nonempty", F.count, coalesce_aggregate=True)
register_aggregate_function("count", lambda: F.count(F.lit(1)), generative=True)
register_aggregate_function("count_distinct", F.count_distinct)
register_aggregate_function("min", F.min, coalesce_value=True)
register_aggregate_function("max", F.max, coalesce_value=True)
register_aggregate_function("avg", F.avg, coalesce_value=True)
register_aggregate_function("stddev", F.stddev_samp, coalesce_value=True)
register_aggregate_function("variance", F.var_samp, coalesce_value=True)

# Spark-native extras beyond the reference (designed-in upgrades).
# approx_count_distinct: the scale path for COUNT(DISTINCT) — HLL sketch,
# one pass, no shuffle explosion on high-cardinality keys.
register_aggregate_function("approx_count_distinct", F.approx_count_distinct)
register_aggregate_function("median", F.median)
register_aggregate_function(
    "p95", lambda c: F.percentile_approx(c, 0.95)
)
register_aggregate_function("first", F.first)
register_aggregate_function("last", F.last)
register_aggregate_function("stddev_pop", F.stddev_pop)
register_aggregate_function("var_pop", F.var_pop)


def get_aggregate_function(name: str) -> AggregateFunction:
    """Parity: functions.py:188-194."""
    return _FUNCTIONS[name]


def available_aggregate_functions() -> list:
    """Parity: functions.py:197-201."""
    return list(_FUNCTIONS.keys())
