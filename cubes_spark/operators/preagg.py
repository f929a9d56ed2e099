"""Pre-aggregation aware query rewriting.

The reference can only *materialize* the full-grain cuboid
(/root/reference/cubes/sql/store.py:549-628) — browsing it again
requires pointing a new cube at the table by hand.  Here materialized
cuboids are first-class: register one with the browser
(``browser.materialize_cuboid`` / ``browser.add_cuboid``) and any
aggregation whose grain, cell and aggregates it covers is transparently
rewritten to scan the (small) cuboid instead of the fact star.

At 100 TB this is the difference between re-scanning the fact table and
reading a few thousand pre-aggregated rows: a day-grain cuboid of a
100 TB fact is typically 4-6 orders of magnitude smaller, and month/
year/summary queries re-aggregate it in milliseconds.

Rewrite rules (correctness first — anything not provably equivalent
falls back to the fact star):

* requested drilldown attributes and cell attributes must all exist in
  the cuboid grain;
* if the requested grain EQUALS the cuboid grain, any stored aggregate
  is served as-is (cell filters only remove whole groups);
* if the requested grain is COARSER, only distributive aggregates
  re-aggregate: sum→sum, count→sum, count_nonempty→sum, min→min,
  max→max.  avg / count_distinct / stddev / variance do not.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

from pyspark.sql import functions as F

__all__ = ["Cuboid", "REAGGREGABLE", "reaggregation_column"]

#: aggregate function → re-aggregation over partial states
REAGGREGABLE = {
    "sum": F.sum,
    "count": F.sum,
    "count_nonempty": F.sum,
    "min": F.min,
    "max": F.max,
}

SAFE_SEP = "__"


def _safe(ref: str) -> str:
    return ref.replace(".", SAFE_SEP)


def reaggregation_column(aggregate: Any, exact_grain: bool):
    """Column expression re-aggregating a stored partial state."""
    col = F.col(f"`{aggregate.name}`")
    if exact_grain:
        # one cuboid row per output group — any aggregate passes through
        return F.first(col).alias(aggregate.name)
    return REAGGREGABLE[aggregate.function](col).alias(aggregate.name)


class Cuboid:
    """Descriptor of a materialized aggregate at a fixed grain."""

    def __init__(self, path: str, attribute_refs: Sequence[str],
                 aggregates: Sequence[Any]) -> None:
        self.path = path
        self.attribute_refs = list(attribute_refs)
        self.aggregates = {a.name: a for a in aggregates}

    @classmethod
    def materialize(cls, browser: Any, path: str, drilldown: Any,
                    aggregates: Optional[Sequence[str]] = None,
                    mode: str = "overwrite") -> "Cuboid":
        """Write the cuboid parquet (logical refs stored with ``__`` for
        dots) and return its descriptor."""
        from cubes_spark.functions.calculators import (
            CALCULATED_AGGREGATIONS,
        )
        from cubes_spark.query.drilldown import Drilldown

        dd = Drilldown(drilldown, browser.prepare_cell(None))
        prepared = [
            a for a in browser.prepare_aggregates(aggregates)
            if a.function not in CALCULATED_AGGREGATIONS
        ]
        df = browser.aggregation_dataframe(
            drilldown=dd, aggregates=[a.name for a in prepared]
        )
        safe = df.select(
            *[F.col(f"`{c}`").alias(_safe(c)) for c in df.columns]
        )
        safe.write.mode(mode).parquet(path)
        refs = [a.ref for a in dd.all_attributes]
        return cls(path, refs, prepared)

    def covers(self, attribute_refs: Sequence[str],
               aggregates: Sequence[Any],
               requested_grain_refs: Sequence[str]) -> bool:
        """Can this cuboid serve a query touching ``attribute_refs``
        (drilldown + cell attributes) with ``aggregates``?"""
        if not set(attribute_refs) <= set(self.attribute_refs):
            return False
        exact = set(requested_grain_refs) == set(self.attribute_refs)
        for agg in aggregates:
            stored = self.aggregates.get(agg.name)
            if stored is None:
                return False
            if not exact and agg.function not in REAGGREGABLE:
                return False
        return True

    def is_exact(self, requested_grain_refs: Sequence[str]) -> bool:
        return set(requested_grain_refs) == set(self.attribute_refs)

    def load(self, spark: Any):
        """The cuboid table with SAFE column names (no dots)."""
        return spark.read.parquet(self.path)
