"""Cube model object.

Parity: /root/reference/cubes/metadata/cube.py (Cube 46-271,
from_metadata 107-188, expand_cube_metadata 781-826, implicit
fact_count 26-30,120-121, aggregate labels 33-43,743-759,
collect_dependencies 500-517, distilled hierarchies 574-594).
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

from cubes_spark.errors import (
    ArgumentError,
    ModelError,
    ModelInconsistencyError,
    NoSuchAttributeError,
    NoSuchDimensionError,
)
from cubes_spark.metadata.attributes import (
    Attribute,
    AttributeBase,
    IMPLICIT_AGGREGATE_LABELS,
    Measure,
    MeasureAggregate,
    collect_attributes,
    depsort_attributes,
    expand_attribute_metadata,
)
from cubes_spark.metadata.dimension import Dimension

__all__ = ["Cube", "expand_cube_metadata", "expand_dimension_links"]

#: Parity: cube.py:26-30
DEFAULT_FACT_COUNT_AGGREGATE = {
    "name": "fact_count",
    "label": "Count",
    "function": "count",
}

#: Labels of window/post calculators (parity: statutils aggregate_calculator_labels)
CALCULATED_AGGREGATE_LABELS = {
    "sma": "{measure} sma",
    "wma": "{measure} wma",
    "sms": "{measure} sms",
    "smstd": "{measure} smstd",
    "smvar": "{measure} smvar",
    "smrsd": "{measure} smrsd",
}

_ALL_AGGREGATE_LABELS = dict(IMPLICIT_AGGREGATE_LABELS)
_ALL_AGGREGATE_LABELS.update(CALCULATED_AGGREGATE_LABELS)


def _measure_aggregate_label(aggregate: MeasureAggregate, measure: Optional[AttributeBase]) -> str:
    """Parity: cube.py:743-759."""
    function = aggregate.function
    template = _ALL_AGGREGATE_LABELS.get(function, "{measure}")
    if measure:
        measure_label = measure.label or measure.name
    else:
        measure_label = aggregate.measure or aggregate.name
    return template.format(measure=measure_label)


class Cube:
    """Logical fact set: measures, aggregates, details, dimensions and
    physical binding info (fact table, mappings, joins, store)."""

    def __init__(
        self,
        name: str,
        dimensions: Optional[list] = None,
        measures: Optional[list] = None,
        aggregates: Optional[list] = None,
        label: Optional[str] = None,
        details: Optional[list] = None,
        mappings: Optional[dict] = None,
        joins: Optional[list] = None,
        fact: Optional[str] = None,
        key: Optional[str] = None,
        description: Optional[str] = None,
        browser_options: Optional[dict] = None,
        info: Optional[dict] = None,
        dimension_links: Optional[list] = None,
        locale: Optional[str] = None,
        category: Optional[str] = None,
        store: Optional[str] = None,
        **options: Any,
    ) -> None:
        if dimensions and dimension_links:
            raise ModelError(
                "Both dimensions and dimension_links provided, use only one."
            )
        self.name = name
        self.label = label
        self.description = description
        self.info = info or {}
        self.locale = locale
        self.category = category

        self.measures: list = list(measures or [])
        self.aggregates: list = list(aggregates or [])
        self.details: list = list(details or [])

        # physical binding
        self.mappings = mappings or {}
        self.joins = list(joins or [])
        self.fact = fact
        self.key = key
        self.browser_options = browser_options or {}
        self.store = store
        self.options = options

        self.dimension_links: list = list(dimension_links or [])
        self._dimensions: dict = {}
        for dim in dimensions or []:
            self._add_dimension(dim)

        # The fact key is resolvable as an implicit base detail attribute
        # so fact()/facts(fact_list=...) and key-coalesced counts can pull
        # it through the attribute closure (parity:
        # /root/reference/cubes/sql/browser.py:211-232, where the mapper
        # resolves the key outside the cube's public attribute list).
        self._implicit_key_attributes: list = []
        if self.key and not self._has_fact_attribute(self.key):
            self._implicit_key_attributes = [Attribute(self.key)]

    def _has_fact_attribute(self, name: str) -> bool:
        for attr in self.details + self.measures:
            if attr.name == name:
                return True
        return False

    # -- construction ---------------------------------------------------

    @classmethod
    def from_metadata(cls, metadata: dict) -> "Cube":
        """Create a cube from JSON-compatible metadata. Dimensions remain
        unlinked (``dimension_links``) until ``link_dimension`` is called
        (parity: cube.py:107-188)."""
        if "name" not in metadata:
            raise ModelError("Cube metadata has no name")

        metadata = expand_cube_metadata(metadata)
        dimension_links = metadata.pop("dimensions", [])

        if "measures" not in metadata and "aggregates" not in metadata:
            metadata["aggregates"] = [dict(DEFAULT_FACT_COUNT_AGGREGATE)]

        details = [Attribute.from_metadata(md) for md in metadata.pop("details", [])]
        measures = [Measure.from_metadata(md) for md in metadata.pop("measures", [])]

        nonadditive = metadata.pop("nonadditive", None)
        if nonadditive:
            for measure in measures:
                measure.nonadditive = measure.nonadditive or nonadditive

        aggregates = [
            MeasureAggregate.from_metadata(md)
            for md in metadata.pop("aggregates", [])
        ]

        aggregate_dict = {a.name: a for a in aggregates}
        measure_dict = {m.name: m for m in measures}

        # Parity: cube.py:140-166
        if metadata.pop("implicit_aggregates", False):
            for measure in measures:
                for aggregate in measure.default_aggregates():
                    existing = aggregate_dict.get(aggregate.name)
                    if existing:
                        if existing.function != aggregate.function:
                            raise ModelError(
                                f"Aggregate '{aggregate.name}' function mismatch. "
                                f"Implicit function {aggregate.function}, explicit "
                                f"function: {existing.function}."
                            )
                        continue
                    if any(
                        agg.function == aggregate.function
                        and agg.measure == measure.name
                        for agg in aggregates
                    ):
                        continue
                    aggregates.append(aggregate)
                    aggregate_dict[aggregate.name] = aggregate

        # Implicit aggregate labels + nonadditive inheritance
        # (parity: cube.py:169-184)
        for aggregate in aggregates:
            measure = measure_dict.get(aggregate.measure) or aggregate_dict.get(
                aggregate.measure
            )
            if aggregate.label is None:
                aggregate.label = _measure_aggregate_label(aggregate, measure)
            if measure is not None and aggregate.nonadditive is None:
                aggregate.nonadditive = getattr(measure, "nonadditive", None)

        return cls(
            measures=measures,
            aggregates=aggregates,
            dimension_links=dimension_links,
            details=details,
            **metadata,
        )

    @property
    def basename(self) -> str:
        """Cube name without any local namespace prefix (parity:
        reference cube.py:232-235, where ``basename = name``; here a
        namespaced registration keeps the trailing segment as the
        remote-addressable name)."""
        return self.name.rsplit(".", 1)[-1]

    def _add_dimension(self, dimension: Dimension) -> None:
        if not isinstance(dimension, Dimension):
            raise ModelError(
                f"Dimension for cube '{self.name}' is not a Dimension instance"
            )
        self._dimensions[dimension.name] = dimension

    def link_dimension(self, dimension: Dimension) -> None:
        """Link a dimension, applying per-cube overrides from the matching
        dimension link (parity: cube.py:519-530)."""
        link = next(
            (l for l in self.dimension_links if l.get("name") == dimension.name),
            None,
        )
        if link:
            overrides = {k: v for k, v in link.items() if k != "name"}
            if overrides:
                dimension = dimension.clone(**overrides)
        self._add_dimension(dimension)

    # -- access ----------------------------------------------------------

    @property
    def dimensions(self) -> list:
        return list(self._dimensions.values())

    def dimension(self, obj: Any) -> Dimension:
        if isinstance(obj, Dimension):
            obj = obj.name
        try:
            return self._dimensions[str(obj)]
        except KeyError:
            raise NoSuchDimensionError(
                f"Cube '{self.name}' has no dimension '{obj}'", name=str(obj)
            )

    @property
    def all_dimension_attributes(self) -> list:
        return [attr for dim in self.dimensions for attr in dim.all_attributes]

    @property
    def all_attributes(self) -> list:
        """Dimension attributes + details + measures + aggregates
        (parity: cube.py:~300 all_fact_attributes)."""
        return (
            self.all_dimension_attributes
            + self.details
            + self._implicit_key_attributes
            + self.measures
            + self.aggregates
        )

    @property
    def all_fact_attributes(self) -> list:
        return (
            self.all_dimension_attributes
            + self.details
            + self._implicit_key_attributes
            + self.measures
        )

    @property
    def base_attributes(self) -> list:
        return [attr for attr in self.all_attributes if attr.is_base]

    def attribute(self, ref: str) -> AttributeBase:
        """Look up any attribute (dimension attr, detail, measure,
        aggregate) by ref or plain name."""
        for attr in self.all_attributes:
            if attr.ref == ref or attr.name == ref:
                return attr
        raise NoSuchAttributeError(
            f"Cube '{self.name}' has no attribute '{ref}'"
        )

    def get_attributes(self, refs: Iterable, aggregated: bool = False) -> list:
        return [self.attribute(str(r)) for r in refs]

    def measure(self, name: str) -> Measure:
        for m in self.measures:
            if m.name == str(name):
                return m
        raise NoSuchAttributeError(f"Cube '{self.name}' has no measure '{name}'")

    def aggregate(self, name: str) -> MeasureAggregate:
        for a in self.aggregates:
            if a.name == str(name):
                return a
        raise NoSuchAttributeError(
            f"Cube '{self.name}' has no measure aggregate '{name}'"
        )

    def get_aggregates(self, names: Optional[Iterable] = None) -> list:
        if names is None:
            return list(self.aggregates)
        return [self.aggregate(str(n)) for n in names]

    def collect_dependencies(self, attributes: Iterable) -> list:
        """Dependency-sorted closure of attribute refs → attribute objects
        (parity: cube.py:500-517)."""
        refs = depsort_attributes(
            [str(a) for a in attributes], self.all_attributes
        )
        return [self.attribute(ref) for ref in refs]

    def distilled_hierarchies(self) -> dict:
        """Map ``(dim_name, hierarchy_name) -> [level key refs]``, incl.
        ``(dim, None)`` for the default hierarchy (parity: cube.py:574-594)."""
        hierarchies = {}
        for dim in self.dimensions:
            for hname, hier in dim.hierarchies.items():
                keys = [level.key.ref for level in hier.levels]
                hierarchies[(dim.name, hname)] = keys
            default = dim.hierarchy()
            hierarchies[(dim.name, None)] = [
                level.key.ref for level in default.levels
            ]
        return hierarchies

    def __repr__(self) -> str:
        return f"<Cube {self.name!r}>"

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, Cube)
            and self.name == other.name
            and self.measures == other.measures
            and self.aggregates == other.aggregates
        )

    def __hash__(self) -> int:
        return hash(self.name)

    def to_dict(self, expand_dimensions: bool = False, **options: Any) -> dict:
        d: dict = {
            "name": self.name,
            "measures": [m.to_dict(**options) for m in self.measures],
            "aggregates": [a.to_dict(**options) for a in self.aggregates],
            "details": [a.to_dict(**options) for a in self.details],
        }
        for key in ("label", "category", "description", "fact", "key", "locale"):
            value = getattr(self, key)
            if value is not None:
                d[key] = value
        if self.info:
            d["info"] = self.info
        if expand_dimensions:
            d["dimensions"] = [dim.to_dict(**options) for dim in self.dimensions]
        else:
            d["dimensions"] = [dim.name for dim in self.dimensions]
        if self.mappings:
            d["mappings"] = self.mappings
        if self.joins:
            d["joins"] = self.joins
        return d

    def validate(self) -> list:
        """Model consistency check → list of (severity, message)
        (parity: cube.py validate + slicer `model validate` checks)."""
        from cubes_spark.functions.aggregates import (
            available_aggregate_functions,
        )
        from cubes_spark.functions.calculators import available_calculators

        results = []
        measure_names = set()
        for measure in self.measures:
            if measure.name in measure_names:
                results.append(
                    ("error",
                     f"Duplicate measure '{measure.name}' "
                     f"in cube '{self.name}'")
                )
            measure_names.add(measure.name)

        known_functions = set(available_aggregate_functions()) \
            | set(available_calculators())
        aggregate_names = set()
        for aggregate in self.aggregates:
            if aggregate.name in aggregate_names:
                results.append(
                    ("error",
                     f"Duplicate aggregate '{aggregate.name}' "
                     f"in cube '{self.name}'")
                )
            aggregate_names.add(aggregate.name)
            if aggregate.function and aggregate.function not in known_functions:
                results.append(
                    ("error",
                     f"Unknown function '{aggregate.function}' of "
                     f"aggregate '{aggregate.name}' in cube '{self.name}'")
                )
            if aggregate.measure and not aggregate.expression:
                known = measure_names | {
                    a.name for a in self.aggregates
                } | {d.name for d in self.details}
                if aggregate.measure not in known:
                    results.append(
                        ("error",
                         f"Unknown measure '{aggregate.measure}' of "
                         f"aggregate '{aggregate.name}' "
                         f"in cube '{self.name}'")
                    )

        if not self.aggregates and not self.measures:
            results.append(
                ("warning",
                 f"Cube '{self.name}' has no measures nor aggregates")
            )
        return results


# ---------------------------------------------------------------------------
# Metadata expansion (parity: cube.py:781-826 + expand_dimension_links)
# ---------------------------------------------------------------------------


def expand_dimension_links(metadata: list) -> list:
    """Each link is a dict with at least ``name``; a bare string becomes
    ``{"name": str}`` (parity: cubes/metadata/dimension.py:1219-1233)."""
    links = []
    for link in metadata:
        if isinstance(link, str):
            link = {"name": link}
        else:
            link = dict(link)
        links.append(link)
    return links


def expand_cube_metadata(metadata: dict) -> dict:
    """Parity: cube.py:781-826."""
    metadata = dict(metadata)
    if "name" not in metadata:
        raise ModelError("Cube has no name")

    links = metadata.get("dimensions", [])
    if links:
        links = expand_dimension_links(links)

    if "hierarchies" in metadata:
        dim_hiers = dict(metadata.pop("hierarchies"))
        for link in links:
            hiers = dim_hiers.pop(link["name"], None)
            if hiers is not None:
                link["hierarchies"] = hiers
        if dim_hiers:
            raise ModelError(
                "There are hierarchies specified for non-linked dimensions: "
                f"{list(dim_hiers.keys())}."
            )

    nonadditive = metadata.pop("nonadditive", None)
    if "measures" in metadata:
        measures = []
        for attr in metadata["measures"]:
            attr = expand_attribute_metadata(attr)
            if nonadditive:
                attr["nonadditive"] = attr.get("nonadditive", nonadditive)
            measures.append(attr)
        metadata["measures"] = measures

    if links:
        metadata["dimensions"] = links

    return metadata
