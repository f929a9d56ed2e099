"""Attribute, Measure and MeasureAggregate model objects.

Parity: /root/reference/cubes/metadata/attributes.py:38-499 (objects),
551-608 (dependency sort). Expressions here are strings in a
Python-like syntax (see ``cubes_spark.plans.expressions`` for the
compiler to ``pyspark.sql.Column``); dependency extraction uses the
stdlib ``ast`` module instead of the external ``expressions`` package.
"""

from __future__ import annotations

import ast
import re
from typing import Any, Iterable, Optional

from cubes_spark.errors import (
    ArgumentError,
    ExpressionError,
    ModelError,
    NoSuchAttributeError,
)

__all__ = [
    "AttributeBase",
    "Attribute",
    "Measure",
    "MeasureAggregate",
    "create_list_of",
    "expand_attribute_metadata",
    "attribute_dependencies",
    "collect_attributes",
    "collect_dependencies",
    "depsort_attributes",
]


#: Implicit aggregate name and label formats
#: (parity: cubes/metadata/cube.py:26-43)
IMPLICIT_AGGREGATE_LABELS = {
    "sum": "Sum of {measure}",
    "count": "Record Count",
    "count_nonempty": "Count of {measure}",
    "min": "{measure} Minimum",
    "max": "{measure} Maximum",
    "avg": "Average of {measure}",
}


def expand_attribute_metadata(metadata: Any) -> dict:
    """A bare string becomes ``{"name": string}``
    (parity: cubes/metadata/attributes.py:527-535)."""
    if isinstance(metadata, str):
        return {"name": metadata}
    return dict(metadata)


class AttributeBase:
    """Base for Attribute/Measure/MeasureAggregate
    (parity: cubes/metadata/attributes.py:38-201)."""

    localizable_attributes = ["label", "description", "format"]

    def __init__(
        self,
        name: str,
        label: Optional[str] = None,
        description: Optional[str] = None,
        order: Optional[str] = None,
        info: Optional[dict] = None,
        format: Optional[str] = None,
        missing_value: Any = None,
        expression: Optional[str] = None,
        **kwargs: Any,
    ) -> None:
        if not name:
            raise ModelError("Attribute name must not be empty")
        self.name = name
        self.label = label
        self.description = description
        self.info = info or {}
        self.format = format
        self.missing_value = missing_value
        self.expression = expression

        self.order: Optional[str] = None
        if order:
            order = order.lower()
            if order.startswith("asc"):
                self.order = "asc"
            elif order.startswith("desc"):
                self.order = "desc"
            else:
                raise ArgumentError(f"Unknown ordering '{order}' of attribute '{name}'")

    @classmethod
    def from_metadata(cls, metadata: Any, **extra: Any) -> "AttributeBase":
        md = expand_attribute_metadata(metadata)
        md.update(extra)
        return cls(**md)

    # -- identity ------------------------------------------------------

    @property
    def ref(self) -> str:
        return self.name

    def __str__(self) -> str:
        return self.ref

    def __repr__(self) -> str:
        return f"<{type(self).__name__} {self.ref!r}>"

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, AttributeBase):
            return False
        return (
            self.name == other.name
            and self.label == other.label
            and self.info == other.info
            and self.description == other.description
            and self.format == other.format
            and self.expression == other.expression
            and self.missing_value == other.missing_value
        )

    def __ne__(self, other: Any) -> bool:
        return not self.__eq__(other)

    def __hash__(self) -> int:
        return hash(self.ref)

    # -- serialization -------------------------------------------------

    def to_dict(self, **options: Any) -> dict:
        d: dict = {"name": self.name}
        for key in ("label", "description", "format", "missing_value", "expression"):
            value = getattr(self, key)
            if value is not None:
                d[key] = value
        if self.order is not None:
            d["order"] = self.order
        if self.info:
            d["info"] = self.info
        d["ref"] = self.ref
        return d

    # -- expression dependencies ----------------------------------------

    @property
    def is_base(self) -> bool:
        return not self.expression

    @property
    def dependencies(self) -> set:
        """Set of attribute names this attribute's expression depends on
        (parity: attributes.py:188-201)."""
        if not self.expression:
            return set()
        return attribute_dependencies(self.expression)

    def localizable_dictionary(self) -> dict:
        return {
            "label": self.label,
            "description": self.description,
        }


class Attribute(AttributeBase):
    """Dimension attribute (parity: attributes.py:204-289)."""

    def __init__(
        self,
        name: str,
        label: Optional[str] = None,
        description: Optional[str] = None,
        order: Optional[str] = None,
        info: Optional[dict] = None,
        format: Optional[str] = None,
        missing_value: Any = None,
        expression: Optional[str] = None,
        dimension: Any = None,
        locales: Optional[list] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(
            name=name,
            label=label,
            description=description,
            order=order,
            info=info,
            format=format,
            missing_value=missing_value,
            expression=expression,
        )
        self.dimension = dimension
        self.locales = locales or []

    @property
    def ref(self) -> str:
        """``dimension.attribute`` for dimension attributes
        (parity: attributes.py:249-255)."""
        if self.dimension is not None:
            return f"{self.dimension.name}.{self.name}"
        return self.name

    def to_dict(self, **options: Any) -> dict:
        d = super().to_dict(**options)
        if self.locales:
            d["locales"] = self.locales
        return d

    def localized_ref(self, locale: Optional[str]) -> str:
        """Physical reference of a localized attribute
        (parity: cubes/sql/mapper.py:240-248 — per-locale column suffix)."""
        if locale:
            if not self.locales:
                raise ArgumentError(
                    f"Attribute '{self.name}' is not localizable"
                )
            if locale not in self.locales:
                raise ArgumentError(
                    f"Attribute '{self.name}' has no locale '{locale}'"
                )
            return f"{self.ref}.{locale}"
        return self.ref


class Measure(AttributeBase):
    """Cube measure (parity: attributes.py:292-403).

    `aggregates` is the list of aggregate function names to generate
    implicitly (default ``["sum"]``); `nonadditive` in none/time/all.
    """

    def __init__(
        self,
        name: str,
        label: Optional[str] = None,
        description: Optional[str] = None,
        order: Optional[str] = None,
        info: Optional[dict] = None,
        format: Optional[str] = None,
        missing_value: Any = None,
        expression: Optional[str] = None,
        aggregates: Optional[list] = None,
        formula: Optional[str] = None,
        nonadditive: Optional[str] = None,
        window_size: Optional[int] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(
            name=name,
            label=label,
            description=description,
            order=order,
            info=info,
            format=format,
            missing_value=missing_value,
            expression=expression,
        )
        self.formula = formula
        self.aggregates = aggregates
        self.window_size = window_size

        # Parity: attributes.py:329-338
        if not nonadditive or nonadditive == "none":
            self.nonadditive: Optional[str] = None
        elif nonadditive in ("all", "any"):
            self.nonadditive = "all"
        elif nonadditive == "time":
            self.nonadditive = "time"
        else:
            raise ModelError(f"Unknown non-additive measure type '{nonadditive}'")

    def to_dict(self, **options: Any) -> dict:
        d = super().to_dict(**options)
        if self.formula:
            d["formula"] = self.formula
        if self.aggregates:
            d["aggregates"] = self.aggregates
        if self.window_size:
            d["window_size"] = self.window_size
        return d

    def default_aggregates(self) -> list:
        """Implicit aggregates for this measure
        (parity: attributes.py:379-403)."""
        aggregates = []
        for agg in self.aggregates or ["sum"]:
            if agg == "identity":
                # pass-through: the aggregate IS the measure column,
                # no function, no suffix (parity: attributes.py:382-385)
                name = self.name
                measure = None
                function = None
            else:
                name = f"{self.name}_{agg}"
                measure = self.name
                function = agg
            label_fmt = IMPLICIT_AGGREGATE_LABELS.get(agg)
            label = label_fmt.format(measure=self.label or self.name) if label_fmt else None
            aggregates.append(
                MeasureAggregate(
                    name=name,
                    label=label,
                    description=self.description,
                    order=self.order,
                    info=self.info,
                    format=self.format,
                    measure=measure,
                    function=function,
                    window_size=self.window_size,
                    nonadditive=self.nonadditive,
                )
            )
        return aggregates


class MeasureAggregate(AttributeBase):
    """Aggregate of a measure (parity: attributes.py:406-499)."""

    def __init__(
        self,
        name: str,
        label: Optional[str] = None,
        description: Optional[str] = None,
        order: Optional[str] = None,
        info: Optional[dict] = None,
        format: Optional[str] = None,
        missing_value: Any = None,
        expression: Optional[str] = None,
        function: Optional[str] = None,
        formula: Optional[str] = None,
        measure: Optional[str] = None,
        nonadditive: Optional[str] = None,
        window_size: Optional[int] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(
            name=name,
            label=label,
            description=description,
            order=order,
            info=info,
            format=format,
            missing_value=missing_value,
            expression=expression,
        )
        self.function = function
        self.formula = formula
        self.measure = measure
        self.nonadditive = nonadditive
        self.window_size = window_size

    @property
    def is_base(self) -> bool:
        return not self.expression and not self.function

    @property
    def dependencies(self) -> set:
        """Measure it depends on, or expression dependencies
        (parity: attributes.py:475-490)."""
        if self.measure:
            if self.expression:
                raise ModelError(
                    f"Aggregate '{self.ref}' has both measure and expression set"
                )
            return {self.measure}
        if not self.expression:
            return set()
        return attribute_dependencies(self.expression)

    def to_dict(self, **options: Any) -> dict:
        d = super().to_dict(**options)
        for key in ("function", "formula", "measure", "window_size"):
            value = getattr(self, key)
            if value is not None:
                d[key] = value
        return d


# ---------------------------------------------------------------------------
# Collections & dependencies
# ---------------------------------------------------------------------------


def create_list_of(cls, metadata_list: Optional[Iterable]) -> list:
    """Create a list of model objects from metadata list."""
    return [cls.from_metadata(md) for md in (metadata_list or [])]


_EXPR_VARIABLES = {
    "current_date",
    "current_time",
    "local_date",
    "local_time",
    "true",
    "false",
    "null",
}


def attribute_dependencies(expression: str) -> set:
    """Extract attribute names referenced in an expression string.

    The reference delegates to the external ``expressions`` package
    (attributes.py:7,188-201); we use the stdlib ``ast``.  Dotted
    references like ``date.year`` appear as ``Attribute(value=Name)``
    nodes and are reassembled into ``"date.year"``.
    """
    # same pre-normalization as the compiler: `=` equality and the
    # reference grammar's if(...) (a Python keyword)
    normalized = re.sub(r"(?<![<>=!])=(?!=)", "==", expression)
    normalized = re.sub(r"\bif\s*\(", "iif(", normalized)
    try:
        tree = ast.parse(normalized, mode="eval")
    except SyntaxError as e:
        raise ExpressionError(f"Invalid expression '{expression}': {e}") from e

    deps: set = set()

    def dotted(node: ast.AST) -> Optional[str]:
        if isinstance(node, ast.Name):
            return node.id
        if isinstance(node, ast.Attribute):
            base = dotted(node.value)
            if base is not None:
                return f"{base}.{node.attr}"
        return None

    class Visitor(ast.NodeVisitor):
        def visit_Attribute(self, node: ast.Attribute) -> None:
            ref = dotted(node)
            if ref is not None:
                deps.add(ref)
            else:
                self.generic_visit(node)

        def visit_Name(self, node: ast.Name) -> None:
            deps.add(node.id)

        def visit_Call(self, node: ast.Call) -> None:
            # function name itself is not a dependency
            for arg in node.args:
                self.visit(arg)
            for kw in node.keywords:
                self.visit(kw.value)

    Visitor().visit(tree.body)
    return {d for d in deps if d.lower() not in _EXPR_VARIABLES}


def collect_attributes(attributes: Iterable, *containers: Any) -> list:
    """Collect attribute names from mixed sources
    (parity: attributes.py:508-524)."""
    collected: list = []
    for attr in attributes or []:
        collected.append(str(attr))
    for container in containers:
        if container is None:
            continue
        for attr in getattr(container, "all_attributes", container):
            collected.append(str(attr))
    return collected


def collect_dependencies(attributes: Iterable, all_attributes: Iterable) -> list:
    """Full dependency-sorted closure of `attributes`
    (parity: attributes.py:541-548, cube.py:500-517)."""
    depsorted = depsort_attributes([str(a) for a in attributes], all_attributes)
    return depsorted


def depsort_attributes(attributes: list, all_attributes: Iterable) -> list:
    """Topological sort of attribute refs by expression dependency
    (parity: attributes.py:551-608). Returns refs such that every
    attribute appears after all of its dependencies."""
    by_ref = {attr.ref: attr for attr in all_attributes}
    # dependency graph over the transitive closure of `attributes`
    required = list(attributes)
    depths: dict = {}
    graph: dict = {}
    seen: set = set()
    while required:
        ref = required.pop()
        if ref in seen:
            continue
        seen.add(ref)
        try:
            attr = by_ref[ref]
        except KeyError:
            raise NoSuchAttributeError(f"Unknown attribute '{ref}'")
        deps = set(attr.dependencies)
        graph[ref] = deps
        required.extend(deps)

    # Kahn's algorithm
    result: list = []
    satisfied: set = set()
    pending = dict(graph)
    while pending:
        ready = sorted(
            ref for ref, deps in pending.items() if deps <= satisfied
        )
        if not ready:
            cycle = ", ".join(sorted(pending))
            raise ExpressionError(
                f"Circular attribute dependency among: {cycle}"
            )
        for ref in ready:
            result.append(ref)
            satisfied.add(ref)
            del pending[ref]
    return result
