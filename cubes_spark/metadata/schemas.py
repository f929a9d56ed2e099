"""JSON-schema validation for model metadata.

Parity surface: the reference ships ``cubes/schemas/{model,cube,
dimension}.json`` and ``slicer model validate`` reports violations
(/root/reference/cubes/schemas/, slicer/commands.py:205-248).  These
schemas express the same constraint set re-authored for this engine:

* draft 2020-12 with working ``anyOf``/``allOf`` combinators (the
  reference files spell them ``anyof``/``allof``, which JSON Schema
  ignores — their attribute-shape constraints never actually fire);
* the dialect's extensions are first-class: model-level
  ``table_expressions``/``translations``, aggregate ``window_size``,
  join ``method``/``alias``, per-mapping ``extract``/``function``/
  ``cast`` objects.

``validate_model`` yields (severity, owner, message) rows; the CLI
prints them and exits non-zero on errors, like the reference command.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

_ORDER = {"type": "string", "enum": ["asc", "desc"]}
_CARDINALITY = {"type": "string",
                "enum": ["tiny", "low", "medium", "high"]}
_NONADDITIVE = {"type": "string",
                "enum": ["none", "all", "any", "time"]}
_INFO = {"type": "object"}
_MISSING_VALUE = {"type": ["string", "number", "null", "boolean"]}

#: shared descriptive keys every named model object accepts
_BASE_PROPS = {
    "name": {"type": "string", "minLength": 1},
    "label": {"type": "string"},
    "description": {"type": "string"},
    "info": _INFO,
}

# -- attribute shapes --------------------------------------------------------

_ATTRIBUTE = {
    "type": "object",
    "properties": {
        **_BASE_PROPS,
        "format": {"type": "string"},
        "order": _ORDER,
        "missing_value": _MISSING_VALUE,
        "locales": {"type": "array", "items": {"type": "string"}},
    },
    "required": ["name"],
    "additionalProperties": False,
}

_MEASURE = {
    "type": "object",
    "properties": {
        **_BASE_PROPS,
        "format": {"type": "string"},
        "order": _ORDER,
        "missing_value": _MISSING_VALUE,
        "aggregates": {"type": "array", "items": {"type": "string"}},
        "nonadditive": _NONADDITIVE,
        "expression": {"type": "string"},
        "formula": {"type": "string"},
        "window_size": {"type": "integer", "minimum": 1},
    },
    "required": ["name"],
    "additionalProperties": False,
}

_AGGREGATE = {
    "type": "object",
    "properties": {
        **_BASE_PROPS,
        "format": {"type": "string"},
        "order": _ORDER,
        "missing_value": _MISSING_VALUE,
        "expression": {"type": "string"},
        "function": {"type": "string"},
        "formula": {"type": "string"},
        "nonadditive": _NONADDITIVE,
        "measure": {"type": "string"},
        "window_size": {"type": "integer", "minimum": 1},
    },
    "required": ["name"],
    "additionalProperties": False,
}

_NAME_OR = lambda schema: {"anyOf": [{"type": "string"}, schema]}  # noqa: E731

# -- mappings / joins --------------------------------------------------------

_MAPPING_TARGET = {
    "anyOf": [
        {"type": "string"},
        {
            "type": "object",
            "properties": {
                "table": {"type": "string"},
                "column": {"type": "string"},
                "schema": {"type": "string"},
                "extract": {"type": "string"},
                "function": {"type": "string"},
                "cast": {"type": "string"},
            },
            "required": ["column"],
            "additionalProperties": False,
        },
    ]
}

_MAPPINGS = {
    "type": "object",
    "additionalProperties": _MAPPING_TARGET,
}

#: a join side: "table.column", ["t.c1", "t.c2"] (compound key), or
#: an object with table/column(s)
_JOIN_KEY = {
    "anyOf": [
        {"type": "string"},
        {"type": "array", "items": {"type": "string"}, "minItems": 1},
        {
            "type": "object",
            "properties": {
                "table": {"type": "string"},
                "column": {"anyOf": [
                    {"type": "string"},
                    {"type": "array", "items": {"type": "string"},
                     "minItems": 1},
                ]},
                "schema": {"type": "string"},
                "columns": {"type": "array",
                            "items": {"type": "string"}},
            },
            "additionalProperties": False,
        },
    ]
}

_JOIN = {
    "type": "object",
    "properties": {
        "master": _JOIN_KEY,
        "detail": _JOIN_KEY,
        "alias": {"type": "string"},
        "method": {"type": "string",
                   "enum": ["match", "master", "detail"]},
    },
    "required": ["master", "detail"],
    "additionalProperties": False,
}

# -- dimension ---------------------------------------------------------------

_LEVEL = {
    "type": "object",
    "properties": {
        **_BASE_PROPS,
        "role": {"type": "string"},
        "cardinality": _CARDINALITY,
        "key": {"type": "string"},
        "label_attribute": {"type": "string"},
        "order_attribute": {"type": "string"},
        "order": _ORDER,
        "attributes": {"type": "array", "items": _NAME_OR(_ATTRIBUTE)},
    },
    "required": ["name"],
    "additionalProperties": False,
}

_HIERARCHY = {
    "type": "object",
    "properties": {
        **_BASE_PROPS,
        "levels": {"type": "array", "items": {"type": "string"}},
    },
    "required": ["name"],
    "additionalProperties": False,
}

DIMENSION_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "title": "Dimension",
    "type": "object",
    "properties": {
        **_BASE_PROPS,
        "template": {"type": "string"},
        "role": {"type": "string"},
        "nonadditive": _NONADDITIVE,
        "cardinality": _CARDINALITY,
        "levels": {"type": "array", "items": _NAME_OR(_LEVEL)},
        "attributes": {"type": "array", "items": _NAME_OR(_ATTRIBUTE)},
        "hierarchies": {"type": "array", "items": _HIERARCHY},
        # single-hierarchy shorthand + flat-dimension promoted keys,
        # all consumed by expand_dimension_metadata
        "hierarchy": {"type": "array", "items": {"type": "string"}},
        "category": {"type": "string"},
        "order": _ORDER,
        "default_hierarchy_name": {"type": "string"},
        "key": {"type": "string"},
        "label_attribute": {"type": "string"},
        "order_attribute": {"type": "string"},
    },
    "required": ["name"],
    "additionalProperties": False,
}

# -- cube --------------------------------------------------------------------

_DIMENSION_LINK = {
    "anyOf": [
        {"type": "string"},
        {
            "type": "object",
            "properties": {
                "name": {"type": "string"},
                "alias": {"type": "string"},
                "hierarchies": {"type": "array",
                                "items": {"type": "string"}},
                "default_hierarchy_name": {"type": "string"},
                "cardinality": _CARDINALITY,
                "nonadditive": _NONADDITIVE,
            },
            "required": ["name"],
            "additionalProperties": False,
        },
    ]
}

CUBE_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "title": "Cube",
    "type": "object",
    "properties": {
        **_BASE_PROPS,
        "category": {"type": "string"},
        "fact": {"type": "string"},
        "key": {"type": "string"},
        "store": {"type": "string"},
        "nonadditive": _NONADDITIVE,
        # accepted by Cube.__init__ alongside the reference keys
        "locale": {"type": "string"},
        "dimension_links": {"type": "array"},
        "options": {"type": "object"},
        "browser_options": {"type": "object"},
        "measures": {"type": "array", "items": _NAME_OR(_MEASURE)},
        "aggregates": {"type": "array", "items": _NAME_OR(_AGGREGATE)},
        "details": {"type": "array", "items": _NAME_OR(_ATTRIBUTE)},
        "implicit_aggregates": {"type": "boolean"},
        "dimensions": {"type": "array", "items": _DIMENSION_LINK},
        "hierarchies": {
            "type": "object",
            "additionalProperties": {
                "type": "array", "items": {"type": "string"}},
        },
        "mappings": _MAPPINGS,
        "joins": {"type": "array", "items": _JOIN},
    },
    "required": ["name"],
    "additionalProperties": False,
}

# -- model -------------------------------------------------------------------

MODEL_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "title": "Cubes Model",
    "type": "object",
    "properties": {
        **_BASE_PROPS,
        "provider": {"type": "string"},
        "store": {"type": "string"},
        "schema": {"type": "string"},
        "browser_options": {"type": "object"},
        "locale": {"type": "string"},
        # cube/dimension content is validated per-object below so one
        # message names the offending cube, not the whole model
        "cubes": {"type": "array", "items": {"type": "object"}},
        "dimensions": {"type": "array", "items": {"type": "object"}},
        "mappings": _MAPPINGS,
        "joins": {"type": "array", "items": _JOIN},
        # dialect extensions
        "table_expressions": {
            "type": "object",
            "additionalProperties": {"type": "string"},
        },
        "translations": {"type": "object"},
    },
    "additionalProperties": False,
}


def _iter_schema_errors(schema: dict, instance: Any,
                        owner: str) -> Iterator[Tuple[str, str, str]]:
    import jsonschema

    validator = jsonschema.Draft202012Validator(schema)
    for err in sorted(validator.iter_errors(instance),
                      key=lambda e: list(e.absolute_path)):
        path = ".".join(str(p) for p in err.absolute_path)
        where = f"{owner}[{path}]" if path else owner
        # an anyOf miss reports the combinator, not the useful branch:
        # surface the most specific sub-error — prefer one that is not
        # a bare type mismatch (for anyOf[string, object] with a dict
        # instance, "X is not of type 'string'" is the useless branch)
        while err.context:
            err = max(err.context,
                      key=lambda e: (e.validator != "type",
                                     len(list(e.absolute_path))))
        yield ("error", where, err.message)


def validate_model(metadata: dict) -> list:
    """Validate model metadata against the schemas; returns
    ``[(severity, owner, message), ...]`` (empty = schema-valid).
    Severity is always ``error`` for schema violations — advisory
    checks (unused dimensions etc.) live in the structural pass of
    ``slicer model validate``."""
    problems = []
    if not isinstance(metadata, dict):
        return [("error", "model",
                 f"model metadata must be an object, got "
                 f"{type(metadata).__name__}")]
    problems += _iter_schema_errors(MODEL_SCHEMA, metadata, "model")
    for i, dim in enumerate(metadata.get("dimensions") or []):
        if not isinstance(dim, dict):
            continue  # flagged by MODEL_SCHEMA already
        owner = f"dimension '{dim.get('name', i)}'"
        problems += _iter_schema_errors(DIMENSION_SCHEMA, dim, owner)
    for i, cube in enumerate(metadata.get("cubes") or []):
        if not isinstance(cube, dict):
            continue
        owner = f"cube '{cube.get('name', i)}'"
        problems += _iter_schema_errors(CUBE_SCHEMA, cube, owner)
    return problems
