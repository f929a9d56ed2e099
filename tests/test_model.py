"""Model metadata expansion semantics (parity with
/root/reference/tests/test_model.py tier-1 coverage)."""

import pytest

from cubes_spark.errors import ModelError, NoSuchAttributeError
from cubes_spark.metadata.attributes import (
    Attribute,
    Measure,
    MeasureAggregate,
    depsort_attributes,
)
from cubes_spark.metadata.cube import Cube
from cubes_spark.metadata.dimension import Dimension


def test_bare_string_dimension_is_flat():
    dim = Dimension.from_metadata("status")
    assert dim.name == "status"
    assert len(dim.levels) == 1
    assert dim.is_flat


def test_attributes_only_dimension_single_level():
    dim = Dimension.from_metadata(
        {"name": "product", "attributes": ["code", "name"]}
    )
    assert len(dim.levels) == 1
    assert [a.name for a in dim.levels[0].attributes] == ["code", "name"]


def test_level_key_and_label_defaults():
    dim = Dimension.from_metadata({
        "name": "geo",
        "levels": [
            {"name": "city", "attributes": ["city_key", "city_name"],
             "key": "city_key", "label_attribute": "city_name"},
        ],
    })
    level = dim.levels[0]
    assert level.key.name == "city_key"
    assert level.label_attribute.name == "city_name"
    # first attribute is the default key when unspecified
    dim2 = Dimension.from_metadata(
        {"name": "d", "levels": [{"name": "l", "attributes": ["a", "b"]}]}
    )
    assert dim2.levels[0].key.name == "a"


def test_hierarchy_navigation():
    dim = Dimension.from_metadata({
        "name": "date",
        "levels": [{"name": n} for n in ("year", "month", "day")],
        "hierarchies": [
            {"name": "default", "levels": ["year", "month", "day"]},
            {"name": "ym", "levels": ["year", "month"]},
        ],
    })
    h = dim.hierarchy()
    assert [l.name for l in h.levels] == ["year", "month", "day"]
    assert [l.name for l in dim.hierarchy("ym").levels] == ["year", "month"]
    assert h.levels_for_depth(2)[-1].name == "month"


def test_dimension_template():
    base = Dimension.from_metadata({
        "name": "date",
        "levels": [{"name": "year"}, {"name": "month"}],
    })
    derived = Dimension.from_metadata(
        {"name": "ship_date", "template": "date"},
        templates={"date": base},
    )
    assert derived.name == "ship_date"
    assert [l.name for l in derived.levels] == ["year", "month"]


def test_attribute_ref_includes_dimension():
    dim = Dimension.from_metadata(
        {"name": "product", "attributes": ["code"]}
    )
    attr = dim.all_attributes[0]
    assert attr.ref == "product.code"


def test_implicit_fact_count_for_empty_cube():
    cube = Cube.from_metadata({"name": "empty"})
    names = [a.name for a in cube.aggregates]
    assert names == ["fact_count"]
    assert cube.aggregates[0].function == "count"


def test_implicit_aggregate_label():
    cube = Cube.from_metadata({
        "name": "c",
        "implicit_aggregates": True,
        "measures": [{"name": "amount",
                      "aggregates": ["sum"]}],
    })
    agg = cube.aggregate("amount_sum")
    assert agg.measure == "amount"
    assert agg.function == "sum"
    assert "amount" in (agg.label or "amount")


def test_cube_key_is_resolvable_attribute():
    cube = Cube.from_metadata({
        "name": "c",
        "key": "fact_id",
        "measures": [{"name": "amount"}],
    })
    attr = cube.attribute("fact_id")
    assert attr.ref == "fact_id"
    assert cube.collect_dependencies(["fact_id"])


def test_aggregate_lookup_error():
    cube = Cube.from_metadata({"name": "c", "measures": [{"name": "x"}]})
    with pytest.raises(NoSuchAttributeError):
        cube.aggregate("nope")


def test_depsort_expression_dependencies():
    attrs = [
        Measure("base"),
        Measure("double", expression="base * 2"),
        Measure("quad", expression="double * 2"),
    ]
    order = depsort_attributes(["quad"], attrs)
    assert order.index("base") < order.index("double") < order.index("quad")


def test_depsort_cycle_detected():
    from cubes_spark.errors import ExpressionError

    attrs = [
        Measure("a", expression="b + 1"),
        Measure("b", expression="a + 1"),
    ]
    with pytest.raises(ExpressionError):
        depsort_attributes(["a"], attrs)


def test_measure_default_aggregate_list():
    m = Measure.from_metadata({"name": "amount", "aggregates": ["sum", "min"]})
    assert m.aggregates == ["sum", "min"]


# -- JSON-schema model validation (parity:
#    /root/reference/cubes/schemas/*.json driving `slicer model
#    validate`, slicer/commands.py:205-248)


class TestModelSchemas:
    def _errors(self, metadata):
        from cubes_spark.metadata.schemas import validate_model

        return validate_model(metadata)

    def test_demo_model_is_schema_valid(self):
        from cubes_spark.demo import TPCH_MODEL

        assert self._errors(TPCH_MODEL) == []

    def test_unknown_model_key_rejected(self):
        errs = self._errors({"cubes": [], "no_such_key": 1})
        assert any("no_such_key" in m for _, _, m in errs)

    def test_cube_without_name(self):
        errs = self._errors({"cubes": [{"label": "x"}]})
        assert any(o == "cube '0'" and "name" in m for _, o, m in errs)

    def test_bad_cardinality_enum(self):
        errs = self._errors(
            {"dimensions": [{"name": "d", "cardinality": "huge"}]})
        assert any("huge" in m for _, _, m in errs)

    def test_level_without_name(self):
        errs = self._errors(
            {"dimensions": [{"name": "d",
                             "levels": [{"attributes": ["a"]}]}]})
        assert any("name" in m and "levels.0" in o for _, o, m in errs)

    def test_join_without_detail(self):
        errs = self._errors(
            {"cubes": [{"name": "c", "joins": [{"master": "t.c"}]}]})
        assert any("detail" in m for _, _, m in errs)

    def test_bad_join_method(self):
        errs = self._errors(
            {"cubes": [{"name": "c", "joins": [
                {"master": "a.x", "detail": "b.y",
                 "method": "outer"}]}]})
        assert any("outer" in m for _, _, m in errs)

    def test_compound_join_keys_allowed(self):
        assert self._errors(
            {"cubes": [{"name": "c", "joins": [
                {"master": {"table": "a", "column": ["x", "y"]},
                 "detail": ["b.x", "b.y"]}]}]}) == []

    def test_mapping_object_requires_column(self):
        errs = self._errors(
            {"cubes": [{"name": "c",
                        "mappings": {"m": {"table": "t"}}}]})
        assert any("column" in m for _, _, m in errs)

    def test_bad_nonadditive(self):
        errs = self._errors(
            {"dimensions": [{"name": "d", "nonadditive": "weird"}]})
        assert any("weird" in m for _, _, m in errs)

    def test_validate_command_rejects_schema_violations(self, tmp_path):
        import io
        import json as _json

        from cubes_spark.slicer import main
        from tests.conftest import SF_DIR

        bad = tmp_path / "bad_schema.json"
        bad.write_text(_json.dumps({
            "cubes": [{"name": "c", "fact": "lineitem",
                       "unknown_cube_key": True}],
        }))
        cfg = tmp_path / "cfg.json"
        cfg.write_text(_json.dumps({"store": SF_DIR}))
        out = io.StringIO()
        code = main(["--config", str(cfg), "validate", str(bad)],
                    out=out)
        assert code == 1
        assert "unknown_cube_key" in out.getvalue()


class TestDimensionCopySemantics:
    def _date(self):
        from cubes_spark.metadata.dimension import Dimension

        return Dimension.from_metadata({"name": "date", "levels": [
            {"name": "year", "attributes": ["year"]},
            {"name": "month", "attributes": ["month"]}]})

    def test_template_does_not_mutate_source(self):
        from cubes_spark.metadata.dimension import Dimension

        date = self._date()
        before = [a.ref for a in date.all_attributes]
        ship = Dimension.from_metadata(
            {"name": "ship_date", "template": "date"},
            templates={"date": date})
        assert [a.ref for a in date.all_attributes] == before
        assert [a.ref for a in ship.all_attributes] == [
            "ship_date.year", "ship_date.month"]
        # hierarchies reference each dimension's OWN level objects
        assert ship.hierarchies["default"].levels[0] \
            is ship.level("year")
        assert date.hierarchies["default"].levels[0] \
            is date.level("year")

    def test_clone_alias_does_not_mutate_source(self):
        date = self._date()
        before = [a.ref for a in date.all_attributes]
        alias = date.clone(alias="order_date")
        assert [a.ref for a in date.all_attributes] == before
        assert [a.ref for a in alias.all_attributes] == [
            "order_date.year", "order_date.month"]


def test_measure_identity_aggregate():
    """aggregates: ['identity'] passes the measure through — no
    suffix, no function (parity: reference attributes.py:382-385)."""
    from cubes_spark.metadata.cube import Cube

    cube = Cube.from_metadata({
        "name": "c", "fact": "t", "implicit_aggregates": True,
        "measures": [{"name": "amount",
                      "aggregates": ["identity", "sum"]}],
    })
    by_name = {a.name: a for a in cube.aggregates}
    assert "amount" in by_name
    assert by_name["amount"].function is None
    assert by_name["amount"].measure is None
    assert by_name["amount_sum"].function == "sum"
    assert not [e for e in (cube.validate() or [])
                if e[0] == "error"]


def test_schema_accepts_loader_supported_keys():
    from cubes_spark.metadata.schemas import validate_model

    assert validate_model({
        "cubes": [{"name": "c", "nonadditive": "time"}],
        "dimensions": [{"name": "d", "category": "time",
                        "order": "asc",
                        "hierarchy": ["l1"],
                        "levels": [{"name": "l1",
                                    "attributes": ["a"]}]}],
    }) == []
