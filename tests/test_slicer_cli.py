"""slicer CLI commands (parity surface:
/root/reference/cubes/slicer/commands.py)."""

import io
import json
import os

import pytest

from cubes_spark.demo import TPCH_MODEL
from cubes_spark.slicer import main
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def config_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("slicer") / "slicer.json"
    path.write_text(json.dumps({
        "store": SF_DIR,
        "model": TPCH_MODEL,
    }))
    return str(path)


def run(config_path, *argv):
    out = io.StringIO()
    code = main(["--config", config_path, *argv], out=out)
    return code, out.getvalue()


def test_list(config_path, spark):
    code, out = run(config_path, "list")
    assert code == 0
    assert "sales" in out


def test_validate_ok(config_path, spark):
    code, out = run(config_path, "validate")
    assert code == 0
    assert "valid" in out


def test_validate_broken(config_path, tmp_path, spark):
    bad = tmp_path / "bad_model.json"
    bad.write_text(json.dumps({
        "dimensions": [{"name": "d", "levels": [
            {"name": "l", "attributes": ["a"]}]}],
        "cubes": [{"name": "c", "dimensions": ["d"],
                   "measures": [{"name": "m"}],
                   "aggregates": [{"name": "x", "function": "sum",
                                   "measure": "missing"}]}],
    }))
    code, out = run(config_path, "validate", str(bad))
    assert code == 1
    assert "ERROR" in out


def test_smoke_test_command(config_path, spark):
    code, out = run(config_path, "test")
    assert code == 0
    assert "OK    sales" in out


def test_aggregate_materialization(config_path, tmp_path, spark):
    target = str(tmp_path / "cuboid")
    code, out = run(config_path, "aggregate", "sales", target,
                    "--drilldown", "date:year",
                    "--aggregates", "price_sum", "fact_count")
    assert code == 0
    df = spark.read.parquet(target)
    assert df.count() == 7
    assert "date__year" in df.columns


def test_denormalize_materialization(config_path, tmp_path, spark):
    target = str(tmp_path / "denorm")
    code, out = run(config_path, "denormalize", "sales", target)
    assert code == 0
    df = spark.read.parquet(target)
    assert df.count() == spark.read.parquet(
        f"{SF_DIR}/lineitem.parquet").count()
