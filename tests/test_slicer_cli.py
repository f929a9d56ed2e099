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
    code, out = run(config_path, "sql-aggregate", "sales", target,
                    "--drilldown", "date:year",
                    "--aggregates", "price_sum", "fact_count")
    assert code == 0
    df = spark.read.parquet(target)
    assert df.count() == 7
    assert "date__year" in df.columns


def test_aggregate_query_csv(config_path, spark):
    """Query-style `slicer aggregate` matches the browser through the
    CSV formatter (parity: commands.py:441-509)."""
    code, out = run(config_path, "aggregate", "sales",
                    "-d", "date:year", "-a", "price_sum",
                    "-a", "fact_count", "-f", "csv")
    assert code == 0

    from cubes_spark.slicer import build_workspace
    from cubes_spark.formatters import CSVFormatter

    ws = build_workspace({"store": SF_DIR, "model": TPCH_MODEL}, spark)
    browser = ws.browser("sales")
    result = browser.aggregate(None, aggregates=["price_sum", "fact_count"],
                               drilldown=["date:year"])
    expected = CSVFormatter().format(browser.cube, result)
    assert out == expected
    assert "price_sum" in out.splitlines()[0]


def test_aggregate_query_cross_table(config_path, spark):
    code, out = run(config_path, "aggregate", "sales",
                    "-d", "date:year", "-c", "returnflag:N",
                    "-a", "price_sum",
                    "--on-row", "date.year", "-f", "cross_table")
    assert code == 0
    doc = json.loads(out)
    assert set(doc) == {"columns", "rows", "data"}
    assert len(doc["rows"]) == 7  # 1992-1998


def test_aggregate_query_json(config_path, spark):
    code, out = run(config_path, "aggregate", "sales",
                    "-d", "date:year", "-a", "fact_count", "-f", "json")
    assert code == 0
    doc = json.loads(out)
    assert len(doc["cells"]) == 7
    assert all("fact_count" in cell for cell in doc["cells"])


def test_aggregate_query_unknown_format(config_path, spark):
    code, out = run(config_path, "aggregate", "sales",
                    "-d", "date:year", "-f", "nope")
    assert code == 1
    assert "Unknown format" in out


def test_members_command_json(config_path, spark):
    """`slicer members` matches browser.members (commands.py:512-587)."""
    code, out = run(config_path, "members", "sales", "date:year")
    assert code == 0

    from cubes_spark.slicer import build_workspace

    ws = build_workspace({"store": SF_DIR, "model": TPCH_MODEL}, spark)
    browser = ws.browser("sales")
    expected = browser.members(None, "date", depth=1)
    assert json.loads(out) == json.loads(
        json.dumps(expected, default=str))


def test_members_command_csv_cut(config_path, spark):
    code, out = run(config_path, "members", "sales", "date:year",
                    "-c", "date:1995", "-f", "csv")
    assert code == 0
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 2  # header + single member
    assert lines[1] == "1995"


def test_denormalize_materialization(config_path, tmp_path, spark):
    target = str(tmp_path / "denorm")
    code, out = run(config_path, "denormalize", "sales", target)
    assert code == 0
    df = spark.read.parquet(target)
    assert df.count() == spark.read.parquet(
        f"{SF_DIR}/lineitem.parquet").count()


def test_ext_info():
    out = io.StringIO()
    assert main(["ext-info"], out=out) == 0
    text = out.getvalue()
    for expected in ("aggregate_function:", "sum", "count_distinct",
                     "calculator:", "sma", "formatter:", "csv",
                     "authenticator:", "http_basic_proxy"):
        assert expected in text
    out = io.StringIO()
    assert main(["ext-info", "calculator"], out=out) == 0
    assert "sma" in out.getvalue()
    assert "aggregate_function" not in out.getvalue()
    assert main(["ext-info", "nonsense"], out=io.StringIO()) == 1


def test_model_convert_roundtrip(tmp_path):
    model_path = tmp_path / "model.json"
    model_path.write_text(json.dumps(TPCH_MODEL))

    # json -> bundle
    bundle = tmp_path / "bundle"
    assert main(["convert", "--format", "bundle", str(model_path),
                 str(bundle)], out=io.StringIO()) == 0
    files = sorted(os.listdir(bundle))
    assert "model.json" in files
    assert any(f.startswith("cube_sales") for f in files)
    assert any(f.startswith("dim_date") for f in files)

    # bundle -> json: same model back (list order preserved per kind)
    out = io.StringIO()
    assert main(["convert", str(bundle)], out=out) == 0
    back = json.loads(out.getvalue())
    assert {c["name"] for c in back["cubes"]} == \
        {c["name"] for c in TPCH_MODEL["cubes"]}
    assert {d["name"] for d in back["dimensions"]} == \
        {d["name"] for d in TPCH_MODEL["dimensions"]}

    # bundle is importable as a workspace model
    from cubes_spark.sources.workspace import Workspace

    ws = Workspace(store=SF_DIR, model=str(bundle))
    assert ws.cube("sales").name == "sales"

    # refusing to overwrite without --force
    from cubes_spark.errors import ArgumentError

    with pytest.raises(ArgumentError):
        main(["convert", "--format", "bundle", str(model_path),
              str(bundle)], out=io.StringIO())
    # --force replaces
    assert main(["convert", "--format", "bundle", "--force",
                 str(model_path), str(bundle)], out=io.StringIO()) == 0


def test_dedup_command_minhash(config_path, tmp_path, spark):
    target = str(tmp_path / "dedup_minhash")
    code, text = run(config_path, "dedup", "documents", target,
                     "--method", "minhash")
    assert code == 0
    assert "canonical" in text
    out = spark.read.parquet(target)
    assert set(out.columns) == {"doc_id", "component", "is_canonical"}
    assert out.count() == out.select("doc_id").distinct().count()
    # canonical member is its own component
    bad = out.filter("is_canonical AND component != doc_id").count()
    assert bad == 0


def test_dedup_command_exact(config_path, tmp_path, spark):
    target = str(tmp_path / "dedup_exact")
    code, text = run(config_path, "dedup", "documents", target,
                     "--method", "exact")
    assert code == 0
    out = spark.read.parquet(target)
    total = out.count()
    kept = out.filter("is_canonical").count()
    assert total > 0 and kept <= total
    # every doc appears exactly once
    assert total == out.select("doc_id").distinct().count()


def test_dedup_command_embedding(config_path, tmp_path, spark):
    target = str(tmp_path / "dedup_emb")
    code, text = run(config_path, "dedup", "embeddings", target,
                     "--method", "embedding", "--id-column", "vec_id",
                     "--threshold", "0.4")
    assert code == 0
    out = spark.read.parquet(target)
    assert out.filter("NOT is_canonical").count() > 0


def test_multi_model_namespaced_config(tmp_path, spark):
    """Config 'models' list loads extra models into namespaces; the
    server and CLI then see dotted cube names."""
    extra = {
        "cubes": [{
            "name": "orders_only",
            "fact": "orders",
            "aggregates": [{"name": "fact_count", "function": "count"}],
            "mappings": {},
        }],
    }
    cfg = tmp_path / "multi.json"
    cfg.write_text(json.dumps({
        "store": SF_DIR,
        "model": TPCH_MODEL,
        "models": [{"model": extra, "namespace": "extra"}],
    }))
    code, text = run(str(cfg), "list")
    assert code == 0
    assert "sales" in text
    assert "extra.orders_only" in text

    from cubes_spark.slicer import build_workspace, _load_config

    ws = build_workspace(_load_config(str(cfg)), spark)
    browser = ws.browser("extra.orders_only")
    result = browser.aggregate(aggregates=["fact_count"])
    assert result.summary["fact_count"] > 0


def test_textstats_command(config_path, tmp_path, spark):
    target = str(tmp_path / "textstats")
    code, text = run(config_path, "textstats", "documents", target,
                     "--redact")
    assert code == 0
    out = spark.read.parquet(target)
    expected = {"doc_id", "quality_score", "lang_pred",
                "dup_ngram_frac_2", "n_bpe_tokens", "n_email",
                "text_redacted"}
    assert expected <= set(out.columns)
    assert out.count() > 0


# -- reference-format slicer.ini configuration (parity:
#    /root/reference/cubes/config_parser.py read_slicer_config and
#    workspace.py:55-290; fixture shape:
#    /root/reference/tests/data/slicer.ini)


@pytest.fixture(scope="module")
def ini_config_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("slicer_ini")
    models = root / "models"
    models.mkdir()
    (models / "model.json").write_text(json.dumps(TPCH_MODEL))
    ini = root / "slicer.ini"
    ini.write_text(f"""
[workspace]
models_directory: models
timezone: UTC
first_weekday: monday

[store]
type: spark
path: {SF_DIR}

[model]
path: model.json

[server]
json_record_limit: 100
prettyprint: yes
authentication: pass_parameter
""")
    return str(ini)


def test_ini_config_list(ini_config_path, spark):
    code, text = run(ini_config_path, "list")
    assert code == 0
    assert "sales" in text


def test_ini_config_matches_json_config(ini_config_path, config_path,
                                        spark):
    from cubes_spark.slicer import build_workspace, read_slicer_config

    ws_ini = build_workspace(read_slicer_config(ini_config_path), spark)
    ws_json = build_workspace(read_slicer_config(config_path), spark)
    a = ws_ini.browser("sales").aggregate(
        drilldown=["returnflag"], aggregates=["price_sum"])
    b = ws_json.browser("sales").aggregate(
        drilldown=["returnflag"], aggregates=["price_sum"])
    assert [dict(c) for c in a.cells] == [dict(c) for c in b.cells]


def test_ini_value_interpretation(ini_config_path):
    from cubes_spark.slicer import read_slicer_config

    config = read_slicer_config(ini_config_path)
    assert config["server"]["json_record_limit"] == 100
    assert config["server"]["prettyprint"] is True
    assert config["authentication"] == {"method": "pass_parameter"}
    assert config["workspace"]["timezone"] == "UTC"
    # model path resolved relative to models_directory
    assert config["model"].endswith("models/model.json")
    assert os.path.exists(config["model"])


def test_ini_unknown_store_type(tmp_path):
    # the reference fixture's `type: sql` store cannot run on a
    # parquet engine: fail with a clear configuration error rather
    # than an obscure read failure later
    from cubes_spark.errors import ConfigurationError
    from cubes_spark.slicer import read_slicer_config

    ini = tmp_path / "bad.ini"
    ini.write_text("[store]\ntype: sql\nurl: sqlite:///\n")
    with pytest.raises(ConfigurationError, match="store type"):
        read_slicer_config(str(ini))


def test_ini_named_stores_and_locales(tmp_path):
    from cubes_spark.slicer import read_slicer_config

    trans = tmp_path / "sk.json"
    trans.write_text(json.dumps({"dimensions": {}}))
    ini = tmp_path / "multi.ini"
    ini.write_text(f"""
[store]
type: spark
path: {SF_DIR}

[store_archive]
type: parquet
path: {SF_DIR}

[locale sk]
default: {trans}
""")
    config = read_slicer_config(str(ini))
    assert config["store"] == SF_DIR
    assert config["stores"]["archive"]["path"] == SF_DIR
    assert config["translations"]["sk"]["default"] == str(trans)


def test_ini_named_store_browsable(tmp_path, spark):
    """[store_NAME] sections are functional: a cube selecting the
    named store via its `store` metadata browses that directory."""
    from cubes_spark.slicer import build_workspace, read_slicer_config

    arch = tmp_path / "arch"
    spark.createDataFrame([(1, 7), (2, 8)], "id long, v long") \
        .write.parquet(str(arch / "numbers.parquet"))
    model = tmp_path / "model.json"
    model.write_text(json.dumps({"cubes": [
        {"name": "nums", "fact": "numbers", "store": "archive",
         "measures": [{"name": "v"}],
         "aggregates": [{"name": "v_sum", "measure": "v",
                         "function": "sum"}]}]}))
    ini = tmp_path / "slicer.ini"
    ini.write_text(f"""
[store]
type: spark
path: {SF_DIR}

[store_archive]
type: spark
path: {arch}

[model]
path: {model}
""")
    ws = build_workspace(read_slicer_config(str(ini)), spark)
    assert ws.browser("nums").aggregate(
        aggregates=["v_sum"]).summary["v_sum"] == 15


def test_cli_test_store_filters(tmp_path, spark):
    """`slicer test --store/-E` include/exclude cubes by their store
    (parity: reference commands.py test options)."""
    arch = tmp_path / "arch"
    spark.createDataFrame([(1, 5)], "id long, v long") \
        .write.parquet(str(arch / "numbers.parquet"))
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "store": SF_DIR,
        "stores": {"archive": {"path": str(arch)}},
        "model": {"cubes": [
            {"name": "sales", "fact": "lineitem",
             "measures": [{"name": "l_quantity"}]},
            {"name": "nums", "fact": "numbers", "store": "archive",
             "measures": [{"name": "v"}]},
        ]},
    }))
    code, text = run(str(cfg), "test", "--store", "archive")
    assert code == 0
    assert "OK    nums" in text and "SKIP  sales" in text
    code, text = run(str(cfg), "test", "-E", "archive")
    assert code == 0
    assert "OK    sales" in text and "SKIP  nums" in text


def test_ini_authorization_without_options_still_enforced(tmp_path,
                                                          spark):
    """`[workspace] authorization = simple` with no [authorization]
    options must still create the authorizer (deny-by-default), not
    silently run wide open."""
    from cubes_spark.slicer import read_slicer_config

    ini = tmp_path / "a.ini"
    ini.write_text(f"""
[workspace]
authorization: simple

[store]
type: spark
path: {SF_DIR}
""")
    config = read_slicer_config(str(ini))
    assert config.get("authorization") == {}
    # the serve path: empty dict still builds an authorizer
    from cubes_spark.auth import SimpleAuthorizer

    auth_config = config.get("authorization")
    assert auth_config is not None
    authorizer = SimpleAuthorizer(**auth_config)
    # no rights configured: the authorizer exists and denies cubes
    assert authorizer.authorize("anybody", ["sales"]) == []


def test_dq_command(config_path, tmp_path, spark):
    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps([
        {"check": "not_null", "column": "o_orderkey"},
        {"check": "unique", "columns": ["o_orderkey"]},
        {"check": "foreign_key", "columns": ["o_custkey"],
         "ref": "customer", "ref_columns": ["c_custkey"]},
        {"name": "impossible", "check": "in_range",
         "column": "o_totalprice", "max": 1},
    ]))
    code, out = run(config_path, "dq", "orders", str(rules))
    assert code == 0                     # not strict: exit 0
    assert "PASS not_null:o_orderkey" in out
    assert "PASS foreign_key:o_custkey" in out
    assert "FAIL impossible" in out
    assert "3 passed, 1 failed" in out

    code, _out = run(config_path, "dq", "orders", str(rules),
                     "--strict")
    assert code == 1


def test_aggregate_advisor(config_path, tmp_path, spark):
    """`sql-aggregate --auto-picks`: the advisor sizes the lattice,
    greedy-picks and materializes — each pick readable parquet."""
    import os

    target = str(tmp_path / "auto")
    code, out = run(config_path, "sql-aggregate", "sales", target,
                    "--drilldown", "returnflag", "linestatus",
                    "--aggregates", "price_sum", "fact_count",
                    "--auto-picks", "1")
    assert code == 0
    assert "materialized" in out
    picks = [d for d in os.listdir(target)
             if d.startswith("cuboid_")]
    assert picks
    for d in picks:
        assert spark.read.parquet(f"{target}/{d}").count() > 0
