"""Native OLAP extensions: rollup / cube / grouping sets / crosstab /
materialization (SURVEY §2.4 designed-in upgrade)."""

import os

from pyspark.sql import functions as F

from cubes_spark.operators import olap


def base_df(spark):
    rows = [("A", "x", 1), ("A", "y", 2), ("B", "x", 3), ("B", "y", 4)]
    return spark.createDataFrame(rows, ["k1", "k2", "v"])


def test_rollup_aggregate(spark):
    out = olap.rollup_aggregate(
        base_df(spark), ["k1", "k2"], [F.sum("v").alias("v_sum")]
    ).collect()
    by_gid = {}
    for row in out:
        by_gid.setdefault(row["grouping_id"], []).append(row)
    assert len(by_gid[0]) == 4          # full grain
    assert len(by_gid[1]) == 2          # per k1
    assert len(by_gid[3]) == 1          # grand total
    assert by_gid[3][0]["v_sum"] == 10


def test_cube_aggregate(spark):
    out = olap.cube_aggregate(
        base_df(spark), ["k1", "k2"], [F.sum("v").alias("v_sum")]
    ).collect()
    gids = sorted({row["grouping_id"] for row in out})
    assert gids == [0, 1, 2, 3]
    per_k2 = [r for r in out if r["grouping_id"] == 2]
    assert {r["k2"]: r["v_sum"] for r in per_k2} == {"x": 4, "y": 6}


def test_grouping_sets(spark):
    out = olap.grouping_sets_aggregate(
        base_df(spark), [["k1"], ["k2"]], ["sum(v) AS v_sum"]
    ).collect()
    assert len(out) == 4  # 2 k1 groups + 2 k2 groups


def test_crosstab(spark):
    out = olap.crosstab(
        base_df(spark), rows=["k1"], column="k2",
        value=F.sum("v"), values=["x", "y"],
    ).orderBy("k1").collect()
    assert out[0]["x"] == 1 and out[0]["y"] == 2
    assert out[1]["x"] == 3 and out[1]["y"] == 4


def test_combined_cuboids():
    cuboids = olap.combined_cuboids(["a", "b", "c"])
    assert ("a", "b", "c") in cuboids
    assert () in cuboids
    assert len(cuboids) == 8


def test_materialize_aggregate(tpch_browser, spark, tmp_path):
    path = os.path.join(str(tmp_path), "agg")
    olap.materialize_aggregate(
        tpch_browser, path, drilldown=["date:year"],
        aggregates=["price_sum", "fact_count"],
    )
    df = spark.read.parquet(path)
    assert "date__year" in df.columns
    assert df.count() == 7


def test_denormalized_roundtrip_browsing(tpch_browser, spark, tmp_path):
    """materialize_denormalized output browses identically through a
    use_denormalization browser (DenormalizedMapper round-trip)."""
    from cubes_spark.demo import TPCH_MODEL
    from cubes_spark.sources.workspace import Workspace

    path = os.path.join(str(tmp_path), "denorm")
    olap.materialize_denormalized(tpch_browser, path)

    denorm_df = spark.read.parquet(path)
    import copy

    model = copy.deepcopy(TPCH_MODEL)
    cube_md = model["cubes"][0]
    cube_md["joins"] = []
    cube_md["mappings"] = {}
    cube_md.pop("key", None)
    ws = Workspace(spark, store={"lineitem": denorm_df})
    ws.import_model(model)
    browser = ws.browser("sales", use_denormalization=True)

    got = browser.aggregate(cell="date:1995",
                            drilldown=["customer_geo:region"],
                            aggregates=["price_sum", "fact_count"])
    want = tpch_browser.aggregate(cell="date:1995",
                                  drilldown=["customer_geo:region"],
                                  aggregates=["price_sum", "fact_count"])
    assert got.cells == want.cells
    assert got.summary == want.summary


def test_refresh_aggregate_incremental(tpch_browser, spark, tmp_path):
    """Cuboid built from the <=1995 slice + incremental 1996 delta ==
    cuboid built from the <=1996 slice in one shot."""
    from cubes_spark import operators
    from cubes_spark.operators import olap

    path = str(tmp_path / "cuboid")
    olap.materialize_aggregate(
        tpch_browser, path, drilldown=["date@ym:month"],
        aggregates=["quantity_sum", "fact_count"],
        cell="date:-1995",
    )
    olap.refresh_aggregate(
        tpch_browser, path, drilldown=["date@ym:month"],
        aggregates=["quantity_sum", "fact_count"],
        delta_cell="date:1996",
    )
    full_path = str(tmp_path / "cuboid_full")
    olap.materialize_aggregate(
        tpch_browser, full_path, drilldown=["date@ym:month"],
        aggregates=["quantity_sum", "fact_count"],
        cell="date:-1996",
    )
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    want = sorted(map(tuple, spark.read.parquet(full_path).collect()))
    assert got == want
    assert len(got) > 12


def test_refresh_aggregate_rejects_nondistributive(tpch_browser,
                                                   tmp_path):
    import pytest as _pytest

    from cubes_spark.errors import ArgumentError
    from cubes_spark.operators import olap

    path = str(tmp_path / "cuboid")
    olap.materialize_aggregate(
        tpch_browser, path, drilldown=["date@ym:month"],
        aggregates=["part_count_distinct"], cell="date:1995",
    )
    with _pytest.raises(ArgumentError, match="not distributive"):
        olap.refresh_aggregate(
            tpch_browser, path, drilldown=["date@ym:month"],
            aggregates=["part_count_distinct"], delta_cell="date:1996",
        )
