"""Pre-aggregation rewriting: queries covered by a materialized cuboid
read the cuboid; everything else falls back to the fact star."""

import pytest

from cubes_spark.demo import tpch_workspace
from tests.conftest import SF_DIR


@pytest.fixture()
def browser(spark, tmp_path):
    ws = tpch_workspace(spark, SF_DIR)
    b = ws.browser("sales")
    b.materialize_cuboid(
        str(tmp_path / "ym_cuboid"),
        drilldown=["date@ym:month", "returnflag"],
        aggregates=["price_sum", "quantity_sum", "fact_count",
                    "price_min", "price_max"],
    )
    return b


def plan_of(df):
    return df._jdf.queryExecution().toString()


def test_exact_grain_served_from_cuboid(browser):
    df = browser.aggregation_dataframe(
        drilldown=["date@ym:month", "returnflag"],
        aggregates=["price_sum", "fact_count"],
    )
    plan = plan_of(df)
    assert "lineitem" not in plan          # fact star not scanned
    assert "returnflag__returnflag" in plan  # cuboid columns read


def test_coarser_grain_reaggregates(browser):
    fresh = tpch_workspace(
        browser.star_schema.fact_df.sparkSession, SF_DIR
    ).browser("sales")
    from_cuboid = browser.aggregate(
        drilldown=["date:year"],
        aggregates=["price_sum", "fact_count", "price_min", "price_max"],
    )
    from_fact = fresh.aggregate(
        drilldown=["date:year"],
        aggregates=["price_sum", "fact_count", "price_min", "price_max"],
    )
    assert from_cuboid.cells == from_fact.cells
    assert from_cuboid.summary == from_fact.summary


def test_cell_filter_on_cuboid(browser):
    df = browser.aggregation_dataframe(
        cell="date:1995|returnflag:A",
        drilldown=["date@ym:month"],
        aggregates=["quantity_sum"],
    )
    assert "lineitem" not in plan_of(df)
    fresh = tpch_workspace(
        browser.star_schema.fact_df.sparkSession, SF_DIR
    ).browser("sales")
    expect = fresh.aggregation_dataframe(
        cell="date:1995|returnflag:A",
        drilldown=["date@ym:month"],
        aggregates=["quantity_sum"],
    )
    assert sorted(map(str, df.collect())) == sorted(map(str, expect.collect()))


def test_uncovered_attribute_falls_back(browser):
    # linestatus is not in the cuboid grain
    df = browser.aggregation_dataframe(
        drilldown=["linestatus"], aggregates=["price_sum"],
    )
    assert "lineitem" in plan_of(df)


def test_nondistributive_falls_back_on_coarser_grain(browser):
    # count_distinct cannot be re-aggregated from a coarser cuboid
    df = browser.aggregation_dataframe(
        drilldown=["date:year"], aggregates=["part_count_distinct"],
    )
    assert "lineitem" in plan_of(df)


def test_nondistributive_ok_on_exact_grain(browser, spark, tmp_path):
    browser.materialize_cuboid(
        str(tmp_path / "flag_cuboid"),
        drilldown=["returnflag"],
        aggregates=["part_count_distinct", "fact_count"],
    )
    df = browser.aggregation_dataframe(
        drilldown=["returnflag"], aggregates=["part_count_distinct"],
    )
    assert "lineitem" not in plan_of(df)
    fresh = tpch_workspace(spark, SF_DIR).browser("sales")
    expect = fresh.aggregation_dataframe(
        drilldown=["returnflag"], aggregates=["part_count_distinct"],
    )
    assert sorted(map(str, df.collect())) == sorted(map(str, expect.collect()))


def test_summary_from_cuboid(browser):
    result = browser.aggregate(aggregates=["price_sum", "fact_count"])
    fresh = tpch_workspace(
        browser.star_schema.fact_df.sparkSession, SF_DIR
    ).browser("sales")
    expect = fresh.aggregate(aggregates=["price_sum", "fact_count"])
    assert result.summary == expect.summary
