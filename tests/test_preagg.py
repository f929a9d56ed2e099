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


class TestCuboidSizes:
    def test_sizes_match_per_cuboid_distinct(self, spark):
        from itertools import product

        from cubes_spark.operators.preagg import cuboid_sizes

        rows = [(a % 3, b % 4, (a + b) % 2)
                for a, b in product(range(6), range(8))]
        df = spark.createDataFrame(rows, "x int, y int, z int")
        got = {r.grouping_id: r.size
               for r in cuboid_sizes(df, ["x", "y", "z"]).collect()}
        # grouping_id bit i (MSB-first) = dims[i] rolled away
        dims = ["x", "y", "z"]
        for gid in range(8):
            kept = [dims[i] for i in range(3)
                    if not (gid >> (2 - i)) & 1]
            want = (df.select(*kept).distinct().count()
                    if kept else 1)
            assert got[gid] == want, gid

    def test_n_dims(self, spark):
        from cubes_spark.operators.preagg import cuboid_sizes

        df = spark.createDataFrame([(1, 2)], "a int, b int")
        got = {r.grouping_id: r.n_dims
               for r in cuboid_sizes(df, ["a", "b"]).collect()}
        assert got == {0: 2, 1: 1, 2: 1, 3: 0}


class TestGreedySelection:
    def test_hru_textbook_example(self):
        from cubes_spark.operators.preagg import (
            greedy_cuboid_selection,
        )

        # base 100; one cheap cuboid that answers half the lattice
        sizes = {0: 100, 1: 20, 2: 90, 3: 15}
        picks = greedy_cuboid_selection(sizes, 2, 2)
        # round 1: c=1 benefit (100-20)*2=160; c=2 (100-90)*2=20;
        #          c=3 (100-15)*1=85 -> pick 1
        # round 2: c=3 now costs 20 -> (20-15)=5; c=2 -> 20 -> pick 2
        assert picks == [1, 2]

    def test_stops_when_no_benefit(self):
        from cubes_spark.operators.preagg import (
            greedy_cuboid_selection,
        )

        # every cuboid as big as the base: nothing worth building
        sizes = {0: 50, 1: 50, 2: 50, 3: 50}
        assert greedy_cuboid_selection(sizes, 3, 2) == []

    def test_deterministic_tiebreak(self):
        from cubes_spark.operators.preagg import (
            greedy_cuboid_selection,
        )

        # 1 and 2 tie on benefit and size -> lowest grouping_id wins
        sizes = {0: 100, 1: 10, 2: 10, 3: 10}
        picks = greedy_cuboid_selection(sizes, 1, 2)
        assert picks == [1]


def test_greedy_pick_materializes_and_routes(spark, tmp_path):
    """End-to-end: size the lattice, greedy-pick, materialize the
    winner, and watch the browser route a covered query to it."""
    from cubes_spark.operators.preagg import (
        cuboid_sizes,
        greedy_cuboid_selection,
    )

    ws = tpch_workspace(spark, SF_DIR)
    b = ws.browser("sales")
    facts = b.star_schema.fact_df
    sizes = {r.grouping_id: r.size for r in cuboid_sizes(
        facts.selectExpr("l_returnflag", "l_linestatus"),
        ["l_returnflag", "l_linestatus"]).collect()}
    picks = greedy_cuboid_selection(sizes, 1, 2)
    assert picks, "a 6M-row base must make some cuboid worth building"
    # the flag x status cuboid (grouping_id 0 is the base itself;
    # the pick is one of the 1-dim rollups or the 2-dim base grain)
    b.materialize_cuboid(
        str(tmp_path / "greedy_cuboid"),
        drilldown=["returnflag", "linestatus"],
        aggregates=["price_sum", "fact_count"],
    )
    df = b.aggregation_dataframe(
        drilldown=["returnflag"], aggregates=["price_sum"])
    assert "lineitem" not in df._jdf.queryExecution().toString()


class TestAvgFromPartials:
    """Algebraic avg rewrite: a cuboid storing sum + count_nonempty
    partials of a decimal measure serves a coarser avg exactly
    (Cuboid.partials_for); every exclusion falls back to the star."""

    @pytest.fixture()
    def avg_browser(self, spark, tmp_path):
        ws = tpch_workspace(spark, SF_DIR)
        b = ws.browser("sales")
        b.materialize_cuboid(
            str(tmp_path / "avg_cuboid"),
            drilldown=["date@ym:month"],
            aggregates=["quantity_sum", "quantity_count", "fact_count"],
        )
        return b

    def test_avg_served_from_partials(self, avg_browser, spark):
        df = avg_browser.aggregation_dataframe(
            drilldown=["date:year"],
            aggregates=["quantity_avg", "quantity_sum", "fact_count"],
        )
        plan = plan_of(df)
        assert "lineitem" not in plan
        assert "date__year" in plan  # cuboid's safe column is scanned
        fresh = tpch_workspace(spark, SF_DIR).browser("sales")
        expect = fresh.aggregation_dataframe(
            drilldown=["date:year"],
            aggregates=["quantity_avg", "quantity_sum", "fact_count"],
        )
        got = {r["date.year"]: r["quantity_avg"] for r in df.collect()}
        want = {r["date.year"]: r["quantity_avg"]
                for r in expect.collect()}
        # BIT-identical, not approximately equal: decimal partial sums
        # merge exactly, so sum(sums)/sum(counts) is the same double
        assert got == want

    def test_avg_summary_from_partials(self, avg_browser, spark):
        result = avg_browser.aggregate(aggregates=["quantity_avg"])
        fresh = tpch_workspace(spark, SF_DIR).browser("sales")
        expect = fresh.aggregate(aggregates=["quantity_avg"])
        assert result.summary == expect.summary

    def test_avg_without_count_partial_falls_back(self, spark, tmp_path):
        ws = tpch_workspace(spark, SF_DIR)
        b = ws.browser("sales")
        b.materialize_cuboid(
            str(tmp_path / "nocount_cuboid"),
            drilldown=["date@ym:month"],
            aggregates=["quantity_sum", "fact_count"],  # no count_nonempty
        )
        df = b.aggregation_dataframe(
            drilldown=["date:year"], aggregates=["quantity_avg"],
        )
        assert "lineitem" in plan_of(df)

    def test_avg_other_measure_falls_back(self, avg_browser):
        # discount_avg's measure has no stored partials in the cuboid
        df = avg_browser.aggregation_dataframe(
            drilldown=["date:year"], aggregates=["discount_avg"],
        )
        assert "lineitem" in plan_of(df)

    def test_coalesce_measures_disables_partials(self, spark, tmp_path):
        # under coalesce_measures, avg(coalesce(m,0)) != sum/count_nonempty
        ws = tpch_workspace(spark, SF_DIR)
        b = ws.browser("sales", coalesce_measures=True)
        b.materialize_cuboid(
            str(tmp_path / "coal_cuboid"),
            drilldown=["date@ym:month"],
            aggregates=["quantity_sum", "quantity_count", "fact_count"],
        )
        df = b.aggregation_dataframe(
            drilldown=["date:year"], aggregates=["quantity_avg"],
        )
        assert "lineitem" in plan_of(df)

    def test_handbuilt_cuboid_without_dtypes_is_conservative(
            self, avg_browser):
        from cubes_spark.operators.preagg import Cuboid

        src = avg_browser._cuboids[0]
        bare = Cuboid(src.path, src.attribute_refs,
                      list(src.aggregates.values()))  # no column_dtypes
        agg = next(a for a in avg_browser.prepare_aggregates(
            ["quantity_avg"]))
        assert src.partials_for(agg) is not None
        assert bare.partials_for(agg) is None


def test_smallest_covering_cuboid_wins(spark, tmp_path):
    """With a month-grain AND a year-grain cuboid both covering a
    year-grain query, the browser must scan the smaller (year) one —
    recorded row counts order the candidates."""
    ws = tpch_workspace(spark, SF_DIR)
    b = ws.browser("sales")
    big = b.materialize_cuboid(
        str(tmp_path / "month_cuboid"),
        drilldown=["date@ym:month"],
        aggregates=["quantity_sum", "fact_count"],
    )
    small = b.materialize_cuboid(
        str(tmp_path / "year_cuboid"),
        drilldown=["date:year"],
        aggregates=["quantity_sum", "fact_count"],
    )
    assert big.rows is not None and small.rows is not None
    assert small.rows < big.rows
    df = b.aggregation_dataframe(
        drilldown=["date:year"],
        aggregates=["quantity_sum", "fact_count"],
    )
    files = "\n".join(df.inputFiles())
    assert "year_cuboid" in files
    assert "month_cuboid" not in files
    assert "lineitem" not in files
    # values still correct vs a cuboid-free browser
    fresh = tpch_workspace(spark, SF_DIR).browser("sales")
    expect = fresh.aggregation_dataframe(
        drilldown=["date:year"],
        aggregates=["quantity_sum", "fact_count"],
    )
    assert sorted(map(str, df.collect())) \
        == sorted(map(str, expect.collect()))


class TestAutoMaterialize:
    def test_picks_materialize_and_route(self, spark, tmp_path):
        from cubes_spark.operators.preagg import auto_materialize

        ws = tpch_workspace(spark, SF_DIR)
        b = ws.browser("sales")
        built = auto_materialize(
            b, str(tmp_path / "auto"),
            ["returnflag", "linestatus", "date:year"],
            aggregates=["price_sum", "quantity_sum", "fact_count"],
            n_picks=2,
        )
        assert built, "a fact-grain base must make some cuboid worth it"
        assert all(c.rows is not None for c in built)
        assert b._cuboids == built
        # a query covered by a pick routes off the fact star and
        # matches the cuboid-free browser exactly
        df = b.aggregation_dataframe(
            drilldown=["returnflag"],
            aggregates=["price_sum", "fact_count"],
        )
        assert "lineitem" not in plan_of(df)
        fresh = tpch_workspace(spark, SF_DIR).browser("sales")
        expect = fresh.aggregation_dataframe(
            drilldown=["returnflag"],
            aggregates=["price_sum", "fact_count"],
        )
        assert sorted(map(str, df.collect())) \
            == sorted(map(str, expect.collect()))

    def test_hierarchical_drilldown_rejected(self, spark, tmp_path):
        from cubes_spark.errors import ArgumentError
        from cubes_spark.operators.preagg import auto_materialize

        b = tpch_workspace(spark, SF_DIR).browser("sales")
        with pytest.raises(ArgumentError):
            auto_materialize(b, str(tmp_path / "auto2"),
                             ["date@ym:month", "returnflag"],
                             aggregates=["price_sum"])
