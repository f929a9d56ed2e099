"""Property fuzz for the cuboid rewriter: ANY aggregation request must
return identical rows whether or not a covering cuboid is registered —
the rewrite is an optimization, never a semantics change.  Covers the
r13 additions (algebraic avg-from-partials, smallest-cuboid pick) and
the distributive rollup path against the fact-star ground truth."""

import decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cubes_spark.demo import tpch_workspace
from tests.conftest import SF_DIR

DRILLDOWNS = ["date:year", "date@ym:month", "returnflag",
              "linestatus"]
CUTS = [None, "date:1995", "returnflag:A", "date:1995-1996",
        "!returnflag:N"]
AGGREGATES = ["quantity_sum", "quantity_avg", "quantity_count",
              "fact_count", "price_sum", "price_min", "price_max",
              "price_variance", "price_stddev",
              "part_count_distinct"]


@pytest.fixture(scope="module")
def browsers(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fuzz_cuboids")
    ws = tpch_workspace(spark, SF_DIR)
    with_cuboids = ws.browser("sales")
    # two overlapping grains: the sized smallest-first pick and the
    # coarser-grain re-aggregation both get exercised
    with_cuboids.materialize_cuboid(
        str(tmp / "ym_flag"),
        drilldown=["date@ym:month", "returnflag"],
        aggregates=["quantity_sum", "quantity_count", "fact_count",
                    "price_sum", "price_min", "price_max",
                    "price_variance", "price_stddev",
                    "part_count_distinct"],
    )
    with_cuboids.materialize_cuboid(
        str(tmp / "year_only"),
        drilldown=["date:year"],
        aggregates=["quantity_sum", "quantity_count", "fact_count",
                    "price_sum"],
    )
    plain = tpch_workspace(spark, SF_DIR).browser("sales")
    return with_cuboids, plain


def _rows(browser, dd, cut, aggs):
    df = browser.aggregation_dataframe(
        cell=cut, drilldown=list(dd), aggregates=list(aggs))
    out = []
    for r in df.collect():
        d = {}
        for k, v in r.asDict().items():
            d[k] = float(v) if isinstance(v, decimal.Decimal) else v
        out.append(d)
    return out


@given(
    dd=st.lists(st.sampled_from(DRILLDOWNS), min_size=1, max_size=2,
                unique_by=lambda ref: ref.split("@")[0].split(":")[0]),
    cut=st.sampled_from(CUTS),
    aggs=st.lists(st.sampled_from(AGGREGATES), min_size=1,
                  max_size=4, unique=True),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cuboid_rewrite_is_transparent(browsers, dd, cut, aggs):
    with_cuboids, plain = browsers
    got = _rows(with_cuboids, dd, cut, aggs)
    want = _rows(plain, dd, cut, aggs)
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert set(g) == set(w), (set(g) ^ set(w))
        for col in w:
            assert g[col] == w[col], (col, g, w)


# ---------------------------------------------------------------------------
# r14: batch-materialized AND stream-maintained cuboids registered on
# the same browser — any covered request must pick either transparently
# ---------------------------------------------------------------------------

EV_DRILLDOWNS = ["date:year", "date:month", "etype"]
EV_CUTS = [None, "date:2024", "date:2024,1", "!date:2024,2"]
EV_AGGREGATES = ["value_sum", "value_count", "value_avg", "fact_count"]


@pytest.fixture(scope="module")
def event_browsers(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from cubes_spark.sources.workspace import ParquetStore
    from cubes_spark.streaming import (maintain_aggregate,
                                       read_parquet_stream)

    tmp = tmp_path_factory.mktemp("fuzz_stream_cuboids")
    src = str(tmp / "events_src")
    ParquetStore(spark, SF_DIR).table("events").repartition(3) \
        .write.mode("overwrite").parquet(src)
    stream = read_parquet_stream(
        spark, src, max_files_per_trigger=1
    ).select(
        "event_type",
        F.year("ts").alias("year"), F.month("ts").alias("month"),
        F.col("value").cast("decimal(20,6)").alias("__vdec__"),
    )
    log = str(tmp / "log")
    aggs = {"value_sum": ("sum", "__vdec__"),
            "value_count": ("count_nonempty", "__vdec__"),
            "fact_count": ("count", None)}
    maintain_aggregate(stream, log, ["event_type", "year", "month"],
                       aggs, query_name="fuzz_stream_cuboid")
    with_cuboids = tpch_workspace(spark, SF_DIR).browser("events")
    with_cuboids.register_stream_cuboid(
        log, aggs, {"etype.etype": "event_type", "date.year": "year",
                    "date.month": "month"})
    # overlapping batch cuboid at a coarser grain: the smallest-pick
    # ordering must choose correctly between the two kinds
    with_cuboids.materialize_cuboid(
        str(tmp / "year_cuboid"), drilldown=["date:year"],
        aggregates=["value_sum", "value_count", "value_avg",
                    "fact_count"],
    )
    plain = tpch_workspace(spark, SF_DIR).browser("events")
    return with_cuboids, plain


@given(
    dd=st.lists(st.sampled_from(EV_DRILLDOWNS), min_size=1, max_size=2,
                unique_by=lambda ref: ref.split(":")[0]),
    cut=st.sampled_from(EV_CUTS),
    aggs=st.lists(st.sampled_from(EV_AGGREGATES), min_size=1,
                  max_size=3, unique=True),
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mixed_cuboids_are_transparent(event_browsers, dd, cut, aggs):
    with_cuboids, plain = event_browsers
    got = _rows(with_cuboids, dd, cut, aggs)
    want = _rows(plain, dd, cut, aggs)
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert set(g) == set(w), (set(g) ^ set(w))
        for col in w:
            assert g[col] == w[col], (col, g, w)
