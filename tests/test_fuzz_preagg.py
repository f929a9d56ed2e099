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
              "fact_count", "price_sum", "price_min", "price_max"]


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
                    "price_sum", "price_min", "price_max"],
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
