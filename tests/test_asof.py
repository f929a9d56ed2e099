"""As-of join (operators/asof.py): union+window composition vs a
brute-force per-row argmax, plus direction/tolerance/tie semantics."""

import datetime

import pytest
from pyspark.sql import functions as F

from cubes_spark.operators.asof import asof_join


def _dt(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def sides(spark):
    trades = spark.createDataFrame(
        [(1, "a", _dt(1)), (2, "a", _dt(5)), (3, "a", _dt(10)),
         (4, "b", _dt(3)), (5, "b", _dt(4)), (6, "c", _dt(2))],
        "trade_id long, sym string, ts timestamp")
    quotes = spark.createDataFrame(
        [(10, "a", _dt(0), 1.0), (11, "a", _dt(5), 2.0),
         (12, "a", _dt(7), 3.0),
         (13, "b", _dt(3, 30), 4.0),
         (14, "c", _dt(2), 5.0), (15, "c", _dt(2), 6.0)],
        "quote_id long, sym string, ts timestamp, px double")
    return trades, quotes


def test_backward_basic(sides):
    trades, quotes = sides
    out = asof_join(trades, quotes, on="ts", by="sym",
                    right_values=["px"], right_order="quote_id")
    got = {r.trade_id: r.px_right for r in out.collect()}
    assert got[1] == 1.0          # 00:01 -> quote at 00:00
    assert got[2] == 2.0          # equality matches (00:05)
    assert got[3] == 3.0          # 00:10 -> 00:07
    assert got[4] is None         # 00:03 before first b quote 00:03:30
    assert got[5] == 4.0
    assert got[6] == 6.0          # tie at 00:02 -> max quote_id wins


def test_forward_direction(sides):
    trades, quotes = sides
    out = asof_join(trades, quotes, on="ts", by="sym",
                    right_values=["px"], right_order="quote_id",
                    direction="forward")
    got = {r.trade_id: r.px_right for r in out.collect()}
    assert got[1] == 2.0          # next at-or-after 00:01 is 00:05
    assert got[2] == 2.0          # equality
    assert got[3] is None         # nothing after 00:10
    assert got[4] == 4.0
    assert got[6] == 5.0          # tie forward -> min quote_id


def test_tolerance(sides):
    trades, quotes = sides
    out = asof_join(trades, quotes, on="ts", by="sym",
                    right_values=["px"], right_order="quote_id",
                    tolerance_seconds=90.0)
    got = {r.trade_id: r.px_right for r in out.collect()}
    assert got[1] == 1.0          # 60s gap <= 90s
    assert got[3] is None         # 180s gap nulled
    assert got[2] == 2.0          # 0s gap


def test_matched_time_exposed(sides):
    trades, quotes = sides
    out = asof_join(trades, quotes, on="ts", by="sym",
                    right_values=["px"], right_order="quote_id")
    row = {r.trade_id: r for r in out.collect()}[3]
    assert row.ts_right == _dt(7)


def test_left_rows_preserved(sides):
    trades, quotes = sides
    out = asof_join(trades, quotes, on="ts", by="sym",
                    right_values=["px"])
    assert out.count() == trades.count()


def test_brute_force_parity(spark):
    """Random-ish data: union+window == per-left-row argmax."""
    import itertools

    lrows = [(i, i % 7, _dt(i % 50, (i * 13) % 60))
             for i in range(200)]
    rrows = [(i, i % 7, _dt((i * 3) % 50, (i * 29) % 60), float(i))
             for i in range(300)]
    left = spark.createDataFrame(
        lrows, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(
        rrows, "rid long, k long, ts timestamp, v double")
    out = asof_join(left, right, on="ts", by="k",
                    right_values=["v"], right_order="rid")
    got = {r.lid: r.v_right for r in out.collect()}

    by_key = {}
    for rid, k, ts, v in rrows:
        by_key.setdefault(k, []).append((ts, rid, v))
    for lid, k, ts in lrows:
        cands = [(t, rid, v) for (t, rid, v) in by_key.get(k, [])
                 if t <= ts]
        expect = max(cands)[2] if cands else None
        assert got[lid] == expect, lid


def test_single_shuffle_plan(sides):
    """The composition costs ONE hash exchange (the by-key window);
    no join node, no row multiplication."""
    trades, quotes = sides
    out = asof_join(trades, quotes, on="ts", by="sym",
                    right_values=["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    lrows=st.lists(st.tuples(st.integers(0, 3),
                             st.integers(0, 1000)),
                   min_size=1, max_size=25),
    rrows=st.lists(st.tuples(st.integers(0, 3),
                             st.integers(0, 1000),
                             st.integers(0, 100)),
                   min_size=0, max_size=25),
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_property(spark, lrows, rrows):
    """Hypothesis: union+window as-of == per-row argmax for arbitrary
    key/time layouts, including duplicate timestamps on both sides."""
    left = spark.createDataFrame(
        [(i, k, _dt(t // 60, t % 60)) for i, (k, t) in enumerate(lrows)],
        "lid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(i, k, _dt(t // 60, t % 60), float(v))
         for i, (k, t, v) in enumerate(rrows)],
        "rid long, k long, ts timestamp, v double") if rrows else \
        spark.createDataFrame([], "rid long, k long, ts timestamp, v double")
    out = asof_join(left, right, on="ts", by="k",
                    right_values=["v"], right_order="rid")
    got = {r.lid: r.v_right for r in out.collect()}
    for i, (k, t) in enumerate(lrows):
        cands = [(rt, rid, float(v))
                 for rid, (rk, rt, v) in enumerate(rrows)
                 if rk == k and rt <= t]
        expect = max(cands)[2] if cands else None
        assert got[i] == expect, (i, k, t)


def test_forward_with_tolerance(sides):
    trades, quotes = sides
    out = asof_join(trades, quotes, on="ts", by="sym",
                    right_values=["px"], right_order="quote_id",
                    direction="forward", tolerance_seconds=120.0)
    got = {r.trade_id: r.px_right for r in out.collect()}
    assert got[2] == 2.0     # exact match, gap 0
    assert got[1] is None    # next quote at 00:05 is 240s away > 120
    assert got[4] == 4.0     # 30s gap


def test_null_right_values_carried_atomically(spark):
    """A matched right row whose value column is legitimately NULL
    must deliver that NULL — not a back-fill from an OLDER right row
    (the per-column last-non-null hazard).  With two value columns,
    both must come from the SAME matched row, never mixed."""
    left = spark.createDataFrame(
        [(1, "a", _dt(10))], "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", _dt(1), 1.0, "old"),
         ("a", _dt(5), None, "new")],
        "k string, ts timestamp, px double, tag string")
    row = asof_join(left, right, on="ts", by="k",
                    right_values=["px", "tag"]).collect()[0]
    assert row.ts_right == _dt(5)
    assert row.px_right is None      # NOT 1.0 from the older row
    assert row.tag_right == "new"    # same matched row as px


def test_invalid_direction_rejected(sides):
    trades, quotes = sides
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="ts", by="sym",
                  direction="sideways")
