"""Window post-calculator semantics (parity:
/root/reference/cubes/query/statutils.py roundings and windows)."""

import math
from decimal import ROUND_HALF_UP, Decimal

from cubes_spark.functions.calculators import calculate_scalar


def round_half_up(x, n):
    """Spark's F.round semantics: BigDecimal on the shortest decimal
    string, HALF_UP (Python's round is half-even — differs at ties)."""
    q = Decimal(1).scaleb(-n)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def expected_series(values, window, fn):
    out = []
    for i in range(len(values)):
        frame = values[max(0, i - window + 1): i + 1]
        out.append(fn(frame))
    return out


def test_sma_window_expansion(tpch_browser):
    r = tpch_browser.aggregate(
        cell="date:1995", drilldown=["date@ym:month"],
        aggregates=["price_sum", "price_sma"],
    )
    sums = [float(c["price_sum"]) for c in r.cells]
    smas = [float(c["price_sma"]) for c in r.cells]
    exp = expected_series(sums, 3, lambda f: round(sum(f) / len(f), 2))
    assert smas == exp


def test_wma_weights(tpch_browser):
    r = tpch_browser.aggregate(
        cell="date:1995", drilldown=["date@ym:month"],
        aggregates=["price_sum", "price_wma"],
    )
    sums = [float(c["price_sum"]) for c in r.cells]
    wmas = [float(c["price_wma"]) for c in r.cells]

    def wma(frame):
        denom = len(frame) * (len(frame) + 1) / 2
        return round(sum(v * (i + 1) for i, v in enumerate(frame)) / denom, 4)

    assert wmas == expected_series(sums, 3, wma)


def test_ewma_weights(tpch_browser):
    r = tpch_browser.aggregate(
        cell="date:1995", drilldown=["date@ym:month"],
        aggregates=["price_sum", "price_ewma"],
    )
    sums = [float(c["price_sum"]) for c in r.cells]
    ewmas = [float(c["price_ewma"]) for c in r.cells]

    def ewma(frame):
        total = sum(v * 2.0 ** i for i, v in enumerate(frame))
        return round(total / (2.0 ** len(frame) - 1.0), 4)

    assert ewmas == expected_series(sums, 3, ewma)


def test_sms_moving_sum(tpch_browser):
    r = tpch_browser.aggregate(
        cell="date:1995", drilldown=["date@ym:month"],
        aggregates=["price_sum", "price_sms"],
    )
    sums = [float(c["price_sum"]) for c in r.cells]
    smss = [float(c["price_sms"]) for c in r.cells]
    assert smss == expected_series(sums, 3, lambda f: round(sum(f), 2))


def test_smstd_smvar(tpch_browser):
    r = tpch_browser.aggregate(
        cell="date:1995", drilldown=["date@ym:month"],
        aggregates=["price_sum", "price_smstd", "price_smvar"],
    )
    sums = [float(c["price_sum"]) for c in r.cells]

    def var(frame):
        # mirror the engine: exact decimal sums, then double arithmetic
        n = len(frame)
        if n < 2:
            return 0.0
        dec = [Decimal(repr(v)) for v in frame]
        s, s2 = float(sum(dec)), float(sum(d * d for d in dec))
        return (s2 - s * s / n) / (n - 1)

    exp_var = expected_series(sums, 3, lambda f: round_half_up(var(f), 2))
    exp_std = expected_series(
        sums, 3, lambda f: round_half_up(math.sqrt(var(f)), 2)
    )
    assert [float(c["price_smvar"]) for c in r.cells] == exp_var
    assert [float(c["price_smstd"]) for c in r.cells] == exp_std


def test_summary_gets_scalar_calculator(tpch_browser):
    r = tpch_browser.aggregate(
        cell="date:1995", drilldown=["date@ym:month"],
        aggregates=["price_sum", "price_sma"],
    )
    assert r.summary["price_sma"] == round(float(r.summary["price_sum"]), 2)


def test_calculate_scalar_functions():
    assert calculate_scalar("sma", [1.0, 2.0, 3.0]) == 2.0
    assert calculate_scalar("sms", [1.0, 2.0]) == 3.0
    assert calculate_scalar("wma", [1.0, 2.0, 3.0]) == round(14 / 6, 4)
    assert calculate_scalar("smvar", [2.0, 4.0]) == 2.0
    assert calculate_scalar("smstd", [2.0, 4.0]) == round(math.sqrt(2), 2)
    assert calculate_scalar("smrsd", [2.0, 4.0]) == round(math.sqrt(2) / 3, 4)
    assert calculate_scalar("ewma", [1.0, 2.0, 3.0]) == round(17 / 7, 4)
    assert calculate_scalar("sma", []) is None


def test_wide_decimal_not_nulled(spark):
    """A decimal too wide to narrow to decimal(18,s) must fall back to
    double — NOT silently NULL values >= 10^(18-s)."""
    from types import SimpleNamespace

    from pyspark.sql import functions as F

    from cubes_spark.functions.calculators import apply_window_calculators

    df = spark.createDataFrame(
        [(1, "90000000000000000.25"), (2, "90000000000000001.75")],
        "seq int, v string",
    ).withColumn("v", F.col("v").cast("decimal(30,2)"))
    agg = SimpleNamespace(name="v_sms")
    out = apply_window_calculators(
        df, [(agg, "v", "sms", 2)], order_by=[F.col("seq")]
    ).orderBy("seq").collect()
    assert out[0]["v_sms"] is not None
    assert out[1]["v_sms"] is not None
    assert math.isclose(float(out[1]["v_sms"]), 180000000000000002.0,
                        rel_tol=1e-12)


def test_variance_overflow_poisons_not_corrupts(spark):
    """smstd on a sum-inflated decimal(30,2): frames whose values fit
    decimal(18,2) compute exactly; a frame containing a value that
    overflows the narrowing yields NULL — never a silently wrong
    number computed from a dropped value."""
    from types import SimpleNamespace

    from pyspark.sql import functions as F

    from cubes_spark.functions.calculators import apply_window_calculators

    rows = [(1, "10.00"), (2, "14.00"),                 # fits: std exact
            (3, "90000000000000000.00"), (4, "20.00")]  # overflow frames
    df = spark.createDataFrame(rows, "seq int, v string") \
        .withColumn("v", F.col("v").cast("decimal(30,2)"))
    agg = SimpleNamespace(name="v_smstd")
    out = apply_window_calculators(
        df, [(agg, "v", "smstd", 2)], order_by=[F.col("seq")]
    ).orderBy("seq").collect()
    assert float(out[1]["v_smstd"]) == round((8.0) ** 0.5, 2)
    assert out[2]["v_smstd"] is None    # frame (14, overflowed)
    assert out[3]["v_smstd"] is None    # frame (overflowed, 20)


def test_truly_wide_decimal_variance_uses_double(spark):
    """decimal(38,2) cannot be exactly squared at all — the variance
    family falls back to double instead of nulling."""
    from types import SimpleNamespace

    from pyspark.sql import functions as F

    from cubes_spark.functions.calculators import apply_window_calculators

    df = spark.createDataFrame(
        [(1, "1e20"), (2, "3e20")], "seq int, v string"
    ).withColumn("v", F.col("v").cast("decimal(38,2)"))
    agg = SimpleNamespace(name="v_smvar")
    out = apply_window_calculators(
        df, [(agg, "v", "smvar", 2)], order_by=[F.col("seq")]
    ).orderBy("seq").collect()
    assert out[1]["v_smvar"] is not None
    assert math.isclose(float(out[1]["v_smvar"]), 2e40, rel_tol=1e-10)


def test_nullable_series_deque_semantics(spark):
    """The frame is the last N NON-NULL values, reaching back past
    nulls, and rows before the first non-null get NULL — replicated
    against a literal port of the reference deque
    (/root/reference/cubes/query/statutils.py:192-205)."""
    from collections import deque
    from types import SimpleNamespace

    from pyspark.sql import functions as F

    from cubes_spark.functions.calculators import apply_window_calculators

    rows = [(1, None), (2, 10.0), (3, None), (4, 20.0), (5, None),
            (6, 40.0), (7, 80.0), (8, None), (9, None), (10, 160.0)]
    df = spark.createDataFrame(rows, "seq int, v double")
    specs = [(SimpleNamespace(name=f"v_{fn}"), "v", fn, 3)
             for fn in ("sma", "sms", "wma", "smstd", "smvar", "smrsd")]
    got = apply_window_calculators(
        df, specs, order_by=[F.col("seq")]
    ).orderBy("seq").collect()

    window = deque()
    for out, (_, v) in zip(got, rows):
        if v is not None:
            window.append(v)
        while len(window) > 3:
            window.popleft()
        if not window:
            for fn in ("sma", "sms", "wma", "smstd", "smvar", "smrsd"):
                assert out[f"v_{fn}"] is None, (out, fn)
            continue
        n = len(window)
        mean = sum(window) / n
        var = (sum((x - mean) ** 2 for x in window) / (n - 1)
               if n >= 2 else 0.0)
        wma = sum(x * (i + 1) for i, x in enumerate(window)) \
            / (n * (n + 1) / 2)
        assert float(out["v_sma"]) == round_half_up(mean, 2)
        assert float(out["v_sms"]) == sum(window)
        assert float(out["v_wma"]) == round_half_up(wma, 4)
        assert float(out["v_smvar"]) == round_half_up(var, 2)
        assert float(out["v_smstd"]) == round_half_up(math.sqrt(var), 2)
        exp_rsd = (round_half_up(math.sqrt(var) / mean, 4)
                   if mean > 0 else 0.0)
        assert float(out["v_smrsd"]) == exp_rsd


def test_zscore_calculator(spark):
    """Trailing z-score: (x - frame mean) / frame std over the last-3
    frame; NULL for constant/short frames (std 0/undefined)."""
    import math

    from cubes_spark.functions.calculators import (
        CALCULATED_AGGREGATIONS,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in
         enumerate([10, 10, 10, 16, 4, 8])],
        "i long, v double")
    w = Window.orderBy("i").rowsBetween(-2, 0)
    out = [r.z for r in df.withColumn(
        "z", CALCULATED_AGGREGATIONS["zscore"](F.col("v"), w))
        .orderBy("i").collect()]
    assert out[0] is None            # single-value frame
    assert out[1] is None and out[2] is None   # constant frames
    # frame [10,10,16]: mean 12, std sqrt(12); x=16
    assert out[3] == round((16 - 12) / math.sqrt(12), 4)
    # frame [10,16,4]: mean 10, std 6; x=4 -> -1.0
    assert out[4] == -1.0
