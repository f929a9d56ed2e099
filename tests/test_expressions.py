"""Expression-language compiler unit tests (conditionals)."""

import pytest
from pyspark.sql import functions as F

from cubes_spark.errors import ExpressionError
from cubes_spark.plans.expressions import compile_expression


def _eval(spark, expr, rows):
    df = spark.createDataFrame(rows, "x int")
    col = compile_expression(expr, {"x": F.col("x")})
    return [r[0] for r in df.select(col).orderBy("x").collect()]


def test_case_with_else(spark):
    got = _eval(spark, "case(x < 10, 1, x < 30, 2, 99)",
                [(5,), (15,), (50,)])
    assert got == [1, 2, 99]


def test_case_without_else_is_null(spark):
    got = _eval(spark, "case(x < 10, 1)", [(5,), (50,)])
    assert got == [1, None]


def test_case_first_match_wins(spark):
    got = _eval(spark, "case(x > 0, 1, x > 10, 2, 0)", [(20,)])
    assert got == [1]


def test_case_too_few_args():
    with pytest.raises(ExpressionError):
        compile_expression("case(1)", {})


def test_if_and_case_nest(spark):
    got = _eval(spark, "if(x > 10, case(x > 40, 2, 1), 0)",
                [(5,), (20,), (50,)])
    assert got == [0, 1, 2]


def test_position_function(spark):
    """position() with literal and column substrings (F.locate only
    takes a Python str — the compiler must route through SQL locate)."""
    from cubes_spark.plans.expressions import compile_expression

    df = spark.createDataFrame([("hello world", "world")],
                               "s string, sub string")
    ctx = {"s": df.s, "sub": df.sub}
    assert df.select(compile_expression(
        "position('world', s)", ctx).alias("p")).head().p == 7
    assert df.select(compile_expression(
        "position(sub, s)", ctx).alias("p")).head().p == 7
    assert df.select(compile_expression(
        "position('zzz', s)", ctx).alias("p")).head().p == 0


def test_mod_sign_follows_dividend(spark):
    """SQL MOD semantics (reference parity): sign of the dividend,
    not pmod's always-positive result."""
    from pyspark.sql import functions as F

    from cubes_spark.plans.expressions import compile_expression

    df = spark.createDataFrame([(-7, 3)], "a long, b long")
    ctx = {"a": df.a, "b": df.b}
    assert df.select(compile_expression(
        "mod(a, b)", ctx).alias("m")).head().m == -1
    assert df.select(compile_expression(
        "remainder(a, b)", ctx).alias("m")).head().m == -1


def test_normalization_skips_string_literals(spark):
    """'=' and 'if(' INSIDE string literals must stay untouched."""
    from pyspark.sql import functions as F

    from cubes_spark.plans.expressions import compile_expression

    df = spark.createDataFrame([("a=b and if(x)",)], "code string")
    ctx = {"code": df.code}
    out = df.select(
        compile_expression("replace(code, 'a=b', 'X')", ctx)
        .alias("r"),
        compile_expression("concat('if(', code)", ctx).alias("c"),
        compile_expression(
            "iif(code = 'a=b and if(x)', 'eq', 'ne')", ctx)
        .alias("m"),
    ).head()
    assert out.r == "X and if(x)"
    assert out.c == "if(a=b and if(x)"
    assert out.m == "eq"
