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
