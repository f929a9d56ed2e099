"""The r14 unrolled-arithmetic rewrites must be BIT-identical to the
higher-order-function folds they replaced (same products, same
0.0-seeded left-associative IEEE addition order) — including on
ragged, short and null vectors, where the guarded ``_dot`` must fall
back to the fold."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from cubes_spark.llm.similarity import (
    _dot, _fold_dot, _hyperplane_bits, _norm, _plane_components,
    _probe_dim)


def _bits(x):
    if x is None:
        return None
    return struct.pack("<d", x)


@pytest.fixture(scope="module")
def vec_df(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(200):
        a = [rng.uniform(-1, 1) for _ in range(17)]
        b = [rng.uniform(-1, 1) for _ in range(17)]
        rows.append((i, a, b))
    # ragged / short / null shapes: both-short-equal (fold yields a
    # number, unrolled-at-17 would yield null — the guard must route
    # these to the fold), mismatched lengths, null vector
    rows.append((900, [1.0, 2.0], [3.0, 4.0]))
    rows.append((901, [1.0, 2.0, 3.0], [1.0, 2.0]))
    rows.append((902, None, [1.0] * 17))
    return spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>")


def test_unrolled_dot_bit_identical(vec_df):
    out = vec_df.select(
        "id",
        _fold_dot(F.col("a"), F.col("b")).alias("fold"),
        _dot("a", "b", 17).alias("unrolled"),
        _norm(F.col("a")).alias("nfold"),
        _norm("a", 17).alias("nunrolled"),
    ).collect()
    assert len(out) == 203
    for r in out:
        assert _bits(r["fold"]) == _bits(r["unrolled"]), r["id"]
        assert _bits(r["nfold"]) == _bits(r["nunrolled"]), r["id"]


def test_unrolled_dot_wrong_dim_hint_still_exact(vec_df):
    # a wrong probe (say the corpus head was unrepresentative) must
    # not change values: every row fails the size guard and takes the
    # fold path
    out = vec_df.select(
        _fold_dot(F.col("a"), F.col("b")).alias("fold"),
        _dot("a", "b", 5).alias("unrolled"),
    ).collect()
    for r in out:
        assert _bits(r["fold"]) == _bits(r["unrolled"])


def test_probe_dim(vec_df, spark):
    assert _probe_dim(vec_df, "a") == 17
    empty = spark.createDataFrame([], "a array<double>")
    assert _probe_dim(empty, "a") is None


def test_lit_double_array_bit_identical(spark):
    import random

    from cubes_spark.llm.util import lit_double_array

    rng = random.Random(13)
    vals = ([rng.uniform(-1e3, 1e3) for _ in range(500)]
            + [0.0, -0.0, 1e-300, -1e300, 123456789.123456789])
    df = spark.range(1)
    r = df.select(
        F.array(*[F.lit(float(v)) for v in vals]).alias("a"),
        lit_double_array(vals).alias("b"),
    ).first()
    assert len(r["a"]) == len(r["b"]) == len(vals)
    for x, y in zip(r["a"], r["b"]):
        assert _bits(x) == _bits(y)
    # non-finite fallback path
    r2 = df.select(lit_double_array(
        [1.0, float("inf"), float("nan")]).alias("c")).first()
    assert r2["c"][0] == 1.0 and r2["c"][1] == float("inf")


def test_hyperplane_bits_match_python_replay(spark):
    """The unrolled `_hyperplane_bits` must reproduce the fold's exact
    semantics: left-to-right double accumulation per plane, bit 2^p
    set iff the projection is > 0 (Python floats ARE IEEE doubles, so
    a sequential Python loop replays the fold bit-for-bit)."""
    import random

    rng = random.Random(11)
    vecs = [[rng.uniform(-1, 1) for _ in range(9)] for _ in range(64)]
    df = spark.createDataFrame([(v,) for v in vecs], "v array<double>")
    got = [r[0] for r in df.select(
        _hyperplane_bits(F.col("v"), 6, 9, seed=42).alias("b")
    ).collect()]
    planes = _plane_components(6, 9, 42)
    for v, g in zip(vecs, got):
        bits = 0
        for p in range(6):
            proj = 0.0
            for d in range(9):
                proj = proj + v[d] * planes[p][d]
            if proj > 0:
                bits += int(math.pow(2.0, p))
        assert bits == g
