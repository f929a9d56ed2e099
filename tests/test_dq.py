"""Declarative data-quality checks (operators/dq.py)."""

import pytest

from cubes_spark.operators.dq import dq_check


@pytest.fixture()
def frame(spark):
    rows = [
        (1, "a", 10, "x1"),
        (2, "b", -5, "x2"),          # range violation
        (2, "c", 30, "zz"),          # dup id, pattern violation
        (None, "a", 200, "x3"),      # null id, max violation
        (5, "q", None, "x4"),        # accepted_values + null range
    ]
    return spark.createDataFrame(
        rows, "id long, cat string, v long, code string")


def _by_rule(df):
    return {r.rule: r for r in df.collect()}


def test_row_level_rules_single_pass(frame):
    out = dq_check(frame, [
        {"check": "not_null", "column": "id"},
        {"check": "in_range", "column": "v", "min": 0, "max": 100},
        {"check": "accepted_values", "column": "cat",
         "values": ["a", "b", "c"]},
        {"check": "matches", "column": "code", "pattern": "^x\\d$"},
        {"name": "v_even", "check": "expression",
         "expr": "v % 2 = 0"},
    ])
    got = _by_rule(out)
    assert all(r.n_rows == 5 for r in got.values())
    assert got["not_null:id"].n_violations == 1
    # -5 below min, 200 above max, NULL counts as violation
    assert got["in_range:v"].n_violations == 3
    assert got["accepted_values:cat"].n_violations == 1      # "q"
    assert got["matches:code"].n_violations == 1             # "zz"
    # -5 is odd; NULL expression result is a violation too
    assert got["v_even"].n_violations == 2
    assert not got["in_range:v"].passed
    assert got["not_null:id"].passed is False


def test_one_sided_range(frame):
    got = _by_rule(dq_check(frame, [
        {"check": "in_range", "column": "v", "min": 0},
    ]))
    # -5 and NULL violate; 200 is fine without a max
    assert got["in_range:v"].n_violations == 2


def test_unique_counts_rows_beyond_first(frame):
    got = _by_rule(dq_check(frame, [
        {"check": "unique", "columns": ["id"]},
        {"check": "unique", "columns": ["id", "cat"]},
    ]))
    # id: two rows share id=2 -> 1 extra (NULLs group together but
    # there is only one NULL row here)
    assert got["unique:id"].n_violations == 1
    assert got["unique:id_cat"].n_violations == 0


def test_foreign_key_ignores_null_keys(spark, frame):
    ref = spark.createDataFrame([(1,), (2,)], "rid long")
    got = _by_rule(dq_check(frame, [
        {"check": "foreign_key", "columns": ["id"],
         "ref": ref, "ref_columns": ["rid"]},
    ]))
    # id=5 is an orphan; the NULL id row is excluded from FK checks
    assert got["foreign_key:id"].n_violations == 1
    assert got["foreign_key:id"].n_rows == 5


def test_all_pass_on_clean_data(spark):
    df = spark.createDataFrame(
        [(i, i * 2) for i in range(10)], "id long, v long")
    out = dq_check(df, [
        {"check": "not_null", "column": "id"},
        {"check": "unique", "columns": ["id"]},
        {"check": "in_range", "column": "v", "min": 0, "max": 100},
    ])
    assert all(r.passed for r in out.collect())


def test_unknown_check_raises(frame):
    with pytest.raises(ValueError):
        dq_check(frame, [{"check": "nope", "column": "id"}]).collect()


class TestBenfordDigits:
    def test_hand_computed(self, spark):
        from cubes_spark.operators.dq import BENFORD_PPM, benford_digits

        # cents: 100, 2345, 999, 50, 50 -> digits 1,2,9,5,5
        df = spark.createDataFrame(
            [(1.0,), (23.45,), (9.99,), (0.5,), (0.5,),
             (0.0,), (-3.0,), (None,)],
            "v double")
        out = {r["digit"]: r for r in
               benford_digits(df, "v").collect()}
        assert set(out) == {1, 2, 5, 9}
        assert out[5]["n"] == 2
        assert out[5]["obs_ppm"] == 2_000_000 // 5
        assert out[5]["exp_ppm"] == BENFORD_PPM[5]
        d = out[5]["obs_ppm"] - BENFORD_PPM[5]
        assert out[5]["dev_ppm"] == d * d // BENFORD_PPM[5]

    def test_benford_like_data_scores_low(self, spark):
        """2^k magnitudes follow Benford closely: every digit present
        and total deviation far below a uniform-digit control."""
        from cubes_spark.operators.dq import benford_digits

        pows = spark.createDataFrame(
            [(float(int(str(2 ** k)[:3])),) for k in range(1, 400)],
            "v double")
        uni = spark.createDataFrame(
            [(float(d),) for d in range(1, 10) for _ in range(44)],
            "v double")
        dev_p = sum(r["dev_ppm"] for r in
                    benford_digits(pows, "v").collect())
        dev_u = sum(r["dev_ppm"] for r in
                    benford_digits(uni, "v").collect())
        assert dev_p * 10 < dev_u
