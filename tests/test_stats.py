"""Unit tests for cubes_spark.operators.stats — hand-computed
values, tiebreak determinism, and partition invariance."""

import datetime as dt

import pytest

from cubes_spark.operators.stats import (
    chi_square_independence,
    group_mode,
    interarrival_stats,
    ks_two_sample,
    rolling_median,
    spearman_rho,
    winsorized_stats,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestKS:
    def test_hand_computed(self, spark):
        # A = {1,2,3}, B = {2,3,4}: D = 1/3 attained first at v=1
        rows = [("a", 0.01), ("a", 0.02), ("a", 0.03),
                ("b", 0.02), ("b", 0.03), ("b", 0.04)]
        df = _df(spark, rows, "g string, v double")
        out = ks_two_sample(df, "g", "v", "a", "b").collect()
        assert len(out) == 1
        r = out[0]
        assert (r["n_a"], r["n_b"]) == (3, 3)
        assert r["d_ppm"] == (1000000 * 3) // 9
        assert r["at_value_cents"] == 1

    def test_identical_samples_zero(self, spark):
        rows = [(g, float(v)) for g in ("a", "b") for v in range(10)]
        df = _df(spark, rows, "g string, v double")
        r = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
        assert r["d_ppm"] == 0

    def test_disjoint_samples_one(self, spark):
        rows = [("a", float(v)) for v in range(5)]
        rows += [("b", float(v + 100)) for v in range(5)]
        df = _df(spark, rows, "g string, v double")
        r = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
        assert r["d_ppm"] == 1000000

    def test_empty_side(self, spark):
        df = _df(spark, [("a", 1.0)], "g string, v double")
        assert ks_two_sample(df, "g", "v", "a", "b").count() == 0

    def test_partition_invariant(self, spark):
        rows = [("a" if i % 3 else "b", float((i * 7) % 13))
                for i in range(200)]
        df = _df(spark, rows, "g string, v double")
        a = ks_two_sample(df.repartition(1), "g", "v", "a", "b").collect()
        b = ks_two_sample(df.repartition(17), "g", "v", "a", "b").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestSpearman:
    def test_perfect_monotone(self, spark):
        rows = [("g", float(i), float(i * i)) for i in range(1, 9)]
        df = _df(spark, rows, "g string, x double, y double")
        r = spearman_rho(df, ["g"], "x", "y").collect()[0]
        assert r["signed_rho2_ppm"] == 1000000

    def test_perfect_inverse(self, spark):
        rows = [("g", float(i), float(100 - i)) for i in range(1, 9)]
        df = _df(spark, rows, "g string, x double, y double")
        r = spearman_rho(df, ["g"], "x", "y").collect()[0]
        assert r["signed_rho2_ppm"] == -1000000

    def test_hand_computed_with_ties(self, spark):
        # x: 1,1,2 -> avg ranks 1.5,1.5,3 ; y: 5,7,7 -> 1,2.5,2.5
        # centered doubled: x: -1,-1,+2 ; y: -2,+1,+1
        # num = 2+(-1)+2 = 3 ; dx = 1+1+4 = 6 ; dy = 4+1+1 = 6
        # staged: (1e6*3)//6 = 500000 ; (500000*3)//6 = 250000
        rows = [("g", 0.01, 0.05), ("g", 0.01, 0.07), ("g", 0.02, 0.07)]
        df = _df(spark, rows, "g string, x double, y double")
        r = spearman_rho(df, ["g"], "x", "y").collect()[0]
        assert r["n_rows"] == 3
        assert r["signed_rho2_ppm"] == 250000

    def test_constant_axis_dropped(self, spark):
        rows = [("g", 1.0, float(i)) for i in range(5)]
        df = _df(spark, rows, "g string, x double, y double")
        assert spearman_rho(df, ["g"], "x", "y").count() == 0

    def test_partition_invariant(self, spark):
        rows = [("g", float((i * 31) % 17), float((i * 13) % 11))
                for i in range(120)]
        df = _df(spark, rows, "g string, x double, y double")
        a = spearman_rho(df.repartition(1), ["g"], "x", "y").collect()
        b = spearman_rho(df.repartition(13), ["g"], "x", "y").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_null_group_kept(self, spark):
        # GROUP BY keeps a NULL group; the rank attach-back joins
        # must be null-safe or the NULL group silently vanishes.
        rows = ([("g", float(i), float(i)) for i in range(1, 5)]
                + [(None, float(i), float(5 - i))
                   for i in range(1, 5)])
        df = _df(spark, rows, "g string, x double, y double")
        out = {r["g"]: r for r in
               spearman_rho(df, ["g"], "x", "y").collect()}
        assert set(out) == {"g", None}
        assert out["g"]["signed_rho2_ppm"] == 1000000
        assert out[None]["signed_rho2_ppm"] == -1000000

    def test_null_group_kept_winsorize(self, spark):
        from cubes_spark.operators.stats import winsorized_stats
        rows = ([("g", float(i)) for i in range(1, 11)]
                + [(None, float(i)) for i in range(1, 11)])
        df = _df(spark, rows, "g string, v double")
        out = winsorized_stats(df, ["g"], "v").collect()
        assert {r["g"] for r in out} == {"g", None}
        assert all(r["n_rows"] == 10 for r in out)


class TestChiSquare:
    def test_hand_2x2(self, spark):
        # O = [[10, 20], [30, 40]]: N=100, R=(30,70), C=(40,60)
        rows = ([("r1", "c1")] * 10 + [("r1", "c2")] * 20
                + [("r2", "c1")] * 30 + [("r2", "c2")] * 40)
        df = _df(spark, rows, "r string, c string")
        out = {(x["r"], x["c"]): x for x in
               chi_square_independence(df, "r", "c").collect()}
        assert len(out) == 4
        cell = out[("r1", "c1")]
        assert cell["observed"] == 10
        # E = 30*40/100 = 12 -> 12e6 ppm
        assert cell["expected_ppm"] == 12000000
        # dev = 10*100 - 30*40 = -200; contrib = 200^2*1e6 //
        #   (30*40*100) = 4e10 // 120000 = 333333
        assert cell["contrib_ppm"] == (200 * 200 * 1000000) // 120000

    def test_structural_zero_included(self, spark):
        rows = [("r1", "c1"), ("r1", "c2"), ("r2", "c1")]
        df = _df(spark, rows, "r string, c string")
        out = {(x["r"], x["c"]): x for x in
               chi_square_independence(df, "r", "c").collect()}
        assert ("r2", "c2") in out
        assert out[("r2", "c2")]["observed"] == 0
        # R=1, C=1, N=3: contrib = (0*3 - 1)^2 * 1e6 // 3 = 333333
        assert out[("r2", "c2")]["contrib_ppm"] == 333333


class TestRollingMedian:
    def test_hand_window3(self, spark):
        t0 = dt.datetime(2020, 1, 1)
        vals = [0.10, 0.05, 0.07, 0.01, 0.09]
        rows = [(1, t0 + dt.timedelta(minutes=i), v, i)
                for i, v in enumerate(vals)]
        df = _df(spark, rows,
                 "k long, ts timestamp, v double, eid long")
        out = [r["rolling_median_cents"] for r in
               rolling_median(df, "k", "ts", "v", 3,
                              order_cols=["ts", "eid"])
               .orderBy("ts").collect()]
        # frames: [10],[5,10],[5,7,10],[1,5,7],[1,7,9]
        assert out == [10, 5, 7, 5, 7]

    def test_keys_independent(self, spark):
        t0 = dt.datetime(2020, 1, 1)
        rows = [(k, t0 + dt.timedelta(minutes=i), float(k * 10 + i), i)
                for k in (1, 2) for i in range(4)]
        df = _df(spark, rows,
                 "k long, ts timestamp, v double, eid long")
        first = (rolling_median(df, "k", "ts", "v", 7,
                                order_cols=["ts", "eid"])
                 .filter("value_cents = rolling_median_cents").count())
        # first row of each key is its own median frame of size 1
        assert first >= 2


class TestWinsorize:
    def test_hand_computed(self, spark):
        # 10 values 1..9 plus outlier 1000 (cents: 100..900, 100000)
        rows = [("g", float(i)) for i in range(1, 10)] + [("g", 1000.0)]
        df = _df(spark, rows, "g string, v double")
        r = winsorized_stats(df, ["g"], "v",
                             lo_ppm=100000, hi_ppm=900000).collect()[0]
        # n=10: lo rank ceil(0.1*10)=1 -> 100; hi rank ceil(9)=9 -> 900
        assert r["n_rows"] == 10
        assert r["lo_cents"] == 100
        assert r["hi_cents"] == 900
        assert r["n_clamped_lo"] == 0
        assert r["n_clamped_hi"] == 1
        assert r["winsorized_sum_cents"] == sum(
            i * 100 for i in range(1, 10)) + 900

    def test_no_clamp_when_full_range(self, spark):
        rows = [("g", float(i)) for i in range(1, 6)]
        df = _df(spark, rows, "g string, v double")
        r = winsorized_stats(df, ["g"], "v",
                             lo_ppm=1, hi_ppm=999999).collect()[0]
        assert r["n_clamped_lo"] == 0 and r["n_clamped_hi"] == 0
        assert r["winsorized_sum_cents"] == 1500


class TestInterarrival:
    def test_hand_computed(self, spark):
        t0 = dt.datetime(2020, 1, 1)
        rows = [(1, t0), (1, t0 + dt.timedelta(seconds=10)),
                (1, t0 + dt.timedelta(seconds=40)),
                (2, t0)]
        df = _df(spark, rows, "k long, ts timestamp")
        out = {r["k"]: r for r in
               interarrival_stats(df, "k", "ts").collect()}
        assert set(out) == {1}   # single-event key dropped
        r = out[1]
        assert r["n_gaps"] == 2
        assert r["min_gap_us"] == 10_000_000
        assert r["max_gap_us"] == 30_000_000
        assert r["avg_gap_us"] == 20_000_000


class TestGroupMode:
    def test_tiebreak_smallest(self, spark):
        rows = [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"),
                ("g", "c")]
        df = _df(spark, rows, "g string, v string")
        r = group_mode(df, ["g"], "v").collect()[0]
        assert r["mode_value"] == "a"
        assert r["mode_count"] == 2

    def test_nulls_ignored(self, spark):
        rows = [("g", None), ("g", None), ("g", "x")]
        df = _df(spark, rows, "g string, v string")
        r = group_mode(df, ["g"], "v").collect()[0]
        assert r["mode_value"] == "x"
        assert r["mode_count"] == 1


class TestEMD:
    def test_hand_computed(self, spark):
        from cubes_spark.operators.stats import emd_two_sample
        # A = {1,2}, B = {3,4} cents (0.01..0.04): W1 = 2 cents
        rows = [("a", 0.01), ("a", 0.02), ("b", 0.03), ("b", 0.04)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = emd_two_sample(df, "g", "v", "a", "b").collect()[0]
        assert (r["n_a"], r["n_b"]) == (2, 2)
        assert r["emd_millicents"] == 2000

    def test_identical_zero(self, spark):
        from cubes_spark.operators.stats import emd_two_sample
        rows = [(g, float(v)) for g in ("a", "b") for v in range(8)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = emd_two_sample(df, "g", "v", "a", "b").collect()[0]
        assert r["emd_millicents"] == 0

    def test_constant_shift(self, spark):
        from cubes_spark.operators.stats import emd_two_sample
        # B = A + 0.50: W1 = 50 cents regardless of shape
        vals = [1.0, 2.0, 7.0, 11.0]
        rows = [("a", v) for v in vals] + [("b", v + 0.5) for v in vals]
        df = spark.createDataFrame(rows, "g string, v double")
        r = emd_two_sample(df, "g", "v", "a", "b").collect()[0]
        assert r["emd_millicents"] == 50000

    def test_partition_invariant(self, spark):
        from cubes_spark.operators.stats import emd_two_sample
        rows = [("a" if i % 3 else "b", float((i * 7) % 13))
                for i in range(150)]
        df = spark.createDataFrame(rows, "g string, v double")
        a = emd_two_sample(df.repartition(1), "g", "v", "a", "b",
                           num_buckets=4).collect()
        b = emd_two_sample(df.repartition(13), "g", "v", "a", "b",
                           num_buckets=64).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestInvertedIndex:
    def test_hand_computed(self, spark):
        from cubes_spark.llm.text import inverted_index
        rows = [(1, "apple banana apple"), (2, "apple cherry"),
                (3, "banana banana")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["term"]: r for r in
               inverted_index(df, "text", "doc_id", min_df=1,
                              postings_k=10).collect()}
        assert out["apple"]["df"] == 2
        assert out["apple"]["cf"] == 3
        # tf desc then doc asc: doc1 tf2, doc2 tf1
        assert out["apple"]["postings"] == "1:2,2:1"
        assert out["banana"]["postings"] == "3:2,1:1"

    def test_min_df_prunes(self, spark):
        from cubes_spark.llm.text import inverted_index
        rows = [(1, "common rare"), (2, "common"), (3, "common")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        terms = {r["term"] for r in
                 inverted_index(df, "text", "doc_id", min_df=2,
                                postings_k=5).collect()}
        assert terms == {"common"}

    def test_postings_k_caps(self, spark):
        from cubes_spark.llm.text import inverted_index
        rows = [(i, "tok") for i in range(9)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        r = inverted_index(df, "text", "doc_id", min_df=1,
                           postings_k=3).collect()[0]
        assert r["df"] == 9
        assert r["postings"] == "0:1,1:1,2:1"


class TestMaxDrawdown:
    def test_hand_computed(self, spark):
        from cubes_spark.operators.stats import max_drawdown
        t0 = dt.datetime(2020, 1, 1)
        vals = [1.0, 2.0, -3.0, 1.0, -2.0]  # cum: 100,300,0,100,-100
        rows = [(1, t0 + dt.timedelta(minutes=i), v, i)
                for i, v in enumerate(vals)]
        df = _df(spark, rows,
                 "k long, ts timestamp, v double, eid long")
        r = max_drawdown(df, "k", "ts", "v", "eid").collect()[0]
        assert r["max_cum_cents"] == 300
        assert r["max_drawdown_cents"] == 400
        assert r["peak_cents"] == 300
        assert r["trough_cents"] == -100

    def test_monotone_zero_drawdown(self, spark):
        from cubes_spark.operators.stats import max_drawdown
        t0 = dt.datetime(2020, 1, 1)
        rows = [(1, t0 + dt.timedelta(minutes=i), 1.0, i)
                for i in range(5)]
        df = _df(spark, rows,
                 "k long, ts timestamp, v double, eid long")
        r = max_drawdown(df, "k", "ts", "v", "eid").collect()[0]
        assert r["max_drawdown_cents"] == 0


class TestKaplanMeier:
    def test_hand_computed(self, spark):
        from cubes_spark.operators.stats import kaplan_meier
        rows = [(1, 1), (2, 0), (3, 1), (3, 1), (5, 0)]
        df = _df(spark, rows, "dur long, ev int")
        out = {r["t"]: r for r in kaplan_meier(df, "dur", "ev")
               .collect()}
        # N=5: t1 d1 n5 -> 800000; t2 censor only -> 800000;
        # t3 d2 n3 -> (800000*1)//3 = 266666; t5 censor -> 266666
        assert out[1]["survival_ppm"] == 800000
        assert out[1]["n_at_risk"] == 5
        assert out[2]["survival_ppm"] == 800000
        assert out[3]["survival_ppm"] == 266666
        assert out[3]["n_at_risk"] == 3
        assert out[5]["survival_ppm"] == 266666
        assert out[5]["n_at_risk"] == 1

    def test_no_censoring_matches_edf(self, spark):
        from cubes_spark.operators.stats import kaplan_meier
        # all deaths: S(t_k) = remaining/N exactly (truncation-free
        # when divisions are exact at each step here)
        rows = [(t, 1) for t in (1, 2, 3, 4)]
        df = _df(spark, rows, "dur long, ev int")
        out = {r["t"]: r["survival_ppm"] for r in
               kaplan_meier(df, "dur", "ev").collect()}
        assert out == {1: 750000, 2: 500000, 3: 250000, 4: 0}

    def test_partition_invariant(self, spark):
        from cubes_spark.operators.stats import kaplan_meier
        rows = [((i * 7) % 13, i % 2) for i in range(200)]
        df = _df(spark, rows, "dur long, ev int")
        a = kaplan_meier(df.repartition(1), "dur", "ev").collect()
        b = kaplan_meier(df.repartition(19), "dur", "ev").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestTextRank:
    def test_hub_ranks_above_periphery(self, spark):
        from cubes_spark.llm.text import textrank_keywords
        rows = [(1, "alpha beta alpha beta alpha beta gamma delta"),
                (2, "gamma delta epsilon zeta")]
        df = _df(spark, rows, "doc_id long, text string")
        out = textrank_keywords(df, "text", "doc_id", top_k=3).collect()
        assert len(out) == 3
        ranks = {r["token"]: r["rank_units"] for r in
                 textrank_keywords(df, "text", "doc_id",
                                   top_k=10).collect()}
        # zeta is a leaf on the periphery: strictly below the
        # alpha/beta hub pair
        assert ranks["zeta"] < ranks["alpha"]
        assert ranks["zeta"] < ranks["beta"]

    def test_short_and_nonalpha_filtered(self, spark):
        from cubes_spark.llm.text import textrank_keywords
        rows = [(1, "ab cd alpha beta 123 x7y alpha beta")]
        df = _df(spark, rows, "doc_id long, text string")
        toks = {r["token"] for r in
                textrank_keywords(df, "text", "doc_id").collect()}
        assert toks == {"alpha", "beta"}

    def test_deterministic_across_partitions(self, spark):
        from cubes_spark.llm.text import textrank_keywords
        rows = [(i, "w%d w%d common core common" % (i % 5, i % 7))
                for i in range(40)]
        # tokens like w3 are filtered (digit); use letter words
        rows = [(i, ("alpha beta gamma " * (1 + i % 3)) + "delta")
                for i in range(40)]
        df = _df(spark, rows, "doc_id long, text string")
        a = textrank_keywords(df.repartition(1), "text",
                              "doc_id").collect()
        b = textrank_keywords(df.repartition(11), "text",
                              "doc_id").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestMannWhitney:
    def test_stochastic_equality(self, spark):
        from cubes_spark.operators.stats import mann_whitney_u
        rows = [(g, float(v)) for g in ("a", "b") for v in range(10)]
        df = _df(spark, rows, "g string, v double")
        r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
        assert r["auc_ppm"] == 500000

    def test_complete_separation(self, spark):
        from cubes_spark.operators.stats import mann_whitney_u
        rows = [("a", float(v + 100)) for v in range(5)]
        rows += [("b", float(v)) for v in range(5)]
        df = _df(spark, rows, "g string, v double")
        r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
        assert r["auc_ppm"] == 1000000
        assert r["u_doubled"] == 2 * 25

    def test_hand_with_ties(self, spark):
        from cubes_spark.operators.stats import mann_whitney_u
        # A = {1, 2}, B = {2, 3}: U1 = 1*P(a>b)... pairs:
        # (1,2)=0 (1,3)=0 (2,2)=0.5 (2,3)=0 -> U1 = 0.5, AUC = 1/8
        rows = [("a", 0.01), ("a", 0.02), ("b", 0.02), ("b", 0.03)]
        df = _df(spark, rows, "g string, v double")
        r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
        assert r["u_doubled"] == 1
        assert r["auc_ppm"] == 125000


class TestCohenKappa:
    def test_perfect_agreement(self, spark):
        from cubes_spark.operators.stats import cohen_kappa
        rows = [("x", "x")] * 5 + [("y", "y")] * 5
        df = _df(spark, rows, "a string, b string")
        r = cohen_kappa(df, "a", "b").collect()[0]
        assert r["kappa_ppm"] == 1000000

    def test_hand_computed(self, spark):
        from cubes_spark.operators.stats import cohen_kappa
        # classic 2x2: A=(20 agree yes)+(15 agree no), margins
        # yes: a 25, b 30; no: a 25, b 20; N=50
        rows = ([("y", "y")] * 20 + [("n", "n")] * 15
                + [("y", "n")] * 5 + [("n", "y")] * 10)
        df = _df(spark, rows, "a string, b string")
        r = cohen_kappa(df, "a", "b").collect()[0]
        # A=35, N=50, pe_sum = 25*30 + 25*20 = 1250
        # num = 35*50 - 1250 = 500 ; den = 2500 - 1250 = 1250
        assert r["kappa_ppm"] == (1000000 * 500) // 1250

    def test_negative_kappa(self, spark):
        from cubes_spark.operators.stats import cohen_kappa
        rows = [("x", "y")] * 5 + [("y", "x")] * 5
        df = _df(spark, rows, "a string, b string")
        r = cohen_kappa(df, "a", "b").collect()[0]
        assert r["kappa_ppm"] < 0


class TestClassifierEval:
    def test_hand_computed(self, spark):
        from cubes_spark.operators.stats import classifier_eval
        rows = ([("a", "a")] * 3 + [("a", "b")] * 1
                + [("b", "b")] * 2 + [("b", "c")] * 2)
        df = _df(spark, rows, "t string, p string")
        out = {r["label"]: r for r in
               classifier_eval(df, "t", "p").collect()}
        # class a: tp=3, n_true=4, n_pred=3
        assert out["a"]["precision_ppm"] == 1000000
        assert out["a"]["recall_ppm"] == 750000
        assert out["a"]["f1_ppm"] == (2000000 * 3) // 7
        # class c: never true, predicted twice
        assert out["c"]["n_true"] == 0
        assert out["c"]["precision_ppm"] == 0
        assert out["c"]["f1_ppm"] == 0

    def test_missing_class_appears(self, spark):
        from cubes_spark.operators.stats import classifier_eval
        rows = [("a", "a"), ("b", "a")]
        df = _df(spark, rows, "t string, p string")
        out = {r["label"]: r for r in
               classifier_eval(df, "t", "p").collect()}
        assert out["b"]["n_pred"] == 0 and out["b"]["recall_ppm"] == 0


class TestPeakConcurrency:
    def test_hand_computed(self, spark):
        from cubes_spark.operators.asof import peak_concurrency
        t0 = dt.datetime(2020, 1, 1)
        # intervals of 10s at 0,5,8,30: overlap {0,5,8} -> peak 3 at 8s
        rows = [(t0 + dt.timedelta(seconds=s),)
                for s in (0, 5, 8, 30)]
        df = _df(spark, rows, "ts timestamp")
        r = peak_concurrency(df, "ts", duration_seconds=10).collect()[0]
        assert r["n_intervals"] == 4
        assert r["peak"] == 3
        assert r["at_us"] == int(t0.replace(
            tzinfo=dt.timezone.utc).timestamp() * 1_000_000
        ) + 8_000_000

    def test_back_to_back_no_double_count(self, spark):
        from cubes_spark.operators.asof import peak_concurrency
        t0 = dt.datetime(2020, 1, 1)
        # [0,10) and [10,20): never concurrent
        rows = [(t0,), (t0 + dt.timedelta(seconds=10),)]
        df = _df(spark, rows, "ts timestamp")
        r = peak_concurrency(df, "ts", duration_seconds=10).collect()[0]
        assert r["peak"] == 1
        # The coinciding start/end nets to delta 0 on the timeline,
        # but both intervals must still be counted.
        assert r["n_intervals"] == 2

    def test_partition_invariant(self, spark):
        from cubes_spark.operators.asof import peak_concurrency
        t0 = dt.datetime(2020, 1, 1)
        rows = [(t0 + dt.timedelta(seconds=(i * 37) % 300),)
                for i in range(200)]
        df = _df(spark, rows, "ts timestamp")
        a = peak_concurrency(df.repartition(1), "ts", 60,
                             num_buckets=4).collect()
        b = peak_concurrency(df.repartition(17), "ts", 60,
                             num_buckets=64).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestSkyline:
    def test_hand_computed(self, spark):
        from cubes_spark.operators.olap import skyline_2d
        # (1,5) dominated by (2,5); frontier: (2,5), (3,3), (4,1)
        rows = [(1.0, 5.0), (2.0, 5.0), (3.0, 3.0), (4.0, 1.0),
                (2.0, 2.0), (3.0, 3.0)]
        df = _df(spark, rows, "x double, y double")
        out = {(r["x_cents"], r["y_cents"]): r["n_points"] for r in
               skyline_2d(df, "x", "y").collect()}
        assert out == {(200, 500): 1, (300, 300): 2, (400, 100): 1}

    def test_single_point(self, spark):
        from cubes_spark.operators.olap import skyline_2d
        df = _df(spark, [(7.0, 9.0)], "x double, y double")
        out = skyline_2d(df, "x", "y").collect()
        assert [(r["x_cents"], r["y_cents"], r["n_points"])
                for r in out] == [(700, 900, 1)]

    def test_partition_and_bucket_invariant(self, spark):
        from cubes_spark.operators.olap import skyline_2d
        rows = [(float((i * 31) % 57), float((i * 13) % 41))
                for i in range(300)]
        df = _df(spark, rows, "x double, y double")
        a = skyline_2d(df.repartition(1), "x", "y",
                       num_buckets=3).collect()
        b = skyline_2d(df.repartition(23), "x", "y",
                       num_buckets=128).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_frontier_is_antichain(self, spark):
        from cubes_spark.operators.olap import skyline_2d
        rows = [(float(i % 17), float((i * 7) % 23))
                for i in range(200)]
        df = _df(spark, rows, "x double, y double")
        pts = [(r["x_cents"], r["y_cents"]) for r in
               skyline_2d(df, "x", "y").collect()]
        for (x1, y1) in pts:
            for (x2, y2) in pts:
                if (x1, y1) != (x2, y2):
                    assert not (x2 >= x1 and y2 >= y1
                                and (x2 > x1 or y2 > y1))


class TestVocabGrowth:
    def test_hand_computed(self, spark):
        from cubes_spark.llm.text import vocab_growth
        rows = [(1, "a b a", "s1"), (2, "c", "s1"), (3, "x y", "s2")]
        df = _df(spark, rows, "doc_id long, text string, source string")
        out = {r["stratum"]: r for r in
               vocab_growth(df, "text", "source").collect()}
        s1 = out["s1"]
        assert (s1["n_tokens"], s1["n_types"], s1["n_hapax"]) == (4, 3, 2)
        assert s1["ttr_ppm"] == (1000000 * 3) // 4
        assert s1["hapax_ppm"] == (1000000 * 2) // 3


class TestSourceConcentration:
    def test_monopoly_and_uniform(self, spark):
        from cubes_spark.llm.text import source_concentration
        rows = [("en", "only")] * 7
        rows += [("de", f"s{i}") for i in range(4)]
        df = _df(spark, rows, "lang string, source string")
        out = {r["lang"]: r for r in
               source_concentration(df, "lang", "source").collect()}
        assert out["en"]["hhi_ppm"] == 1000000
        assert out["de"]["hhi_ppm"] == 250000


class TestRunsTest:
    def test_alternating_max_runs(self, spark):
        from cubes_spark.operators.stats import runs_test
        t0 = dt.datetime(2020, 1, 1)
        vals = [1.0, 9.0, 1.0, 9.0, 1.0, 9.0]
        rows = [(1, t0 + dt.timedelta(minutes=i), v, i)
                for i, v in enumerate(vals)]
        df = _df(spark, rows,
                 "k long, ts timestamp, v double, eid long")
        # median (disc, rank (6+1) div 2 = 3rd of sorted) = 1 ->
        # ties at median dropped: remaining 9,9,9 all above -> the
        # both-sides guard drops the key entirely
        assert runs_test(df, "k", "ts", "v", "eid").count() == 0

    def test_hand_computed(self, spark):
        from cubes_spark.operators.stats import runs_test
        t0 = dt.datetime(2020, 1, 1)
        # values 1,2,3,4 -> median(disc)=2 (rank (4+1)div2=2), drop
        # the 2; signs for 1,3,4 = 0,1,1 -> runs 2, a=2 b=1 n=3
        vals = [1.0, 2.0, 3.0, 4.0]
        rows = [(1, t0 + dt.timedelta(minutes=i), v, i)
                for i, v in enumerate(vals)]
        df = _df(spark, rows,
                 "k long, ts timestamp, v double, eid long")
        r = runs_test(df, "k", "ts", "v", "eid").collect()[0]
        assert (r["n_signs"], r["n_above"], r["n_below"]) == (3, 2, 1)
        assert r["n_runs"] == 2
        assert r["expected_runs_ppm"] == (2000000 * 2 * 1) // 3 + 1000000

    def test_one_sided_key_dropped(self, spark):
        from cubes_spark.operators.stats import runs_test
        t0 = dt.datetime(2020, 1, 1)
        rows = [(1, t0 + dt.timedelta(minutes=i), 5.0, i)
                for i in range(4)]
        df = _df(spark, rows,
                 "k long, ts timestamp, v double, eid long")
        assert runs_test(df, "k", "ts", "v", "eid").count() == 0


class TestChiSquareGOF:
    def test_uniform_zero_contrib(self, spark):
        from cubes_spark.operators.stats import chi_square_gof_uniform
        rows = [(i % 5,) for i in range(100)]
        df = _df(spark, rows, "c long")
        out = chi_square_gof_uniform(df, "c", 5).collect()
        assert len(out) == 5
        assert all(r["contrib_ppm"] == 0 for r in out)
        assert all(r["expected_ppm"] == 20 * 1000000 for r in out)

    def test_absent_category_contributes(self, spark):
        from cubes_spark.operators.stats import chi_square_gof_uniform
        rows = [(0,)] * 6
        df = _df(spark, rows, "c long")
        out = {r["cat"]: r for r in
               chi_square_gof_uniform(df, "c", 3).collect()}
        # N=6, k=3: cat0 dev=3*6-6=12 -> 144e6 // 18 = 8e6
        assert out[0]["contrib_ppm"] == (12 * 12 * 1000000) // 18
        # absent cats: dev=-6 -> 36e6 // 18 = 2e6
        assert out[1]["observed"] == 0
        assert out[1]["contrib_ppm"] == (6 * 6 * 1000000) // 18


class TestLogRank:
    def test_identical_groups_o_matches_e(self, spark):
        from cubes_spark.operators.stats import logrank_test
        rows = [(t, 1, g) for t in (1, 2, 3) for g in ("a", "b")]
        df = _df(spark, rows, "dur long, ev int, g string")
        r = logrank_test(df, "dur", "ev", "g", "a").collect()[0]
        assert (r["n_a"], r["n_b"]) == (3, 3)
        assert r["o_a"] == 3
        # symmetric groups: E = O exactly (n1/n = 1/2 at each time,
        # d_t = 2 -> e_t = 1e6 per time)
        assert r["e_a_micro"] == 3 * 1000000

    def test_hand_computed_imbalance(self, spark):
        from cubes_spark.operators.stats import logrank_test
        # t=1: a dies (d=1, n=3, n1=2) ; t=2: b dies (d=1, n=2, n1=1)
        rows = [(1, 1, "a"), (2, 1, "b"), (2, 0, "a")]
        df = _df(spark, rows, "dur long, ev int, g string")
        r = logrank_test(df, "dur", "ev", "g", "a").collect()[0]
        assert r["o_a"] == 1
        # e = 1e6*2//3 + 1e6*1//2 = 666666 + 500000
        assert r["e_a_micro"] == 666666 + 500000
        # v at t1: 1e6*1*2*1*2 // (3*3*2) = 222222; t2: n=2,d=1:
        # 1e6*1*1*1*1 // (2*2*1) = 250000
        assert r["v_micro"] == 222222 + 250000


class TestTheilSen:
    def test_perfect_line(self, spark):
        from cubes_spark.operators.stats import theil_sen_slope
        t0 = dt.datetime(2020, 1, 1)
        # +25 cents/day on day buckets: every pair slope identical
        rows = [("g", t0 + dt.timedelta(days=i), 1.0 + 0.25 * i)
                for i in range(8)]
        df = _df(spark, rows, "g string, ts timestamp, v double")
        r = theil_sen_slope(df, ["g"], "ts", "v",
                            bucket="day").collect()[0]
        assert r["n_pairs"] == 8 * 7 // 2
        assert r["median_slope_upd"] == 25_000_000

    def test_outlier_resistant(self, spark):
        from cubes_spark.operators.stats import theil_sen_slope
        t0 = dt.datetime(2020, 1, 1)
        vals = [1.0 + 0.25 * i for i in range(9)]
        vals[4] = 1000.0                     # one wild bucket
        rows = [("g", t0 + dt.timedelta(days=i), v)
                for i, v in enumerate(vals)]
        df = _df(spark, rows, "g string, ts timestamp, v double")
        r = theil_sen_slope(df, ["g"], "ts", "v",
                            bucket="day").collect()[0]
        # median slope stays the clean 25c/day despite the outlier
        assert r["median_slope_upd"] == 25_000_000


class TestCUPED:
    def test_zero_effect_fully_explained(self, spark):
        from cubes_spark.operators.stats import cuped_adjusted_diff
        # outcome == covariate per unit: theta = 1e6 and the
        # adjusted diff collapses to ~0 even though raw diff is big
        rows = []
        for u in range(1, 21):
            grp = "treat" if u % 2 == 0 else "control"
            base = 10.0 * u
            rows.append((u, grp, base, base))
        df = _df(spark, rows,
                 "u long, grp string, pre double, post double")
        r = cuped_adjusted_diff(df, "u", "grp", "treat",
                                "pre", "post").collect()[0]
        assert r["n_treat"] == 10 and r["n_control"] == 10
        assert r["theta_ppm"] == 1000000
        assert r["raw_diff_microcents"] != 0
        assert abs(r["adj_diff_microcents"]) <= 1   # truncation dust

    def test_uncorrelated_covariate_no_adjustment(self, spark):
        from cubes_spark.operators.stats import cuped_adjusted_diff
        # pre is symmetric noise orthogonal to treatment/outcome:
        # theta ~ 0 so adj ~ raw
        rows = []
        for u in range(1, 9):
            grp = "treat" if u % 2 == 0 else "control"
            pre = 1.0 if u <= 4 else 2.0
            post = 5.0 if grp == "treat" else 3.0
            rows.append((u, grp, pre, post))
        df = _df(spark, rows,
                 "u long, grp string, pre double, post double")
        r = cuped_adjusted_diff(df, "u", "grp", "treat",
                                "pre", "post").collect()[0]
        assert r["theta_ppm"] == 0
        assert r["adj_diff_microcents"] == r["raw_diff_microcents"]
        assert r["raw_diff_microcents"] == 2_000_000 * 100


class TestMannKendall:
    def test_strictly_increasing(self, spark):
        from cubes_spark.operators.stats import mann_kendall
        t0 = dt.datetime(2020, 1, 1)
        rows = [("g", t0 + dt.timedelta(days=i), float(i + 1))
                for i in range(6)]
        df = _df(spark, rows, "g string, ts timestamp, v double")
        r = mann_kendall(df, ["g"], "ts", "v",
                         bucket="day").collect()[0]
        assert r["s"] == 15                      # all 15 pairs up
        assert r["n_pairs"] == 15
        # no ties: var*18 = n(n-1)(2n+5) = 6*5*17 = 510
        assert r["var_s_x18"] == 510

    def test_ties_reduce_variance(self, spark):
        from cubes_spark.operators.stats import mann_kendall
        t0 = dt.datetime(2020, 1, 1)
        vals = [1.0, 2.0, 2.0, 3.0]
        rows = [("g", t0 + dt.timedelta(days=i), v)
                for i, v in enumerate(vals)]
        df = _df(spark, rows, "g string, ts timestamp, v double")
        r = mann_kendall(df, ["g"], "ts", "v",
                         bucket="day").collect()[0]
        # pairs: (1,2)+ (1,2)+ (1,3)+ (2,2)0 (2,3)+ (2,3)+ -> S=5
        assert r["s"] == 5
        # var18 = 4*3*13 - 2*1*9 = 156 - 18 = 138
        assert r["var_s_x18"] == 138


class TestStickiness:
    def test_everyone_every_day_is_1e6(self, spark):
        from cubes_spark.operators.olap import stickiness_ratio
        t0 = dt.datetime(2020, 1, 1)
        rows = [(u, t0 + dt.timedelta(days=d, hours=h))
                for u in (1, 2) for d in range(3) for h in (1, 5)]
        df = _df(spark, rows, "u long, ts timestamp")
        r = stickiness_ratio(df, "u", "ts").collect()[0]
        assert r["n_days"] == 3 and r["mau"] == 2
        assert r["stickiness_ppm"] == 1000000

    def test_half_active(self, spark):
        from cubes_spark.operators.olap import stickiness_ratio
        t0 = dt.datetime(2020, 1, 1)
        # user 1 active both days, user 2 only day one
        rows = [(1, t0), (1, t0 + dt.timedelta(days=1)), (2, t0)]
        df = _df(spark, rows, "u long, ts timestamp")
        r = stickiness_ratio(df, "u", "ts").collect()[0]
        # dau_sum = 2 + 1 = 3; days 2; mau 2 -> 3e6 div 4
        assert r["stickiness_ppm"] == 3000000 // 4


class TestLorenz:
    def test_distinct_uniform_spend_linear(self, spark):
        from cubes_spark.operators.olap import lorenz_curve
        # distinct amounts 10,20,..,100: total 550; decile d covers
        # the d smallest -> share = d(d+1)/2 / 55
        rows = [(u, 10.0 * u) for u in range(1, 11)]
        df = _df(spark, rows, "k long, v double")
        out = {r["decile"]: r for r in
               lorenz_curve(df, "k", "v").collect()}
        for d in range(1, 11):
            assert out[d]["cum_entities"] == d
            assert out[d]["cum_share_ppm"] == \
                (1000000 * d * (d + 1) // 2) // 55

    def test_all_equal_ties_merge(self, spark):
        from cubes_spark.operators.olap import lorenz_curve
        # identical spenders: the single distinct value covers every
        # decile boundary (documented tie-merge semantics)
        rows = [(u, 10.0) for u in range(1, 11)]
        df = _df(spark, rows, "k long, v double")
        out = {r["decile"]: r for r in
               lorenz_curve(df, "k", "v").collect()}
        for d in range(1, 11):
            assert out[d]["cum_entities"] == 10
            assert out[d]["cum_share_ppm"] == 1000000

    def test_concentrated_spend(self, spark):
        from cubes_spark.operators.olap import lorenz_curve
        rows = [(u, 1.0) for u in range(1, 10)] + [(10, 91.0)]
        df = _df(spark, rows, "k long, v double")
        out = {r["decile"]: r for r in
               lorenz_curve(df, "k", "v").collect()}
        # bottom 90% of customers hold 9/100 of spend
        assert out[9]["cum_share_ppm"] == 90000
        assert out[10]["cum_share_ppm"] == 1000000

    def test_refunds_total_from_last_value(self, spark):
        from cubes_spark.operators.olap import lorenz_curve
        # One refund entity: running amount sum is NOT monotone, so
        # the denominator must be the cumulative at the LAST value
        # (the true total 90), not max(__wcum__) (=100 here:
        # -10,10,20,30,50 cumulates to -10,0,20,50,100... ordered
        # ascending the refund comes first; totals: -10,0,20,50,100
        # -> max == total only because refund sorts first; use a
        # shape where a mid-stream negative breaks monotonicity).
        rows = [(1, 10.0), (2, -5.0), (3, 20.0), (4, 30.0)]
        # ascending amounts: -5,10,20,30 -> cum: -5,5,25,55 (total 55)
        df = _df(spark, rows, "k long, v double")
        out = {r["decile"]: r for r in
               lorenz_curve(df, "k", "v", deciles=4).collect()}
        assert out[4]["cum_share_ppm"] == 1000000
        # bottom quarter = the refund: share is negative (Spark's
        # decimal div truncates toward zero, unlike Python //)
        assert out[1]["cum_share_ppm"] == -(1000000 * 500 // 5500)

    def test_non_positive_total_null_shares(self, spark):
        from cubes_spark.operators.olap import lorenz_curve
        rows = [(1, -10.0), (2, 10.0)]
        df = _df(spark, rows, "k long, v double")
        out = lorenz_curve(df, "k", "v", deciles=2).collect()
        assert len(out) == 2
        assert all(r["cum_share_ppm"] is None for r in out)


class TestDistinctiveTerms:
    def test_over_represented_token_found(self, spark):
        from cubes_spark.llm.text import distinctive_terms
        rows = [(i, "common quark " if i % 2 == 0 else "common word ",
                 "s1" if i % 2 == 0 else "s2") for i in range(40)]
        rows = [(i, t * 3, s) for i, t, s in rows]
        df = _df(spark, rows,
                 "doc_id long, text string, source string")
        out = {(r["stratum"], r["term"]): r for r in
               distinctive_terms(df, "text", "source", top_k=2,
                                 min_count=5).collect()}
        assert ("s1", "quark") in out
        assert ("s2", "word") in out
        # the shared token is never over-represented
        assert ("s1", "common") not in out
        assert ("s2", "common") not in out


class TestOneWayAnova:
    def test_hand_computed_f(self, spark):
        from cubes_spark.operators.stats import one_way_anova
        # groups a=(1,2,3), b=(4,5,6): in cents 100,200,300 /
        # 400,500,600.  SSB = 135000 cents², SSW = 40000 cents²,
        # F = (135000/1)/(40000/4) = 13.5, eta² = 135000/175000.
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
                ("b", 4.0), ("b", 5.0), ("b", 6.0)]
        df = _df(spark, rows, "g string, v double")
        out = one_way_anova(df, "g", "v").collect()[0]
        assert out["n_groups"] == 2 and out["n_rows"] == 6
        assert out["f_ppm"] == 13_500_000
        assert out["eta2_ppm"] == 1_000_000 * 135 // 175

    def test_identical_groups_zero_f(self, spark):
        from cubes_spark.operators.stats import one_way_anova
        rows = [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)]
        df = _df(spark, rows, "g string, v double")
        out = one_way_anova(df, "g", "v").collect()[0]
        assert out["f_ppm"] == 0 and out["eta2_ppm"] == 0

    def test_zero_within_variance_null_f(self, spark):
        from cubes_spark.operators.stats import one_way_anova
        # SSW == 0: F undefined -> NULL, eta² = 1
        rows = [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)]
        df = _df(spark, rows, "g string, v double")
        out = one_way_anova(df, "g", "v").collect()[0]
        assert out["f_ppm"] is None
        assert out["eta2_ppm"] == 1_000_000


class TestBrownForsythe:
    def test_equal_spread_zero_f(self, spark):
        from cubes_spark.operators.stats import brown_forsythe
        # same |v - median| multiset in both groups -> F == 0
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
                ("b", 11.0), ("b", 12.0), ("b", 13.0)]
        df = _df(spark, rows, "g string, v double")
        out = brown_forsythe(df, "g", "v").collect()[0]
        assert out["f_ppm"] == 0

    def test_wider_group_detected(self, spark):
        from cubes_spark.operators.stats import brown_forsythe
        # b is 10x wider than a: z_a = (1,0,1), z_b = (10,0,10)
        # (cents 100,0,100 / 1000,0,1000): SSB = 135000, SSW = 26666
        # hand-replay of the fdiv recipe below
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
                ("b", 10.0), ("b", 20.0), ("b", 30.0)]
        df = _df(spark, rows, "g string, v double")
        out = brown_forsythe(df, "g", "v").collect()[0]
        # z_a cents = (100,0,100): s=200, q=20000
        # z_b cents = (1000,0,1000): s=2000, q=2000000
        a = (200 * 200 * 1000) // 3 + (2000 * 2000 * 1000) // 3
        s, n, q, k = 2200, 6, 2020000, 2
        ssb = a - (s * s * 1000) // n
        ssw = q * 1000 - a
        assert out["f_ppm"] == (ssb * (n - k) * 1000000) // (ssw * (k - 1))

    def test_null_group_and_value_dropped(self, spark):
        from cubes_spark.operators.stats import brown_forsythe
        rows = [("a", 1.0), ("a", 3.0), (None, 100.0),
                ("b", 2.0), ("b", None), ("b", 4.0)]
        df = _df(spark, rows, "g string, v double")
        out = brown_forsythe(df, "g", "v").collect()[0]
        assert out["n_groups"] == 2 and out["n_rows"] == 4


class TestKruskalWallis:
    def test_hand_computed_no_ties(self, spark):
        from cubes_spark.operators.stats import kruskal_wallis
        # a=(1,2), b=(3,4): ranks a={1,2}, b={3,4}; n=4
        # H = 12/(4*5) * (3²/2 + 7²/2) - 3*5 = 0.6*29 - 15 = 2.4
        rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)]
        df = _df(spark, rows, "g string, v double")
        out = kruskal_wallis(df, "g", "v").collect()[0]
        assert out["tie_term"] == 0
        assert out["h_ppm"] == 2_400_000

    def test_all_tied_zero_h(self, spark):
        from cubes_spark.operators.stats import kruskal_wallis
        # every value identical: tie factor zeroes the denominator
        # n³-n-T == 0 -> NULL (test degenerate guard)
        rows = [("a", 5.0), ("a", 5.0), ("b", 5.0)]
        df = _df(spark, rows, "g string, v double")
        out = kruskal_wallis(df, "g", "v").collect()[0]
        assert out["tie_term"] == 24  # t=3: t³-t = 27-3
        assert out["h_ppm"] is None

    def test_tie_correction_applied(self, spark):
        from cubes_spark.operators.stats import kruskal_wallis
        # a=(1,2,2), b=(3): doubled avg ranks: v=1 -> 2; v=2 ties
        # {2,3} -> 2*1+2+1=5; v=3 -> rank 4 doubled 8.
        # R2_a = 2+5+5 = 12, R2_b = 8; n=4, T = (2³-2) = 6
        rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 3.0)]
        df = _df(spark, rows, "g string, v double")
        out = kruskal_wallis(df, "g", "v").collect()[0]
        assert out["tie_term"] == 6
        a = (12 * 12 * 1000000) // (4 * 3) + (8 * 8 * 1000000) // (4 * 1)
        b = (12 * a) // (4 * 5) - 3 * 5 * 1000000
        expected = (b * (64 - 4)) // (64 - 4 - 6)
        assert out["h_ppm"] == expected

    def test_empty_input(self, spark):
        from cubes_spark.operators.stats import kruskal_wallis
        df = _df(spark, [], "g string, v double")
        assert kruskal_wallis(df, "g", "v").collect() == []


class TestShannonEntropy:
    def test_uniform_two_categories(self, spark):
        import math
        from cubes_spark.operators.stats import shannon_entropy
        rows = [("a",), ("a",), ("b",), ("b",)]
        df = _df(spark, rows, "t string")
        out = shannon_entropy(df, "t").collect()[0]
        assert out["n_categories"] == 2 and out["n_rows"] == 4
        assert abs(out["entropy_nats"] - math.log(2)) < 1e-12

    def test_single_category_zero(self, spark):
        from cubes_spark.operators.stats import shannon_entropy
        df = _df(spark, [("a",)] * 5, "t string")
        out = shannon_entropy(df, "t").collect()[0]
        assert out["entropy_nats"] == 0.0

    def test_nulls_dropped(self, spark):
        from cubes_spark.operators.stats import shannon_entropy
        df = _df(spark, [("a",), (None,), ("b",)], "t string")
        out = shannon_entropy(df, "t").collect()[0]
        assert out["n_rows"] == 2 and out["n_categories"] == 2


class TestRatioDeltaCI:
    def test_constant_ratio_zero_variance(self, spark):
        from cubes_spark.operators.stats import ratio_delta_ci
        # x = 2y on every row: R = 2 exactly, residual variance 0
        rows = [("g", 2.0, 1.0), ("g", 4.0, 2.0), ("g", 6.0, 3.0)]
        df = _df(spark, rows, "g string, x double, y double")
        out = ratio_delta_ci(df, ["g"], "x", "y").collect()[0]
        assert out["ratio"] == 2.0
        assert abs(out["var_ratio"]) < 1e-18

    def test_hand_computed(self, spark):
        from cubes_spark.operators.stats import ratio_delta_ci
        # cents: x=(100,300), y=(100,100): R=2, moments by hand
        rows = [("g", 1.0, 1.0), ("g", 3.0, 1.0)]
        df = _df(spark, rows, "g string, x double, y double")
        out = ratio_delta_ci(df, ["g"], "x", "y").collect()[0]
        n, sx, sy = 2, 400, 200
        sxx, syy, sxy = 100**2 + 300**2, 2 * 100**2, 100*100 + 300*100
        r = sx / sy
        var = n/(n-1) * (sxx - 2*r*sxy + r*r*syy) / (sy*sy)
        assert out["ratio"] == r
        assert out["var_ratio"] == var

    def test_single_row_null_variance(self, spark):
        from cubes_spark.operators.stats import ratio_delta_ci
        df = _df(spark, [("g", 3.0, 2.0)], "g string, x double, y double")
        out = ratio_delta_ci(df, ["g"], "x", "y").collect()[0]
        assert out["ratio"] == 1.5 and out["var_ratio"] is None


class TestPoissonBootstrap:
    def test_constant_column_degenerate_ci(self, spark):
        from cubes_spark.operators.stats import poisson_bootstrap_mean
        # every value identical: every replicate mean equals it
        rows = [("g", float(i), 7.0) for i in range(20)]
        df = _df(spark, rows, "g string, id double, v double")
        out = poisson_bootstrap_mean(df, ["g"], "v", "id",
                                     n_reps=16).collect()[0]
        assert out["mean_cents"] == 700.0
        assert out["ci_lo"] == 700.0 and out["ci_hi"] == 700.0

    def test_ci_brackets_mean_and_deterministic(self, spark):
        from cubes_spark.operators.stats import poisson_bootstrap_mean
        rows = [("g", float(i), float(i % 10)) for i in range(200)]
        df = _df(spark, rows, "g string, id double, v double")
        a = poisson_bootstrap_mean(df, ["g"], "v", "id").collect()[0]
        b = poisson_bootstrap_mean(df, ["g"], "v", "id").collect()[0]
        assert a == b  # md5-seeded: bit-identical across runs
        assert a["ci_lo"] <= a["mean_cents"] <= a["ci_hi"]
        assert a["ci_lo"] < a["ci_hi"]
        assert a["n_reps"] == 64


class TestBinarySegmentation:
    def test_clean_step_found(self, spark):
        from cubes_spark.operators.stats import binary_segmentation
        # 4 days at 1.00, then 4 days at 9.00: optimal split after
        # day 4 (means 100 vs 900 cents)
        t0 = dt.datetime(2020, 1, 1)
        rows = [(t0 + dt.timedelta(days=i),
                 1.0 if i < 4 else 9.0) for i in range(8)]
        df = _df(spark, rows, "ts timestamp, v double")
        out = binary_segmentation(df, "ts", "v").collect()[0]
        assert out["split_day"] == "2020-01-04"
        assert out["n_left"] == 4 and out["n_days"] == 8
        assert out["mean_left_cents"] == 100.0
        assert out["mean_right_cents"] == 900.0
        # gain = 400²·1000/4 + 3600²·1000/4 - 4000²·1000/8
        assert out["gain_scaled"] == (400**2 * 1000) // 4 \
            + (3600**2 * 1000) // 4 - (4000**2 * 1000) // 8

    def test_flat_series_zero_gain(self, spark):
        from cubes_spark.operators.stats import binary_segmentation
        t0 = dt.datetime(2020, 1, 1)
        rows = [(t0 + dt.timedelta(days=i), 5.0) for i in range(6)]
        df = _df(spark, rows, "ts timestamp, v double")
        out = binary_segmentation(df, "ts", "v").collect()[0]
        assert out["gain_scaled"] == 0
        # tie on gain -> earliest day wins
        assert out["split_day"] == "2020-01-01"

    def test_single_day_empty(self, spark):
        from cubes_spark.operators.stats import binary_segmentation
        df = _df(spark, [(dt.datetime(2020, 1, 1), 1.0)],
                 "ts timestamp, v double")
        assert binary_segmentation(df, "ts", "v").collect() == []


class TestWelchT2:
    def test_identical_groups_zero_t2(self, spark):
        from cubes_spark.operators.stats import welch_t2
        rows = [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)]
        df = _df(spark, rows, "g string, v double")
        out = welch_t2(df, "g", "v", "a", "b").collect()[0]
        assert out["t2_ppm"] == 0

    def test_hand_computed(self, spark):
        from cubes_spark.operators.stats import welch_t2
        # a = (1,2,3), b = (5,7,9) in dollars -> cents moments
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
                ("b", 5.0), ("b", 7.0), ("b", 9.0)]
        df = _df(spark, rows, "g string, v double")
        out = welch_t2(df, "g", "v", "a", "b").collect()[0]
        n1, s1, q1 = 3, 600, 140000
        n2, s2, q2 = 3, 2100, 1550000
        d1 = ((n1*q1 - s1*s1) * 10**6) // (n1*n1*(n1-1))
        d2 = ((n2*q2 - s2*s2) * 10**6) // (n2*n2*(n2-1))
        ns = ((s1*n2 - s2*n1)**2 // (n1*n2)**2) * 10**6
        assert out["t2_ppm"] == (ns * 10**6) // (d1 + d2)
        assert out["nu_milli"] == ((d1+d2)**2 * 1000) // (
            d1*d1 // (n1-1) + d2*d2 // (n2-1))

    def test_zero_variance_null(self, spark):
        from cubes_spark.operators.stats import welch_t2
        rows = [("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 2.0)]
        df = _df(spark, rows, "g string, v double")
        out = welch_t2(df, "g", "v", "a", "b").collect()[0]
        assert out["t2_ppm"] is None and out["nu_milli"] is None

    def test_single_row_group_empty(self, spark):
        from cubes_spark.operators.stats import welch_t2
        rows = [("a", 1.0), ("b", 2.0), ("b", 3.0)]
        df = _df(spark, rows, "g string, v double")
        assert welch_t2(df, "g", "v", "a", "b").collect() == []


class TestHillTailIndex:
    def test_pareto_like_series(self, spark):
        from cubes_spark.operators.stats import hill_tail_index
        # exact Pareto(alpha=1) order statistics: x_(i) = C/i
        rows = [(i, 1200.0 / i) for i in range(1, 21)]
        df = _df(spark, rows, "id long, v double")
        out = hill_tail_index(df, "v", "id", k=20).collect()[0]
        assert out["n_top"] == 20
        assert out["x_k_cents"] == 6000  # 1200/20 dollars in cents
        # 1/alpha = mean(ln(x_i) - ln(x_20)) = mean(ln(20/i)) ~ 1
        assert 0.9 < out["inv_alpha"] < 1.2
        assert abs(out["alpha"] * out["inv_alpha"] - 1.0) < 1e-12

    def test_constant_values_zero_inv_alpha(self, spark):
        from cubes_spark.operators.stats import hill_tail_index
        rows = [(i, 5.0) for i in range(10)]
        df = _df(spark, rows, "id long, v double")
        out = hill_tail_index(df, "v", "id", k=5).collect()[0]
        assert out["inv_alpha"] == 0.0

    def test_fewer_rows_than_k(self, spark):
        from cubes_spark.operators.stats import hill_tail_index
        rows = [(1, 10.0), (2, 20.0), (3, 40.0)]
        df = _df(spark, rows, "id long, v double")
        out = hill_tail_index(df, "v", "id", k=200).collect()[0]
        assert out["n_top"] == 3

    def test_multi_group_key_path(self, spark):
        from cubes_spark.operators.stats import poisson_bootstrap_mean
        # two group columns exercise the concatenated-key batch path
        rows = [(g1, g2, float(i), float(i % 7))
                for g1 in ("a", "b") for g2 in ("x", "y")
                for i in range(40)]
        df = _df(spark, rows,
                 "g1 string, g2 string, id double, v double")
        out = {(r["g1"], r["g2"]): r for r in poisson_bootstrap_mean(
            df, ["g1", "g2"], "v", "id", n_reps=16).collect()}
        assert len(out) == 4
        for r in out.values():
            assert r["n"] == 40
            assert r["ci_lo"] <= r["mean_cents"] <= r["ci_hi"]
