"""Golden-number aggregation tests over the reference's 16-row fixture
(parity: /root/reference/tests/sql/test_aggregates.py:56-70)."""


def test_summary_golden_numbers(golden_browser):
    result = golden_browser.aggregate()
    assert result.summary["amount_sum"] == 60
    assert result.summary["count"] == 16


def test_drilldown_by_year(golden_browser):
    result = golden_browser.aggregate(drilldown=["year"],
                                      aggregates=["amount_sum", "count"])
    cells = {c["year.year"]: c for c in result.cells}
    assert sorted(cells) == [2010, 2011, 2012, 2013]
    assert all(c["amount_sum"] == 15 for c in cells.values())
    assert all(c["count"] == 4 for c in cells.values())
    assert result.total_cell_count == 4


def test_post_calculated_sma_columns(golden_browser):
    result = golden_browser.aggregate(
        drilldown=["year"], aggregates=["amount_sma", "amount_sum", "count"]
    )
    assert sorted(result.labels) == ["amount_sma", "amount_sum", "count",
                                     "year.year"]
    # window_size=2, values all 15 → sma always 15
    assert all(c["amount_sma"] == 15.0 for c in result.cells)


def test_point_cut_golden(golden_browser):
    result = golden_browser.aggregate(cell="year:2010")
    assert result.summary["amount_sum"] == 15
    assert result.summary["count"] == 4


def test_min_max_avg_distinct(golden_browser):
    result = golden_browser.aggregate(
        aggregates=["price_min", "price_max", "price_avg",
                    "amount_distinct"]
    )
    s = result.summary
    assert s["price_min"] == 100
    assert s["price_max"] == 800
    assert s["price_avg"] == 450.0
    assert s["amount_distinct"] == 4


def test_range_cut_golden(golden_browser):
    result = golden_browser.aggregate(cell="year:2011-2012",
                                      aggregates=["amount_sum"])
    assert result.summary["amount_sum"] == 30


def test_set_cut_inverted(golden_browser):
    result = golden_browser.aggregate(cell="!year:2010;2011",
                                      aggregates=["count"])
    assert result.summary["count"] == 8


def test_fact_by_key(golden_browser):
    row = golden_browser.fact(7)
    assert row is not None
    assert row["amount"] == 4


def test_facts_fact_list(golden_browser):
    df = golden_browser.facts(fields=["amount"], fact_list=[1, 2, 3])
    assert df.count() == 3


def test_members(golden_browser):
    members = golden_browser.members(dimension="year")
    assert [m["year.year"] for m in members] == [2010, 2011, 2012, 2013]


def test_custom_aggregate_function_registry(golden_browser):
    from pyspark.sql import functions as F

    from cubes_spark.functions.aggregates import (
        available_aggregate_functions,
        register_aggregate_function,
    )

    register_aggregate_function("sum_of_squares", lambda c: F.sum(c * c))
    assert "sum_of_squares" in available_aggregate_functions()

    cube = golden_browser.cube
    from cubes_spark.metadata.attributes import MeasureAggregate

    cube.aggregates.append(MeasureAggregate(
        "amount_sq_sum", function="sum_of_squares", measure="amount"))
    try:
        result = golden_browser.aggregate(aggregates=["amount_sq_sum"])
        # 4 * (1 + 4 + 16 + 64) = 340
        assert result.summary["amount_sq_sum"] == 340
    finally:
        cube.aggregates.pop()


def test_spark_native_extra_functions(golden_browser):
    from cubes_spark.metadata.attributes import MeasureAggregate

    cube = golden_browser.cube
    cube.aggregates.extend([
        MeasureAggregate("amount_approx_distinct",
                         function="approx_count_distinct",
                         measure="amount"),
        MeasureAggregate("amount_median", function="median",
                         measure="amount"),
    ])
    try:
        result = golden_browser.aggregate(
            aggregates=["amount_approx_distinct", "amount_median"])
        assert result.summary["amount_approx_distinct"] == 4  # exact on tiny data
        assert float(result.summary["amount_median"]) == 3.0  # median of 1,2,4,8
    finally:
        cube.aggregates.pop()
        cube.aggregates.pop()


def test_pandas_udaf_through_registry(golden_browser):
    """The extensibility surface reaches Arrow-vectorized pandas UDAFs:
    a grouped-agg pandas_udf registered like any built-in runs through
    the browser (SURVEY 2.10 — user-pluggable aggregate functions,
    beyond the reference's fixed table)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    from cubes_spark.functions.aggregates import (
        available_aggregate_functions,
        register_aggregate_function,
    )

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        vals = v.dropna().astype(float)
        vals = vals[vals > 0]
        return float(np.exp(np.log(vals).mean())) if len(vals) else None

    register_aggregate_function("geo_mean", geo_mean)
    assert "geo_mean" in available_aggregate_functions()

    cube = golden_browser.cube
    from cubes_spark.metadata.attributes import MeasureAggregate

    cube.aggregates.append(MeasureAggregate(
        "amount_geo", function="geo_mean", measure="amount"))
    try:
        result = golden_browser.aggregate(aggregates=["amount_geo"])
        values = [1.0, 2.0, 4.0, 8.0] * 4   # golden amounts per row
        expected = float(np.exp(np.mean(np.log(values))))
        assert abs(result.summary["amount_geo"] - expected) < 1e-9
    finally:
        cube.aggregates.pop()



class TestCountMin:
    def test_never_underestimates_and_bounds(self, spark):
        from pyspark.sql import functions as F

        from cubes_spark.functions.sketches import (
            countmin_estimates,
            countmin_sketch,
        )

        rows = [(f"k{i % 37}",) for i in range(2000)]
        df = spark.createDataFrame(rows, "k string")
        sketch = countmin_sketch(df, "k", depth=4, width=64)
        assert sketch.count() <= 4 * 64
        exact = df.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n"))
        est = countmin_estimates(sketch, exact, "k",
                                 depth=4, width=64)
        for r in est.collect():
            assert r.cm_estimate >= r.n          # never under
            assert r.cm_estimate <= r.n + 2000   # trivially bounded

    def test_weighted_sketch(self, spark):
        from pyspark.sql import functions as F

        from cubes_spark.functions.sketches import (
            countmin_estimates,
            countmin_sketch,
        )

        df = spark.createDataFrame(
            [("a", 5), ("a", 7), ("b", 1)], "k string, w long")
        sketch = countmin_sketch(df, "k", depth=4, width=128,
                                 weight_col="w")
        vals = spark.createDataFrame([("a",), ("b",)], "k string")
        got = {r.k: r.cm_estimate for r in
               countmin_estimates(sketch, vals, "k", depth=4,
                                  width=128).collect()}
        assert got["a"] >= 12 and got["b"] >= 1

    def test_unseen_value_estimates_from_grid(self, spark):
        from cubes_spark.functions.sketches import (
            countmin_estimates,
            countmin_sketch,
        )

        df = spark.createDataFrame([("x",)] * 10, "k string")
        sketch = countmin_sketch(df, "k", depth=4, width=256)
        vals = spark.createDataFrame([("zzz",)], "k string")
        est = countmin_estimates(sketch, vals, "k").collect()[0]
        # zzz hashes away from x's cells with width 256 and 1 key:
        # collisions in ALL 4 rows are (1/256)^4-improbable
        assert est.cm_estimate == 0


class TestBloom:
    def test_no_false_negatives(self, spark):
        from cubes_spark.functions.sketches import (
            bloom_build,
            bloom_contains,
        )

        members = spark.createDataFrame(
            [(f"user{i}",) for i in range(100)], "k string")
        bloom = bloom_build(members, "k", num_bits=2048)
        assert bloom.count() <= 2048 // 32
        probed = bloom_contains(bloom, members, "k", num_bits=2048)
        assert all(r.maybe_present for r in probed.collect())

    def test_low_false_positive_rate(self, spark):
        from cubes_spark.functions.sketches import (
            bloom_build,
            bloom_contains,
        )

        members = spark.createDataFrame(
            [(f"user{i}",) for i in range(50)], "k string")
        others = spark.createDataFrame(
            [(f"ghost{i}",) for i in range(200)], "k string")
        bloom = bloom_build(members, "k", num_bits=4096)
        probed = bloom_contains(bloom, others, "k",
                                num_bits=4096).collect()
        fp = sum(1 for r in probed if r.maybe_present)
        # theoretical fp ~ (1 - e^(-5*50/4096))^5 ~ 1e-6; allow slack
        assert fp <= 2


class TestHLL:
    def test_estimate_accuracy_and_merge(self, spark):
        from pyspark.sql import functions as F

        from cubes_spark.functions.sketches import (
            hll_estimate,
            hll_registers,
        )

        rows = [(f"u{i}",) for i in range(5000)] * 3  # repeats
        df = spark.createDataFrame(rows, "u string")
        regs = hll_registers(df, "u", m=256)
        assert regs.count() <= 256
        est = hll_estimate(regs, m=256).collect()[0].hll_est
        assert abs(est - 5000) <= 5000 * 0.25

        # registers are mergeable state: sketching two shards and
        # max-merging registers equals sketching the union
        a = hll_registers(df.limit(7000), "u", m=256)
        b = hll_registers(df.subtract(df.limit(0)), "u", m=256)
        merged = (
            a.unionByName(b).groupBy("bucket")
            .agg(F.max("register").alias("register"))
        )
        est_m = hll_estimate(merged, m=256).collect()[0].hll_est
        assert est_m == est

    def test_grouped_registers(self, spark):
        from cubes_spark.functions.sketches import (
            hll_estimate,
            hll_registers,
        )

        rows = [("g1", f"u{i}") for i in range(2000)] + \
               [("g2", f"v{i}") for i in range(500)]
        df = spark.createDataFrame(rows, "g string, u string")
        est = {r.g: r.hll_est for r in hll_estimate(
            hll_registers(df, "u", ["g"], m=256), ["g"],
            m=256).collect()}
        assert abs(est["g1"] - 2000) <= 500
        assert abs(est["g2"] - 500) <= 150


class TestBasketPairs:
    def test_counts_support_and_lift(self, spark):
        from cubes_spark.operators.olap import basket_pairs

        rows = [(1, "a"), (1, "b"), (1, "c"),
                (2, "a"), (2, "b"),
                (3, "a"), (3, "c"),
                (4, "b"), (4, "b"),        # duplicate item collapses
                (5, "d")]
        df = spark.createDataFrame(rows, "basket long, item string")
        got = {(r.item_a, r.item_b): r
               for r in basket_pairs(df, "basket", "item").collect()}
        ab = got[("a", "b")]
        assert ab.n_ab == 2 and ab.n_a == 3 and ab.n_b == 3
        # lift = n_ab * N / (n_a * n_b) = 2*5/9 = 1.111 -> 11111 bp
        assert ab.lift_bp == 11111
        assert got[("a", "c")].n_ab == 2
        assert ("b", "c") in got and got[("b", "c")].n_ab == 1
        assert all(k[0] < k[1] for k in got)
        assert not any("d" in k for k in got)

    def test_min_count_and_max_basket_size(self, spark):
        from cubes_spark.operators.olap import basket_pairs

        rows = [(1, "a"), (1, "b"), (1, "c"),
                (2, "a"), (2, "b"),
                (3, "x"), (3, "y"), (3, "z"), (3, "w")]
        df = spark.createDataFrame(rows, "basket long, item string")
        got = basket_pairs(df, "basket", "item", min_count=2)
        assert {(r.item_a, r.item_b) for r in got.collect()} == \
            {("a", "b")}
        capped = basket_pairs(df, "basket", "item",
                              max_basket_size=3)
        pairs = {(r.item_a, r.item_b) for r in capped.collect()}
        assert ("x", "y") not in pairs       # mega-basket dropped
        assert ("a", "b") in pairs


class TestHistogramQuantiles:
    def test_bucket_contains_true_quantile(self, spark):
        from cubes_spark.functions.sketches import histogram_quantiles

        values = list(range(1, 1001))            # 1..1000
        df = spark.createDataFrame([(v,) for v in values], "v long")
        out = {r.q_bp: r for r in histogram_quantiles(
            df, "v", [2500, 5000, 9900], width=10).collect()}
        import math

        for q, row in out.items():
            rank_value = values[
                math.ceil(q / 10000 * len(values)) - 1]
            assert row.est_lo <= rank_value <= row.est_hi
            assert row.total == 1000
            assert row.cum_count * 10000 >= q * row.total

    def test_grouped_and_merge_semantics(self, spark):
        from pyspark.sql import functions as F

        from cubes_spark.functions.sketches import histogram_quantiles

        rows = [("a", v) for v in range(100)] + \
               [("b", v * 7) for v in range(50)]
        df = spark.createDataFrame(rows, "g string, v long")
        out = histogram_quantiles(df, "v", [5000], width=5,
                                  group_cols=["g"]).collect()
        got = {r.g: r for r in out}
        assert got["a"].total == 100 and got["b"].total == 50
        # median of 0..99 is 49/50 -> bucket 9 (45..49)
        assert got["a"].est_lo <= 49 <= got["a"].est_hi + 5


class TestTriangleCounts:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            [(a, b) for a, b in pairs], "id_a long, id_b long")

    def test_k4_and_star(self, spark):
        from cubes_spark.llm.web import triangle_counts

        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        got = {r.node: r.n_triangles for r in triangle_counts(
            self._edges(spark, k4)).collect()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}   # K4: C(3,2)=3 each

        star = [(0, i) for i in range(1, 6)]     # hub, no triangles
        assert triangle_counts(self._edges(spark, star)).count() == 0

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        from cubes_spark.llm.web import triangle_counts

        edges = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (1, 1)]
        got = {r.node: r.n_triangles for r in triangle_counts(
            self._edges(spark, edges)).collect()}
        assert got == {1: 1, 2: 1, 3: 1}


class TestKMV:
    def test_exact_below_k_and_estimator_above(self, spark):
        from cubes_spark.functions.sketches import (
            kmv_estimate,
            kmv_sketch,
        )

        df = spark.createDataFrame(
            [(f"v{i % 40}",) for i in range(200)], "v string")
        # k > distinct: the sketch holds every hash -> exact count
        sk = kmv_sketch(df, "v", k=64)
        est = kmv_estimate(sk, k=64).collect()[0].kmv_est
        assert est == 40
        # k < distinct: estimator engages, stays within 4 sigma
        big = spark.createDataFrame(
            [(f"x{i}",) for i in range(5000)], "v string")
        sk = kmv_sketch(big, "v", k=256)
        est = kmv_estimate(sk, k=256).collect()[0].kmv_est
        assert abs(est - 5000) <= 4 * 5000 / (254 ** 0.5)

    def test_partition_invariance(self, spark):
        from cubes_spark.functions.sketches import kmv_sketch

        rows = [(f"g{i % 3}", f"v{i % 97}") for i in range(300)]
        df = spark.createDataFrame(rows, "g string, v string")
        one = {(r.g, tuple(r.kmv)) for r in
               kmv_sketch(df, "v", ["g"], k=32).collect()}
        many = {(r.g, tuple(r.kmv)) for r in
                kmv_sketch(df.repartition(13), "v", ["g"],
                           k=32).collect()}
        assert one == many

    def test_set_ops_exact_when_complete(self, spark):
        from cubes_spark.functions.sketches import (
            kmv_set_ops,
            kmv_sketch,
        )

        # a = {0..59}, b = {40..99}: union 100, intersection 20.
        rows = [("a", f"v{i}") for i in range(60)] + \
               [("b", f"v{i}") for i in range(40, 100)]
        df = spark.createDataFrame(rows, "g string, v string")
        sk = kmv_sketch(df, "v", ["g"], k=256)
        row = kmv_set_ops(sk, "g", k=256).collect()[0]
        assert (row.group_a, row.group_b) == ("a", "b")
        # complete sketches -> every estimate is exact
        assert row.union_est == 100
        assert row.inter_est == 20
        assert row.jaccard_bp == 10000 * 20 // 100

    def test_disjoint_sets(self, spark):
        from cubes_spark.functions.sketches import (
            kmv_set_ops,
            kmv_sketch,
        )

        rows = [("a", f"p{i}") for i in range(50)] + \
               [("b", f"q{i}") for i in range(30)]
        df = spark.createDataFrame(rows, "g string, v string")
        sk = kmv_sketch(df, "v", ["g"], k=128)
        row = kmv_set_ops(sk, "g", k=128).collect()[0]
        assert row.union_est == 80
        assert row.inter_est == 0 and row.jaccard_bp == 0


class TestPrioritySample:
    def test_complete_sample_is_exact(self, spark):
        from cubes_spark.functions.aqp import (
            priority_estimate,
            priority_sample,
        )

        rows = [(i, (i * 37) % 100 + 1) for i in range(40)]
        df = spark.createDataFrame(rows, "id long, w long")
        s = priority_sample(df, "w", 64, "id")
        est = priority_estimate(s, 64).collect()[0]
        assert est.est_sum == sum(w for _, w in rows)
        assert est.n_sampled == 40

    def test_estimator_band_and_determinism(self, spark):
        from pyspark.sql import functions as SF

        from cubes_spark.functions.aqp import (
            priority_estimate,
            priority_sample,
        )

        rows = [(i, (i * 997) % 5000 + 1) for i in range(4000)]
        df = spark.createDataFrame(rows, "id long, w long")
        truth = sum(w for _, w in rows)
        s = priority_sample(df, "w", 256, "id")
        est = priority_estimate(s, 256).collect()[0]
        # 4 sigma at k=256 (sigma ~ 1/sqrt(k-1))
        assert abs(est.est_sum - truth) <= truth * 0.25
        assert est.n_sampled == 256
        # partition-invariant: the sample is a pure function of data
        again = priority_estimate(
            priority_sample(df.repartition(17), "w", 256, "id"),
            256).collect()[0]
        assert again.est_sum == est.est_sum

    def test_grouped_and_subset_estimation(self, spark):
        from pyspark.sql import functions as SF

        from cubes_spark.functions.aqp import (
            priority_estimate,
            priority_sample,
        )

        rows = [(i, "g%d" % (i % 2), (i * 13) % 300 + 1)
                for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, g string, w long")
        s = priority_sample(df, "w", 128, "id", ["g"])
        got = {r.g: r.est_sum for r in
               priority_estimate(s, 128, ["g"]).collect()}
        for g in ("g0", "g1"):
            truth = sum(w for i, gg, w in rows if gg == g)
            assert abs(got[g] - truth) <= truth * 0.40

    def test_zero_weights_never_crowd_out(self, spark):
        from cubes_spark.functions.aqp import (
            priority_estimate,
            priority_sample,
        )

        rows = [(i, 0) for i in range(100)] + \
               [(100 + i, 50) for i in range(10)]
        df = spark.createDataFrame(rows, "id long, w long")
        s = priority_sample(df, "w", 16, "id")
        kept = [r for r in s.collect() if r.rank <= 16]
        # all ten weighted rows outrank every zero-weight row
        assert sum(1 for r in kept if r.weight == 50) == 10
        est = priority_estimate(s, 16).collect()[0]
        assert est.est_sum == 500


class TestBitmapDistinctRollup:
    def test_exact_two_grains(self, spark):
        """Per-group counts are exact; the '(all)' row equals the
        true global distinct (ids overlapping across groups counted
        once) and is derived from merged bitmaps, not a rescan."""
        from cubes_spark.functions.sketches import \
            bitmap_distinct_rollup

        rows = ([("a", i) for i in range(100)]
                + [("a", i) for i in range(50)]        # dups in-group
                + [("b", i) for i in range(50, 120)]   # overlap with a
                + [("c", 10 ** 7 + 5), ("c", 3)])      # chunk spread
        df = spark.createDataFrame(rows, "g string, uid long")
        out = {r["g"]: r["n_distinct"]
               for r in bitmap_distinct_rollup(df, "g", "uid",
                                               chunk_bits=10)
               .collect()}
        assert out == {"a": 100, "b": 70, "c": 2, "(all)": 121}

    def test_matches_count_distinct_on_events(self, spark):
        from conftest import SF_DIR
        from pyspark.sql import functions as F

        from cubes_spark.functions.sketches import \
            bitmap_distinct_rollup

        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        got = {r["event_type"]: r["n_distinct"] for r in
               bitmap_distinct_rollup(ev, "event_type", "user_id")
               .collect()}
        want = {r["event_type"]: r["n"] for r in
                ev.groupBy("event_type")
                .agg(F.countDistinct("user_id").alias("n"))
                .collect()}
        want["(all)"] = ev.select("user_id").distinct().count()
        assert got == want


class TestFrequentItems:
    def test_exact_and_partition_invariant(self, spark):
        """Values above the share threshold come back with EXACT
        counts; below-threshold and long-tail values don't; result
        identical at any parallelism (the sketch only prunes)."""
        from cubes_spark.functions.sketches import frequent_items

        rows = ([("a",)] * 300 + [("b",)] * 150 + [("c",)] * 60
                + [(f"tail{i}",) for i in range(490)])
        df = spark.createDataFrame(rows, "v string")
        for parts in (1, 37):
            out = {r["value"]: (r["n"], r["share_ppm"]) for r in
                   frequent_items(df.repartition(parts), "v",
                                  min_share_ppm=100_000).collect()}
            assert out == {"a": (300, 300_000), "b": (150, 150_000)}

    def test_candidate_completeness_small_capacity(self, spark):
        """The MG guarantee: every value with share >= threshold
        survives phase 1 even with the minimum capacity and an
        adversarial long tail spread over many partitions."""
        import random

        from cubes_spark.functions.sketches import frequent_items

        rng = random.Random(7)
        heavy = [("H1",)] * 120 + [("H2",)] * 75
        tail = [(f"t{rng.randrange(10_000)}",) for _ in range(805)]
        rows = heavy + tail
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "v string").repartition(23)
        out = {r["value"]: r["n"] for r in
               frequent_items(df, "v", min_share_ppm=70_000)
               .collect()}
        assert out["H1"] == 120 and out["H2"] == 75
        # brute-force check: nothing >= 7% was missed
        exact = {r["v"]: r["n"] for r in
                 df.groupBy("v").count().withColumnRenamed(
                     "count", "n").collect()}
        want = {v for v, n in exact.items()
                if 1_000_000 * n // 1000 >= 70_000}
        assert set(out) == want
