"""TPC-H-shaped queries: hand-computed values + plan-shape asserts."""

import datetime as dt

from cubes_spark.operators.tpch import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier_volume,
)


def _li(spark, rows):
    return spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_quantity double, "
              "l_extendedprice double, l_discount double, "
              "l_tax double, l_returnflag string, "
              "l_linestatus string, l_shipdate timestamp")


def test_q1_hand_computed(spark):
    d = dt.datetime(1996, 1, 1)
    late = dt.datetime(1999, 1, 1)          # past the cutoff: excluded
    rows = [
        (1, 1, 2.0, 10.0, 0.10, 0.05, "A", "F", d),
        (2, 1, 3.0, 20.0, 0.00, 0.00, "A", "F", d),
        (3, 1, 9.0, 99.0, 0.10, 0.10, "A", "F", late),
    ]
    out = q1_pricing_summary(_li(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["count_order"] == 2
    assert r["sum_qty_cents"] == 500
    assert r["sum_base_price_cents"] == 3000
    # disc_price: 1000*90 + 2000*100 = 290000 (1e-4 dollars = $29.0)
    assert r["sum_disc_price_e4"] == 290000
    # charge: 1000*90*105 + 2000*100*100 = 9450000+20000000
    assert r["sum_charge_e6"] == 29450000
    assert r["avg_qty_cents"] == 250
    assert r["avg_disc_pct"] == 5


def test_q3_top_n_and_tiebreak(spark):
    d_in = dt.datetime(1996, 1, 1)
    ship = dt.datetime(1996, 6, 1)
    cust = spark.createDataFrame(
        [(1, "BUILDING"), (2, "AUTOMOBILE")],
        "c_custkey long, c_mktsegment string")
    orders = spark.createDataFrame(
        [(10, 1, d_in, "1-URGENT"), (11, 1, d_in, "5-LOW"),
         (12, 2, d_in, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_orderpriority string")
    rows = [
        (10, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ship),
        (11, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ship),   # tie revenue
        (12, 2, 1.0, 99.0, 0.0, 0.0, "N", "O", ship),   # wrong segment
    ]
    out = q3_shipping_priority(cust, orders, _li(spark, rows),
                               top_n=10).collect()
    keys = [r["l_orderkey"] for r in out]
    assert keys == [10, 11]                  # tie -> orderkey asc
    assert all(r["revenue_e4"] == 100000 for r in out)


def test_q5_local_chain_only(spark):
    d_in = dt.datetime(1996, 6, 1)
    cust = spark.createDataFrame(
        [(1, 100), (2, 200)],
        "c_custkey long, c_nationkey long")
    supp = spark.createDataFrame(
        [(7, 100), (8, 300)],
        "s_suppkey long, s_nationkey long")
    nation = spark.createDataFrame(
        [(100, "JAPAN", 5), (200, "CHINA", 5), (300, "FRANCE", 6)],
        "n_nationkey long, n_name string, n_regionkey long")
    region = spark.createDataFrame(
        [(5, "ASIA"), (6, "EUROPE")],
        "r_regionkey long, r_name string")
    orders = spark.createDataFrame(
        [(10, 1, d_in, "1-URGENT"), (11, 2, d_in, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_orderpriority string")
    rows = [
        (10, 7, 1.0, 10.0, 0.0, 0.0, "N", "O", d_in),  # local: JP-JP
        (10, 8, 1.0, 10.0, 0.0, 0.0, "N", "O", d_in),  # supp FRANCE
        (11, 7, 1.0, 10.0, 0.0, 0.0, "N", "O", d_in),  # cust CN supp JP
    ]
    out = q5_local_supplier_volume(cust, orders, _li(spark, rows),
                                   supp, nation, region).collect()
    assert len(out) == 1
    assert out[0]["n_name"] == "JAPAN"
    assert out[0]["revenue_e4"] == 100000
    assert out[0]["n_lineitems"] == 1


def test_q5_plan_broadcasts_dimensions(spark):
    import __spark_entry__ as e
    df = e.queries()["tpch_q5"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastExchange") >= 3
    assert "CartesianProduct" not in plan


def test_q18_semi_join_threshold(spark):
    d = dt.datetime(1996, 1, 1)
    from cubes_spark.operators.tpch import q18_large_volume_customers
    cust = spark.createDataFrame(
        [(1, "alice", 0, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    orders = spark.createDataFrame(
        [(10, 1, "O", 100.0, d, "1-URGENT"),
         (11, 1, "O", 100.0, d, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    rows = [
        (10, 1, 150.0, 1.0, 0.0, 0.0, "N", "O", d),
        (10, 1, 100.0, 1.0, 0.0, 0.0, "N", "O", d),  # 250 qty > 200
        (11, 1, 50.0, 1.0, 0.0, 0.0, "N", "O", d),   # under
    ]
    out = q18_large_volume_customers(cust, orders, _li(spark, rows),
                                     min_qty_cents=20000).collect()
    assert len(out) == 1
    assert out[0]["o_orderkey"] == 10
    assert out[0]["total_qty_cents"] == 25000


def test_q7_excludes_same_nation(spark):
    d = dt.datetime(1996, 6, 1)
    from cubes_spark.operators.tpch import q7_volume_shipping
    cust = spark.createDataFrame(
        [(1, 100), (2, 200)], "c_custkey long, c_nationkey long")
    supp = spark.createDataFrame(
        [(7, 100), (8, 200)], "s_suppkey long, s_nationkey long")
    nation = spark.createDataFrame(
        [(100, "NATION_1", 0), (200, "NATION_2", 0)],
        "n_nationkey long, n_name string, n_regionkey long")
    orders = spark.createDataFrame(
        [(10, 1, d, "1-URGENT"), (11, 2, d, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_orderpriority string")
    rows = [
        (10, 7, 1.0, 10.0, 0.0, 0.0, "N", "O", d),   # N1 -> N1: same
        (10, 8, 1.0, 10.0, 0.0, 0.0, "N", "O", d),   # N2 supp, N1 cust
        (11, 7, 1.0, 30.0, 0.0, 0.0, "N", "O", d),   # N1 supp, N2 cust
    ]
    out = {(r["supp_nation"], r["cust_nation"]): r for r in
           q7_volume_shipping(cust, orders, _li(spark, rows), supp,
                              nation).collect()}
    assert set(out) == {("NATION_2", "NATION_1"),
                        ("NATION_1", "NATION_2")}
    assert out[("NATION_1", "NATION_2")]["revenue_e4"] == 300000


def test_q13_zero_order_customers_appear(spark):
    d = dt.datetime(1996, 1, 1)
    from cubes_spark.operators.tpch import q13_customer_distribution
    cust = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long")
    orders = spark.createDataFrame(
        [(10, 1, d, "1-URGENT"), (11, 1, d, "2-HIGH"),
         (12, 2, d, "5-LOW")],          # excluded priority
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_orderpriority string")
    out = {r["c_count"]: r["custdist"] for r in
           q13_customer_distribution(cust, orders).collect()}
    # cust1: 2 kept orders; cust2: only the excluded one -> 0; cust3: 0
    assert out == {2: 1, 0: 2}


def test_q22_anti_join_and_threshold(spark):
    d = dt.datetime(1996, 1, 1)
    from cubes_spark.operators.tpch import q22_global_sales_opportunity
    cust = spark.createDataFrame(
        [(10, 5.0), (11, 1.0), (12, -2.0), (40, 100.0)],
        "c_custkey long, c_acctbal double")
    # avg over positive balances in segments 1..3: (500+100)/2 = 300
    orders = spark.createDataFrame(
        [(99, 11, d, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_orderpriority string")
    out = q22_global_sales_opportunity(cust, orders).collect()
    # cust 40 out of segment; cust 12 negative; cust 11 below avg
    # (and ordered); cust 10 bal 500 > 300 and never ordered
    assert len(out) == 1
    assert out[0]["cntrycode"] == "1"
    assert out[0]["numcust"] == 1
    assert out[0]["totacctbal_cents"] == 500


def test_q6_integer_discount_band(spark):
    d = dt.datetime(1996, 6, 1)
    from cubes_spark.operators.tpch import q6_forecast_revenue
    rows = [
        (1, 1, 10.0, 100.0, 0.05, 0.0, "N", "O", d),   # in band
        (2, 1, 10.0, 100.0, 0.07, 0.0, "N", "O", d),   # in band
        (3, 1, 10.0, 100.0, 0.08, 0.0, "N", "O", d),   # above
        (4, 1, 30.0, 100.0, 0.06, 0.0, "N", "O", d),   # qty too big
    ]
    r = q6_forecast_revenue(_li(spark, rows)).collect()[0]
    assert r["n_lineitems"] == 2
    # 10000 cents * (5 + 7)
    assert r["revenue_e4"] == 10000 * 12


def test_q14_share(spark):
    d = dt.datetime(1996, 1, 15)
    from cubes_spark.operators.tpch import q14_promo_effect
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "STANDARD")],
        "p_partkey long, p_type string")
    li = spark.createDataFrame(
        [(1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", d),
         (2, 2, 1, 1.0, 30.0, 0.0, 0.0, "N", "O", d)],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    r = q14_promo_effect(li, part).collect()[0]
    assert r["promo_share_ppm"] == 250000


# ---------------------------------------------------------------------------
# Round-10 additions: Q2/Q9/Q11/Q15/Q16/Q17/Q19/Q20/Q21
# ---------------------------------------------------------------------------


def _lip(spark, rows):
    """lineitem fixture WITH part key (the round-10 queries join part)."""
    return spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long, "
              "l_quantity double, l_extendedprice double, "
              "l_discount double, l_returnflag string, "
              "l_shipdate timestamp")


def _part(spark, rows):
    return spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, "
              "p_type string, p_size int, p_retailprice double")


def _supp(spark, rows):
    return spark.createDataFrame(
        rows, "s_suppkey long, s_name string, s_nationkey int, "
              "s_acctbal double")


def _nat(spark):
    return spark.createDataFrame(
        [(0, "NATION_0", 0), (1, "NATION_1", 0), (2, "NATION_2", 1)],
        "n_nationkey int, n_name string, n_regionkey int")


def _reg(spark):
    return spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")],
        "r_regionkey int, r_name string")


def test_q2_min_cost_ties_surface(spark):
    from cubes_spark.operators.tpch import q2_min_cost_supplier
    d = dt.datetime(1996, 1, 1)
    # suppliers 1,2 both offer part 100 at unit cost $5; supplier 3
    # at $9 — both min-cost suppliers must surface, the higher not.
    rows = [
        (1, 100, 1, 2.0, 10.0, 0.0, "N", d),
        (2, 100, 2, 4.0, 20.0, 0.0, "N", d),
        (3, 100, 3, 1.0, 9.0, 0.0, "N", d),
    ]
    part = _part(spark, [(100, "x", "Brand#1", "MEDIUM", 15, 900.0)])
    supp = _supp(spark, [(1, "s1", 0, 10.0), (2, "s2", 1, 20.0),
                         (3, "s3", 0, 30.0)])
    out = q2_min_cost_supplier(part, supp, _lip(spark, rows),
                               _nat(spark), _reg(spark)).collect()
    assert sorted(r["s_name"] for r in out) == ["s1", "s2"]
    assert all(r["supplycost_e4"] == 50000 for r in out)


def test_q2_min_scoped_to_region(spark):
    from cubes_spark.operators.tpch import q2_min_cost_supplier
    d = dt.datetime(1996, 1, 1)
    # the cheapest offer is from a EUROPE supplier; within ASIA the
    # min is the ASIA offer — region scoping happens BEFORE the min.
    rows = [
        (1, 100, 1, 1.0, 9.0, 0.0, "N", d),    # ASIA, $9
        (2, 100, 2, 1.0, 5.0, 0.0, "N", d),    # EUROPE, $5
    ]
    part = _part(spark, [(100, "x", "Brand#1", "MEDIUM", 15, 900.0)])
    supp = _supp(spark, [(1, "s1", 0, 10.0), (2, "s2", 2, 20.0)])
    out = q2_min_cost_supplier(part, supp, _lip(spark, rows),
                               _nat(spark), _reg(spark),
                               region_name="ASIA").collect()
    assert [r["s_name"] for r in out] == ["s1"]
    assert out[0]["supplycost_e4"] == 90000


def test_q17_exact_20pct_boundary(spark):
    from cubes_spark.operators.tpch import q17_small_quantity_revenue
    d = dt.datetime(1996, 1, 1)
    # part 100: quantities 1, 2, 27 -> sum 30, n 3, avg 10; 20% of
    # avg = 2.  qty 1 qualifies (100*5*3 = 1500 < 3000 cents); qty 2
    # is EXACTLY at the bound (3000 < 3000 false) -> excluded
    # (strict <, matching the published < 0.2*avg).
    rows = [
        (1, 100, 1, 1.0, 11.0, 0.0, "N", d),
        (2, 100, 1, 2.0, 13.0, 0.0, "N", d),
        (3, 100, 1, 27.0, 17.0, 0.0, "N", d),
    ]
    part = _part(spark, [(100, "x", "Brand#3", "MEDIUM", 1, 900.0)])
    out = q17_small_quantity_revenue(part, _lip(spark, rows)).collect()[0]
    assert out["n_small_lineitems"] == 1
    assert out["total_price_cents"] == 1100
    assert out["avg_yearly_cents"] == 1100 // 7


def test_q20_dominance_strictly_over_half(spark):
    from cubes_spark.operators.tpch import q20_potential_promotion
    d = dt.datetime(1996, 6, 1)
    # part 100: s1 ships 6 of 10 (dominant); part 200: s2 ships
    # exactly half (5 of 10) — NOT dominant (strict >).
    rows = [
        (1, 100, 1, 6.0, 1.0, 0.0, "N", d),
        (2, 100, 2, 4.0, 1.0, 0.0, "N", d),
        (3, 200, 2, 5.0, 1.0, 0.0, "N", d),
        (4, 200, 3, 5.0, 1.0, 0.0, "N", d),
    ]
    part = _part(spark, [(100, "red a", "B", "T", 1, 1.0),
                         (200, "red b", "B", "T", 1, 1.0)])
    supp = _supp(spark, [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0),
                         (3, "s3", 0, 0.0)])
    out = q20_potential_promotion(
        part, supp, _lip(spark, rows), _nat(spark),
        nation_name="NATION_0").collect()
    assert [r["s_name"] for r in out] == ["s1"]


def test_q21_sole_failing_supplier_only(spark):
    from cubes_spark.operators.tpch import q21_suppliers_kept_waiting
    d = dt.datetime(1996, 1, 1)
    orders = spark.createDataFrame(
        [(10, 1, "F", 1.0, d, "1-URGENT"),
         (11, 1, "F", 1.0, d, "1-URGENT"),
         (12, 1, "F", 1.0, d, "1-URGENT"),
         (13, 1, "O", 1.0, d, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    rows = [
        # order 10: s1 failed, s2 fine -> s1 waits
        (10, 1, 1, 1.0, 1.0, 0.0, "R", d),
        (10, 1, 2, 1.0, 1.0, 0.0, "N", d),
        # order 11: both failed -> nobody waits (not sole)
        (11, 1, 1, 1.0, 1.0, 0.0, "R", d),
        (11, 1, 2, 1.0, 1.0, 0.0, "R", d),
        # order 12: single-supplier order -> excluded (no other supp)
        (12, 1, 1, 1.0, 1.0, 0.0, "R", d),
        # order 13: not finished -> excluded
        (13, 1, 1, 1.0, 1.0, 0.0, "R", d),
        (13, 1, 2, 1.0, 1.0, 0.0, "N", d),
    ]
    supp = _supp(spark, [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0)])
    out = q21_suppliers_kept_waiting(
        supp, _lip(spark, rows), orders, _nat(spark),
        nation_name="NATION_0").collect()
    assert [(r["s_name"], r["numwait"]) for r in out] == [("s1", 1)]


def test_q16_complaint_suppliers_excluded(spark):
    from cubes_spark.operators.tpch import (
        q16_parts_supplier_relationship)
    d = dt.datetime(1996, 1, 1)
    rows = [
        (1, 100, 1, 1.0, 1.0, 0.0, "N", d),
        (2, 100, 2, 1.0, 1.0, 0.0, "N", d),   # s2: negative balance
        (3, 100, 1, 1.0, 1.0, 0.0, "N", d),   # dup pair: distinct
    ]
    part = _part(spark, [(100, "x", "Brand#1", "SMALL", 5, 1.0)])
    supp = _supp(spark, [(1, "s1", 0, 1.0), (2, "s2", 0, -1.0)])
    out = q16_parts_supplier_relationship(
        part, supp, _lip(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["supplier_cnt"] == 1


def test_q11_threshold_strict(spark):
    from cubes_spark.operators.tpch import q11_important_stock
    d = dt.datetime(1996, 1, 1)
    # values: part 100 -> $8, part 200 -> $2; total $10.
    # threshold at 200000 ppm (20%): $2 NOT > $2 -> only part 100.
    rows = [
        (1, 100, 1, 1.0, 8.0, 0.0, "N", d),
        (2, 200, 1, 1.0, 2.0, 0.0, "N", d),
    ]
    supp = _supp(spark, [(1, "s1", 0, 0.0)])
    out = q11_important_stock(supp, _lip(spark, rows), _nat(spark),
                              nation_name="NATION_0",
                              fraction_ppm=200000).collect()
    assert [(r["l_partkey"], r["value_e4"]) for r in out] == \
        [(100, 80000)]


def test_q15_max_revenue_ties(spark):
    from cubes_spark.operators.tpch import q15_top_supplier
    d = dt.datetime(1996, 2, 1)
    rows = [
        (1, 100, 1, 1.0, 10.0, 0.0, "N", d),
        (2, 100, 2, 1.0, 10.0, 0.0, "N", d),   # tie at max
        (3, 100, 3, 1.0, 5.0, 0.0, "N", d),
    ]
    supp = _supp(spark, [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0),
                         (3, "s3", 0, 0.0)])
    out = q15_top_supplier(supp, _lip(spark, rows)).collect()
    assert [r["s_suppkey"] for r in out] == [1, 2]
    assert all(r["total_revenue_e4"] == 100000 for r in out)


def test_q19_disjunctive_branches(spark):
    from cubes_spark.operators.tpch import q19_discounted_revenue
    d = dt.datetime(1996, 1, 1)
    rows = [
        (1, 100, 1, 5.0, 10.0, 0.0, "N", d),    # branch1 hit
        (2, 100, 1, 50.0, 10.0, 0.0, "N", d),   # qty out of band
        (3, 200, 1, 25.0, 20.0, 0.0, "N", d),   # branch3 hit
        (4, 300, 1, 25.0, 30.0, 0.0, "N", d),   # size out of band
    ]
    part = _part(spark, [
        (100, "a", "Brand#1", "T", 3, 1.0),
        (200, "b", "Brand#3", "T", 12, 1.0),
        (300, "c", "Brand#3", "T", 40, 1.0)])
    out = q19_discounted_revenue(part, _lip(spark, rows)).collect()[0]
    assert out["n_lineitems"] == 2
    assert out["revenue_e4"] == (1000 + 2000) * 100


def test_q9_profit_sign(spark):
    from cubes_spark.operators.tpch import q9_product_type_profit
    d = dt.datetime(1996, 5, 1)
    orders = spark.createDataFrame(
        [(1, 1, "O", 1.0, d, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    # revenue 10.00 * (100-0) = 100000 e4$; cost 2.00 * qty 3.00
    # -> 200*300 = 60000 e4$ -> profit 40000 e4$ = $4
    rows = [(1, 100, 1, 3.0, 10.0, 0.0, "N", d)]
    part = _part(spark, [(100, "steel bolt", "B", "T", 1, 2.0)])
    supp = _supp(spark, [(1, "s1", 1, 0.0)])
    out = q9_product_type_profit(part, supp, _lip(spark, rows),
                                 orders, _nat(spark)).collect()
    assert [(r["nation"], r["o_year"], r["profit_e4"]) for r in out] \
        == [("NATION_1", 1996, 40000)]


# ---------------------------------------------------------------------------
# Decorrelation equivalence: the round-10 aggregate+join-back rewrites
# must equal the published CORRELATED formulations on arbitrary data —
# DuckDB executes the correlated subquery form directly on the same
# rows (hypothesis drives the fixtures).
# ---------------------------------------------------------------------------

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PROP = dict(max_examples=12, deadline=None,
             suppress_health_check=[
                 HealthCheck.too_slow,
                 HealthCheck.function_scoped_fixture])

_li_rows = st.lists(
    st.tuples(st.integers(1, 6),       # orderkey
              st.integers(1, 4),       # partkey
              st.integers(1, 3),       # suppkey
              st.integers(1, 9),       # quantity
              st.integers(1, 50),      # price dollars
              st.sampled_from("RNA")), # returnflag
    min_size=1, max_size=24)


def _lip_from(spark, rows):
    d = dt.datetime(1996, 1, 1)
    return _lip(spark, [
        (ok, pk, sk, float(q), float(pr), 0.0, rf, d)
        for ok, pk, sk, q, pr, rf in rows])


class TestDecorrelationEquivalence:
    @given(rows=_li_rows)
    @settings(**_PROP)
    def test_q17_equals_correlated_form(self, spark, rows):
        from cubes_spark.operators.tpch import (
            q17_small_quantity_revenue)
        part = _part(spark, [(pk, "x", "Brand#3", "T", 1, 1.0)
                             for pk in {r[1] for r in rows}])
        got = q17_small_quantity_revenue(
            part, _lip_from(spark, rows)).collect()[0]
        li = pd.DataFrame(
            [(r[1], r[3] * 100, r[4] * 100) for r in rows],
            columns=["pk", "q", "pr"])
        con = duckdb.connect()
        con.register("li", li)
        # the published correlated scalar subquery (qty < 0.2·avg),
        # executed directly in its exact cross-multiplied strict form
        want_n = con.execute("""
            SELECT count(*), coalesce(sum(pr), 0)
            FROM li l
            WHERE CAST(l.q AS HUGEINT) * 5
                  * (SELECT count(*) FROM li i WHERE i.pk = l.pk)
                  < (SELECT sum(q) FROM li i WHERE i.pk = l.pk)
        """).fetchone()
        assert got["n_small_lineitems"] == want_n[0]
        assert (got["total_price_cents"] or 0) == want_n[1]

    @given(rows=_li_rows)
    @settings(**_PROP)
    def test_q21_equals_exists_form(self, spark, rows):
        from cubes_spark.operators.tpch import (
            q21_suppliers_kept_waiting)
        d = dt.datetime(1996, 1, 1)
        orders = spark.createDataFrame(
            [(ok, 1, "F", 1.0, d, "1-URGENT")
             for ok in {r[0] for r in rows}],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string")
        supp = _supp(spark, [(sk, f"s{sk}", 0, 0.0)
                             for sk in {r[2] for r in rows}])
        got = {(r["s_name"], r["numwait"]) for r in
               q21_suppliers_kept_waiting(
                   supp, _lip_from(spark, rows), orders,
                   _nat(spark), nation_name="NATION_0").collect()}
        li = pd.DataFrame(
            [(r[0], r[2], r[5]) for r in rows],
            columns=["ok", "sk", "rf"])
        con = duckdb.connect()
        con.register("li", li)
        # the published EXISTS + NOT-EXISTS correlated form
        want = {(f"s{sk}", n) for sk, n in con.execute("""
            SELECT l1.sk, count(DISTINCT l1.ok)
            FROM (SELECT DISTINCT ok, sk FROM li
                  WHERE rf = 'R') l1
            WHERE EXISTS (SELECT 1 FROM li l2
                          WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
              AND NOT EXISTS (SELECT 1 FROM li l3
                              WHERE l3.ok = l1.ok
                                AND l3.sk <> l1.sk
                                AND l3.rf = 'R')
            GROUP BY 1
        """).fetchall()}
        assert got == want

    @given(rows=_li_rows)
    @settings(**_PROP)
    def test_q20_equals_correlated_half(self, spark, rows):
        from cubes_spark.operators.tpch import q20_potential_promotion
        part = _part(spark, [(pk, "red x", "B", "T", 1, 1.0)
                             for pk in {r[1] for r in rows}])
        supp = _supp(spark, [(sk, f"s{sk}", 0, 0.0)
                             for sk in {r[2] for r in rows}])
        got = {r["s_suppkey"] for r in q20_potential_promotion(
            part, supp, _lip_from(spark, rows), _nat(spark),
            nation_name="NATION_0").collect()}
        li = pd.DataFrame(
            [(r[1], r[2], r[3] * 100) for r in rows],
            columns=["pk", "sk", "q"])
        con = duckdb.connect()
        con.register("li", li)
        want = {sk for (sk,) in con.execute("""
            SELECT DISTINCT p.sk
            FROM (SELECT pk, sk, sum(q) AS sq FROM li
                  GROUP BY 1, 2) p
            WHERE CAST(p.sq AS HUGEINT) * 2 >
                  (SELECT sum(q) FROM li i WHERE i.pk = p.pk)
        """).fetchall()}
        assert got == want
