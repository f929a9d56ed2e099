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
