"""TPC-H-shaped benchmark queries, Spark-first and integer-exact.

The canonical analytics join/aggregation shapes (TPC-H Q1 pricing
summary, Q3 shipping priority, Q5 local supplier volume) expressed as
DataFrame plans over the repo's star tables — the parity proof that
the engine's raw-DataFrame layer (not just the cubes browser) handles
the standard warehouse benchmark idiomatically:

- only the GENUINELY BOUNDED dimensions (nation, region — fixed
  25/5 rows at any scale factor) carry an explicit ``broadcast()``
  hint; customer/supplier/orders SCALE with the data volume, so
  their joins are left unhinted and Catalyst/AQE picks broadcast at
  small SF and sort-merge at large SF (a forced broadcast of a
  scaling table OOMs the moment the data grows — measured: 1.5M-row
  customer at a 10x replica);
- all money arithmetic is INTEGER: price in cents, discount/tax in
  integer percent points (``round(x*100)``), so
  ``disc_price = price_cents·(100−dc)`` (10⁻⁴ dollar units) and
  ``charge = price_cents·(100−dc)·(100+tc)`` (10⁻⁶ dollar units) are
  exact decimal(38,0) sums a SQL oracle replays bit-for-bit — a
  double ``sum(l_extendedprice*(1-l_discount))`` is partition-order
  dependent and can never be driver-hash-exact;
- averages are truncating integer divs of the exact sums.

Schema deltas vs published TPC-H: the test star has no
``o_shippriority`` (Q3 groups on ``o_orderpriority`` instead) and no
``l_commitdate``/``l_receiptdate`` (Q4/Q12 family out of scope);
date windows are shifted into the generated 1995–2001 range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["q1_pricing_summary", "q3_shipping_priority",
           "q5_local_supplier_volume", "q7_volume_shipping",
           "q10_returned_items", "q18_large_volume_customers",
           "q13_customer_distribution", "q22_global_sales_opportunity",
           "q6_forecast_revenue", "q8_market_share", "q14_promo_effect"]

_DEC = "decimal(38,0)"


def _cents(col):
    return F.round(col * 100).cast("long")


def q1_pricing_summary(lineitem: DataFrame,
                       ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1: pricing summary report per (returnflag, linestatus)
    for lineitems shipped on or before the cutoff.  One map-side
    combinable aggregation after a sargable date filter (the
    predicate reaches the parquet scan); no joins, no windows.
    """
    li = lineitem.filter(
        F.to_date("l_shipdate") <= F.lit(ship_cutoff).cast("date"))
    qty = _cents(F.col("l_quantity"))
    price = _cents(F.col("l_extendedprice"))
    dc = F.round(F.col("l_discount") * 100).cast("long")
    tc = F.round(F.col("l_tax") * 100).cast("long")
    disc_price = price.cast(_DEC) * (100 - dc)
    charge = price.cast(_DEC) * (100 - dc) * (100 + tc)
    out = (li.groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum(qty).cast("long").alias("sum_qty_cents"),
                F.sum(price).cast("long").alias("sum_base_price_cents"),
                F.sum(disc_price).cast(_DEC).alias("__sdp__"),
                F.sum(charge).cast(_DEC).alias("__sch__"),
                F.sum(dc).cast("long").alias("__sdc__"),
                F.count(F.lit(1)).cast("long").alias("count_order")))
    return out.select(
        "l_returnflag", "l_linestatus", "sum_qty_cents",
        "sum_base_price_cents",
        F.col("__sdp__").cast("long").alias("sum_disc_price_e4"),
        F.col("__sch__").cast("long").alias("sum_charge_e6"),
        F.expr("sum_qty_cents div count_order").cast("long")
        .alias("avg_qty_cents"),
        F.expr("sum_base_price_cents div count_order").cast("long")
        .alias("avg_price_cents"),
        F.expr("__sdc__ div count_order").cast("long")
        .alias("avg_disc_pct"),
        "count_order")


def q3_shipping_priority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame,
                         segment: str = "BUILDING",
                         cutoff: str = "1996-03-15",
                         top_n: int = 10) -> DataFrame:
    """TPC-H Q3: unshipped-order revenue for one market segment —
    orders placed before the cutoff with lineitems shipped after it,
    top-N by revenue.  The segment-filtered customer join is left to
    AQE (customer scales with SF — broadcast at small scale,
    sort-merge at large); the top-N is
    a TakeOrdered with a full deterministic tiebreak (revenue desc,
    orderdate asc, orderkey asc), never a global sort.
    """
    cust = customer.filter(F.col("c_mktsegment") == segment) \
        .select("c_custkey")
    ords = orders.filter(
        F.to_date("o_orderdate") < F.lit(cutoff).cast("date"))
    li = lineitem.filter(
        F.to_date("l_shipdate") > F.lit(cutoff).cast("date"))
    price = _cents(F.col("l_extendedprice"))
    dc = F.round(F.col("l_discount") * 100).cast("long")
    rev = price.cast(_DEC) * (100 - dc)
    joined = (li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
              .join(cust, ords["o_custkey"] == cust["c_custkey"]))
    agg = (joined.groupBy("l_orderkey", "o_orderdate",
                          "o_orderpriority")
           .agg(F.sum(rev).cast("long").alias("revenue_e4")))
    return (agg.orderBy(F.col("revenue_e4").desc(),
                        F.col("o_orderdate"), F.col("l_orderkey"))
            .limit(top_n))


def q5_local_supplier_volume(customer: DataFrame, orders: DataFrame,
                             lineitem: DataFrame, supplier: DataFrame,
                             nation: DataFrame, region: DataFrame,
                             region_name: str = "ASIA",
                             date_from: str = "1996-01-01",
                             date_to: str = "1997-01-01") -> DataFrame:
    """TPC-H Q5: revenue per nation from LOCAL supply chains (the
    customer's nation equals the supplier's nation) within one
    region and order-date year.  Only the bounded nation⋈region side
    is force-broadcast; customer and supplier joins are AQE-decided
    (they scale with SF).  At large scale the plan is sort-merge
    joins on the order/customer/supplier keys plus the nation-grain
    aggregation.
    """
    nr = (nation.join(F.broadcast(
        region.filter(F.col("r_name") == region_name)),
        nation["n_regionkey"] == region["r_regionkey"])
        .select("n_nationkey", "n_name"))
    ords = orders.filter(
        (F.to_date("o_orderdate") >= F.lit(date_from).cast("date"))
        & (F.to_date("o_orderdate") < F.lit(date_to).cast("date")))
    price = _cents(F.col("l_extendedprice"))
    dc = F.round(F.col("l_discount") * 100).cast("long")
    rev = price.cast(_DEC) * (100 - dc)
    joined = (lineitem
              .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
              .join(customer,
                    F.col("o_custkey") == F.col("c_custkey"))
              .join(supplier,
                    (F.col("l_suppkey") == F.col("s_suppkey"))
                    & (F.col("s_nationkey") == F.col("c_nationkey")))
              .join(F.broadcast(nr),
                    F.col("c_nationkey") == F.col("n_nationkey")))
    return (joined.groupBy("n_name")
            .agg(F.sum(rev).cast("long").alias("revenue_e4"),
                 F.count(F.lit(1)).cast("long").alias("n_lineitems")))


def q7_volume_shipping(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, supplier: DataFrame,
                       nation: DataFrame,
                       nation_a: str = "NATION_1",
                       nation_b: str = "NATION_2",
                       year_from: int = 1996,
                       year_to: int = 1997) -> DataFrame:
    """TPC-H Q7: trade volume between two nations per (supplier
    nation, customer nation, ship year) — the classic bidirectional
    nation-pair filter ((A,B) or (B,A)).  Both nation-scoped
    dimension sides broadcast; one fact shuffle for lineitem⋈orders,
    one 3-key grain aggregation.
    """
    nat = nation.filter(F.col("n_name").isin([nation_a, nation_b]))
    supp = (supplier.join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("sk"),
                               F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sk"))
        .select("s_suppkey", "supp_nation"))
    cust = (customer.join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("ck"),
                               F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("ck"))
        .select("c_custkey", "cust_nation"))
    li = lineitem.filter(
        (F.year("l_shipdate") >= year_from)
        & (F.year("l_shipdate") <= year_to))
    price = _cents(F.col("l_extendedprice"))
    dc = F.round(F.col("l_discount") * 100).cast("long")
    rev = price.cast(_DEC) * (100 - dc)
    joined = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
              .join(cust, F.col("o_custkey") == F.col("c_custkey"))
              .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
              .filter(F.col("supp_nation") != F.col("cust_nation")))
    return (joined.groupBy("supp_nation", "cust_nation",
                           F.year("l_shipdate").cast("long")
                           .alias("l_year"))
            .agg(F.sum(rev).cast("long").alias("revenue_e4")))


def q10_returned_items(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, nation: DataFrame,
                       date_from: str = "1996-01-01",
                       date_to: str = "1996-04-01",
                       top_n: int = 20) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in one
    order-date quarter (l_returnflag = 'R') — bounded nation
    broadcast, AQE-decided customer join, shuffle lineitem⋈orders on
    the order key, customer-grain aggregation, top-N TakeOrdered
    with deterministic tiebreak (revenue desc, custkey asc).
    """
    ords = orders.filter(
        (F.to_date("o_orderdate") >= F.lit(date_from).cast("date"))
        & (F.to_date("o_orderdate") < F.lit(date_to).cast("date")))
    li = lineitem.filter(F.col("l_returnflag") == "R")
    price = _cents(F.col("l_extendedprice"))
    dc = F.round(F.col("l_discount") * 100).cast("long")
    rev = price.cast(_DEC) * (100 - dc)
    joined = (li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
              .join(customer,
                    F.col("o_custkey") == F.col("c_custkey"))
              .join(F.broadcast(nation),
                    F.col("c_nationkey") == F.col("n_nationkey")))
    agg = (joined.groupBy("c_custkey", "c_name", "n_name")
           .agg(F.sum(rev).cast("long").alias("revenue_e4"),
                F.count(F.lit(1)).cast("long").alias("n_items")))
    return (agg.orderBy(F.col("revenue_e4").desc(),
                        F.col("c_custkey")).limit(top_n))


def q18_large_volume_customers(customer: DataFrame, orders: DataFrame,
                               lineitem: DataFrame,
                               min_qty_cents: int = 20000
                               ) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold,
    with their customers — the aggregate-then-semi-join pattern: the
    qualifying order keys come from ONE order-grain aggregation
    (map-side combinable), and only those orders rejoin customer
    (AQE-decided — the qualifying set is small, so it usually IS a
    broadcast, but by measurement, not by force) — the fact table is
    never joined before the reduction.
    """
    qty = (lineitem.groupBy("l_orderkey")
           .agg(F.sum(_cents(F.col("l_quantity"))).cast("long")
                .alias("total_qty_cents"))
           .filter(F.col("total_qty_cents") > int(min_qty_cents)))
    joined = (qty.join(orders,
                       F.col("l_orderkey") == F.col("o_orderkey"))
              .join(customer,
                    F.col("o_custkey") == F.col("c_custkey")))
    return joined.select(
        "c_custkey", "c_name", "o_orderkey",
        F.to_date("o_orderdate").alias("o_orderdate"),
        _cents(F.col("o_totalprice")).alias("o_totalprice_cents"),
        "total_qty_cents")


def q13_customer_distribution(customer: DataFrame, orders: DataFrame,
                              exclude_priority: str = "5-LOW"
                              ) -> DataFrame:
    """TPC-H Q13: the distribution of customers by order count — a
    LEFT OUTER join (customers with no orders must appear at count
    0) followed by two stacked aggregations (per-customer count,
    then histogram of counts).  The published query's comment-filter
    becomes an order-priority exclusion (the test star has no
    o_comment).

    Scale shape: one shuffle per aggregation; the outer join keys on
    the customer key with the ORDER side filtered first.
    """
    ords = orders.filter(
        F.col("o_orderpriority") != exclude_priority)
    per_cust = (customer.join(
        ords, customer["c_custkey"] == ords["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).cast("long").alias("custdist")))


def q22_global_sales_opportunity(customer: DataFrame,
                                 orders: DataFrame,
                                 prefix_digits=("1", "2", "3")
                                 ) -> DataFrame:
    """TPC-H Q22: well-funded customers (account balance above the
    positive-balance average of their segment group) who have never
    ordered — the scalar-subquery + ANTI-JOIN pattern.  Segments are
    the leading digit of the customer key (the star has no phone
    column); the average is an exact truncating div of cent sums,
    computed once and broadcast; the never-ordered test is a
    left_anti join against the orders key.

    Scale shape: two passes over customer (one for the global
    average on the filtered segment set, one for the main scan), one
    anti-join shuffle against the DISTINCT order customer keys.
    """
    seg = F.substring(F.col("c_custkey").cast("string"), 1, 1)
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    scoped = (customer.filter(seg.isin(list(prefix_digits)))
              .select(F.col("c_custkey"), seg.alias("cntrycode"),
                      cents.alias("__bal__")))
    avg_row = (scoped.filter(F.col("__bal__") > 0)
               .agg(F.sum("__bal__").alias("s"),
                    F.count(F.lit(1)).alias("n")).first())
    if not avg_row["n"]:
        return scoped.sparkSession.createDataFrame(
            [], "cntrycode string, numcust long, totacctbal_cents long")
    avg_cents = int(avg_row["s"]) // int(avg_row["n"])
    buyers = orders.select(F.col("o_custkey").alias("c_custkey")) \
        .distinct()
    rich = scoped.filter(F.col("__bal__") > avg_cents)
    never = rich.join(buyers, "c_custkey", "left_anti")
    return (never.groupBy("cntrycode")
            .agg(F.count(F.lit(1)).cast("long").alias("numcust"),
                 F.sum("__bal__").cast("long")
                 .alias("totacctbal_cents")))


def q6_forecast_revenue(lineitem: DataFrame,
                        date_from: str = "1996-01-01",
                        date_to: str = "1997-01-01",
                        disc_lo_pct: int = 5, disc_hi_pct: int = 7,
                        max_qty: int = 24) -> DataFrame:
    """TPC-H Q6: revenue increase from discount changes — a pure
    filter + single aggregation whose whole point is PREDICATE
    PUSHDOWN: ship-date range, integer discount band and quantity
    cap all reach the parquet scan; revenue = Σ price·discount in
    exact 10⁻⁴ dollar units.  Discounts compare as integer percent
    points (round(l_discount·100)) — the published query's
    ``between 0.05 - 0.01 and 0.05 + 0.01`` float trap, made exact.
    """
    dc = F.round(F.col("l_discount") * 100).cast("long")
    li = lineitem.filter(
        (F.to_date("l_shipdate") >= F.lit(date_from).cast("date"))
        & (F.to_date("l_shipdate") < F.lit(date_to).cast("date"))
        & (F.round(F.col("l_discount") * 100).cast("long")
           >= disc_lo_pct)
        & (F.round(F.col("l_discount") * 100).cast("long")
           <= disc_hi_pct)
        & (F.col("l_quantity") < max_qty))
    rev = _cents(F.col("l_extendedprice")).cast(_DEC) * dc
    return li.agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.sum(rev).cast("long").alias("revenue_e4"))


def q8_market_share(customer: DataFrame, orders: DataFrame,
                    lineitem: DataFrame, supplier: DataFrame,
                    nation: DataFrame, region: DataFrame,
                    part: DataFrame, target_nation: str = "NATION_1",
                    region_name: str = "ASIA",
                    part_type: str = "PROMO") -> DataFrame:
    """TPC-H Q8: the target nation's supplier market share, per
    order year, of one part type sold into one region — share =
    target-supplied revenue over all revenue, exact ppm from two
    conditional sums in ONE aggregation (never two scans).  The
    bounded nation⋈region and type-filtered part sides broadcast;
    customer/supplier joins are AQE-decided (they scale with SF).
    """
    nr = (nation.join(F.broadcast(
        region.filter(F.col("r_name") == region_name)),
        nation["n_regionkey"] == region["r_regionkey"])
        .select(F.col("n_nationkey").alias("__cnk__")))
    cust = customer.join(F.broadcast(nr),
                         F.col("c_nationkey") == F.col("__cnk__")) \
        .select("c_custkey")
    snat = nation.select(F.col("n_nationkey").alias("__snk__"),
                         F.col("n_name").alias("supp_nation"))
    supp = (supplier.join(F.broadcast(snat),
                          F.col("s_nationkey") == F.col("__snk__"))
            .select("s_suppkey", "supp_nation"))
    pt = part.filter(F.col("p_type") == part_type) \
        .select("p_partkey")
    price = _cents(F.col("l_extendedprice"))
    dc = F.round(F.col("l_discount") * 100).cast("long")
    rev = price.cast(_DEC) * (100 - dc)
    joined = (lineitem
              .join(F.broadcast(pt),
                    F.col("l_partkey") == F.col("p_partkey"))
              .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
              .join(cust, F.col("o_custkey") == F.col("c_custkey"))
              .join(supp, F.col("l_suppkey") == F.col("s_suppkey")))
    agg = (joined.groupBy(F.year("o_orderdate").cast("long")
                          .alias("o_year"))
           .agg(F.sum(F.when(F.col("supp_nation") == target_nation,
                             rev).otherwise(F.lit(0).cast(_DEC)))
                .cast(_DEC).alias("__t__"),
                F.sum(rev).cast(_DEC).alias("__a__")))
    return agg.select(
        "o_year",
        F.col("__t__").cast("long").alias("target_revenue_e4"),
        F.col("__a__").cast("long").alias("total_revenue_e4"),
        F.expr(f"CAST((CAST(1000000 AS {_DEC}) * __t__) div __a__"
               f" AS BIGINT)").alias("share_ppm"))


def q14_promo_effect(lineitem: DataFrame, part: DataFrame,
                     date_from: str = "1996-01-01",
                     date_to: str = "1996-02-01") -> DataFrame:
    """TPC-H Q14: promotional revenue share for one ship month —
    conditional and total revenue in the SAME aggregation, share as
    one truncating div to ppm.  Part is broadcast into the
    date-filtered lineitem scan.
    """
    li = lineitem.filter(
        (F.to_date("l_shipdate") >= F.lit(date_from).cast("date"))
        & (F.to_date("l_shipdate") < F.lit(date_to).cast("date")))
    price = _cents(F.col("l_extendedprice"))
    dc = F.round(F.col("l_discount") * 100).cast("long")
    rev = price.cast(_DEC) * (100 - dc)
    joined = li.join(F.broadcast(
        part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev)
              .otherwise(F.lit(0).cast(_DEC))).cast(_DEC)
        .alias("__p__"),
        F.sum(rev).cast(_DEC).alias("__a__"),
        F.count(F.lit(1)).cast("long").alias("n_lineitems"))
    return agg.select(
        "n_lineitems",
        F.col("__p__").cast("long").alias("promo_revenue_e4"),
        F.col("__a__").cast("long").alias("total_revenue_e4"),
        F.expr(f"CAST((CAST(1000000 AS {_DEC}) * __p__) div __a__"
               f" AS BIGINT)").alias("promo_share_ppm"))
