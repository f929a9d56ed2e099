"""Demo model over the driver's TPC-H-ish testdata
(/root/testdata/sf*/ — see TESTDATA.md).

A snowflake: ``lineitem`` fact → ``orders`` → ``customer`` →
``nation`` → ``region``, plus ``part`` and ``supplier`` (role-playing
``nation``/``region`` reachable from both customer and supplier via
aliased joins).  The ``date`` dimension is *virtual*: level keys map to
``extract`` date-parts of ``l_shipdate`` (parity with the reference's
mapping ``extract`` feature, /root/reference/cubes/sql/query.py:43-52).
"""

from __future__ import annotations

from typing import Optional

from cubes_spark.sources.workspace import Workspace

TPCH_MODEL = {
    # NAMED TABLE EXPRESSIONS (SQL over store tables, evaluated through
    # Catalyst — filters/projections push into the parquet scan):
    #   big_parts     — part filtered to p_size > 25 (master/left join
    #                   demo: lineitems of small parts keep NULL dims)
    #   big_parts_ext — big_parts plus one sentinel row no fact
    #                   references (observable detail-join semantics)
    #   li_notes      — lineitem-derived detail keyed by the compound
    #                   (l_orderkey, l_linenumber)
    "table_expressions": {
        "big_parts": (
            "SELECT p_partkey, p_brand, p_retailprice "
            "FROM part WHERE p_size > 25"
        ),
        "big_parts_ext": (
            "SELECT p_partkey, p_brand, p_retailprice "
            "FROM part WHERE p_size > 25 "
            "UNION ALL "
            "SELECT CAST(-1 AS BIGINT), 'Brand#ZZ', CAST(0.0 AS DOUBLE)"
        ),
        "li_notes": (
            "SELECT l_orderkey AS o_key, l_linenumber AS l_num, "
            "l_quantity * 2 AS double_qty FROM lineitem"
        ),
    },
    "dimensions": [
        {
            "name": "date",
            "role": "time",
            "levels": [
                {"name": "year", "attributes": ["year"], "role": "year"},
                {"name": "month", "attributes": ["month"], "role": "month"},
                {"name": "day", "attributes": ["day"], "role": "day"},
            ],
            "hierarchies": [
                {"name": "default", "levels": ["year", "month", "day"]},
                {"name": "ym", "levels": ["year", "month"]},
            ],
        },
        {
            "name": "customer_geo",
            "levels": [
                {"name": "region",
                 "attributes": ["region_key", "region_name"],
                 "key": "region_key", "label_attribute": "region_name"},
                {"name": "nation",
                 "attributes": [
                     "nation_key",
                     # localized label: "en" is the stored name, "xx" a
                     # derived display form (upper-cased via the
                     # `function` mapping modifier) — exercises per-locale
                     # column mapping (parity: sql/mapper.py:240-248)
                     {"name": "nation_name", "locales": ["en", "xx"]},
                 ],
                 "key": "nation_key", "label_attribute": "nation_name"},
                {"name": "customer",
                 "attributes": ["customer_key", "customer_name", "mktsegment"],
                 "key": "customer_key", "label_attribute": "customer_name",
                 "cardinality": "high"},
            ],
            "hierarchies": [
                {"name": "default", "levels": ["region", "nation", "customer"]},
                {"name": "nation_only", "levels": ["nation"]},
            ],
        },
        {
            "name": "supplier_geo",
            "levels": [
                {"name": "region",
                 "attributes": ["region_key", "region_name"],
                 "key": "region_key", "label_attribute": "region_name"},
                {"name": "nation",
                 "attributes": ["nation_key", "nation_name"],
                 "key": "nation_key", "label_attribute": "nation_name"},
                {"name": "supplier",
                 "attributes": ["supplier_key", "supplier_name"],
                 "key": "supplier_key", "label_attribute": "supplier_name",
                 "cardinality": "high"},
            ],
        },
        {
            "name": "part",
            "levels": [
                {"name": "brand", "attributes": ["brand"]},
                {"name": "type", "attributes": ["type"]},
                {"name": "part",
                 "attributes": ["part_key", "part_name", "size", "retailprice"],
                 "key": "part_key", "label_attribute": "part_name",
                 "cardinality": "high"},
            ],
        },
        {
            "name": "returnflag",
            "levels": [{"name": "returnflag", "attributes": ["returnflag"]}],
        },
        {
            "name": "etype",
            "levels": [{"name": "etype", "attributes": ["etype"]}],
        },
        {
            "name": "linestatus",
            "levels": [{"name": "linestatus", "attributes": ["linestatus"]}],
        },
        {
            "name": "order",
            "levels": [
                {"name": "status", "attributes": ["status"]},
                {"name": "priority", "attributes": ["priority"]},
            ],
            "hierarchies": [
                {"name": "default", "levels": ["status"]},
                {"name": "priority", "levels": ["priority"]},
            ],
        },
        {
            # dimension over the `big_parts` named table expression
            "name": "bigpart",
            "levels": [{"name": "brand", "attributes": ["brand"]}],
        },
    ],
    "cubes": [
        {
            "name": "sales",
            "fact": "lineitem",
            "key": "fact_key",
            "dimensions": [
                "date", "customer_geo", "supplier_geo", "part",
                "returnflag", "linestatus", "order",
            ],
            "measures": [
                {"name": "quantity"},
                {"name": "extendedprice"},
                {"name": "discount"},
                {"name": "tax"},
                {"name": "partkey"},
                {"name": "suppkey"},
                {"name": "linenumber"},
                {"name": "discounted_price",
                 "expression": "extendedprice * (1 - discount)"},
                {"name": "charge",
                 "expression": "extendedprice * (1 - discount) * (1 + tax)"},
                {"name": "quantity_sq", "expression": "quantity * quantity"},
                {"name": "price_sq",
                 "expression": "extendedprice * extendedprice"},
                # scalar-function breadth: if/round/min(=least)/coalesce
                {"name": "capped_qty",
                 "expression": "min(quantity, 25) + coalesce(discount, 0)"},
                {"name": "price_band",
                 "expression":
                     "if(extendedprice > 2000,"
                     " round(extendedprice / 1000, 0), 0)"},
                # searched CASE in call form: pairs + trailing else
                {"name": "qty_tier",
                 "expression":
                     "case(quantity < 10, 1, quantity < 30, 2,"
                     " quantity < 45, 3, 4)"},
                # NULL for zero discounts: makes count_nonempty
                # observable (< fact_count) on null-free testdata
                {"name": "discount_nz", "expression": "nullif(discount, 0)"},
                # NULL on odd ship-months: a month-grain drilldown over
                # this measure interleaves NULL aggregate values, making
                # the window calculators' last-N-NON-NULL deque
                # semantics observable (parity:
                # /root/reference/cubes/query/statutils.py:192-205)
                {"name": "shipmonth"},
                {"name": "price_even",
                 "expression":
                     "if(shipmonth % 2 == 0, extendedprice, None)"},
            ],
            "aggregates": [
                {"name": "quantity_sum", "function": "sum",
                 "measure": "quantity"},
                {"name": "price_sum", "function": "sum",
                 "measure": "extendedprice"},
                {"name": "discounted_price_sum", "function": "sum",
                 "measure": "discounted_price"},
                {"name": "charge_sum", "function": "sum", "measure": "charge"},
                {"name": "capped_qty_sum", "function": "sum",
                 "measure": "capped_qty"},
                {"name": "price_band_sum", "function": "sum",
                 "measure": "price_band"},
                {"name": "qty_tier_sum", "function": "sum",
                 "measure": "qty_tier"},
                {"name": "discount_nz_count", "function": "count_nonempty",
                 "measure": "discount_nz"},
                {"name": "quantity_avg", "function": "avg",
                 "measure": "quantity"},
                {"name": "discount_avg", "function": "avg",
                 "measure": "discount"},
                {"name": "price_min", "function": "min",
                 "measure": "extendedprice"},
                {"name": "price_max", "function": "max",
                 "measure": "extendedprice"},
                {"name": "price_stddev", "function": "stddev",
                 "measure": "extendedprice"},
                {"name": "price_variance", "function": "variance",
                 "measure": "extendedprice"},
                {"name": "quantity_sq_sum", "function": "sum",
                 "measure": "quantity_sq"},
                {"name": "price_sq_sum", "function": "sum",
                 "measure": "price_sq"},
                {"name": "quantity_count", "function": "count_nonempty",
                 "measure": "quantity"},
                {"name": "fact_count", "function": "count"},
                {"name": "part_count_distinct", "function": "count_distinct",
                 "measure": "partkey"},
                {"name": "supp_count_distinct", "function": "count_distinct",
                 "measure": "suppkey"},
                {"name": "price_sma", "function": "sma",
                 "measure": "price_sum", "window_size": 3},
                {"name": "price_wma", "function": "wma",
                 "measure": "price_sum", "window_size": 3},
                {"name": "price_sms", "function": "sms",
                 "measure": "price_sum", "window_size": 3},
                {"name": "price_smstd", "function": "smstd",
                 "measure": "price_sum", "window_size": 3},
                {"name": "price_smvar", "function": "smvar",
                 "measure": "price_sum", "window_size": 3},
                {"name": "price_smrsd", "function": "smrsd",
                 "measure": "price_sum", "window_size": 3},
                {"name": "price_ewma", "function": "ewma",
                 "measure": "price_sum", "window_size": 3},
                {"name": "price_zscore", "function": "zscore",
                 "measure": "price_sum", "window_size": 3},
                {"name": "price_rsum", "function": "rsum",
                 "measure": "price_sum"},
                {"name": "price_ptot", "function": "ptot",
                 "measure": "price_sum"},
                {"name": "price_pct_change", "function": "pct_change",
                 "measure": "price_sum"},
                # nullable windowed series: min over a measure that is
                # NULL on odd ship-months (deque-semantics coverage)
                {"name": "price_even_min", "function": "min",
                 "measure": "price_even"},
                {"name": "pe_sma", "function": "sma",
                 "measure": "price_even_min", "window_size": 3},
                {"name": "pe_wma", "function": "wma",
                 "measure": "price_even_min", "window_size": 3},
                {"name": "pe_sms", "function": "sms",
                 "measure": "price_even_min", "window_size": 3},
                {"name": "pe_smstd", "function": "smstd",
                 "measure": "price_even_min", "window_size": 3},
                {"name": "pe_smvar", "function": "smvar",
                 "measure": "price_even_min", "window_size": 3},
                {"name": "pe_smrsd", "function": "smrsd",
                 "measure": "price_even_min", "window_size": 3},
            ],
            "mappings": {
                # fact measures / key.  Monetary doubles are cast to
                # decimal on read (a `cast` mapping modifier, Spark
                # extension): decimal sums are exact and therefore
                # independent of partitioning/summation order — the same
                # query gives bit-identical results on 1 core or 1000
                # executors, and matches any exact SQL oracle.
                "fact_key": "lineitem.l_orderkey",
                "quantity": {"table": "lineitem", "column": "l_quantity",
                             "cast": "decimal(20,2)"},
                "extendedprice": {"table": "lineitem",
                                  "column": "l_extendedprice",
                                  "cast": "decimal(20,2)"},
                "discount": {"table": "lineitem", "column": "l_discount",
                             "cast": "decimal(6,2)"},
                "tax": {"table": "lineitem", "column": "l_tax",
                        "cast": "decimal(6,2)"},
                "partkey": "lineitem.l_partkey",
                "suppkey": "lineitem.l_suppkey",
                "linenumber": "lineitem.l_linenumber",
                "shipmonth": {"table": "lineitem", "column": "l_shipdate",
                              "extract": "month"},
                # virtual time dimension via extract()
                "date.year": {"table": "lineitem", "column": "l_shipdate",
                              "extract": "year"},
                "date.month": {"table": "lineitem", "column": "l_shipdate",
                               "extract": "month"},
                "date.day": {"table": "lineitem", "column": "l_shipdate",
                             "extract": "day"},
                # flat fact dims
                "returnflag.returnflag": "lineitem.l_returnflag",
                "linestatus.linestatus": "lineitem.l_linestatus",
                # order dimension
                "order.status": "orders.o_orderstatus",
                "order.priority": "orders.o_orderpriority",
                # customer geo snowflake
                "customer_geo.customer_key": "customer.c_custkey",
                "customer_geo.customer_name": "customer.c_name",
                "customer_geo.mktsegment": "customer.c_mktsegment",
                "customer_geo.nation_key": "cust_nation.n_nationkey",
                "customer_geo.nation_name": "cust_nation.n_name",
                "customer_geo.nation_name.en": "cust_nation.n_name",
                "customer_geo.nation_name.xx": {
                    "table": "cust_nation", "column": "n_name",
                    "function": "upper"},
                "customer_geo.region_key": "cust_region.r_regionkey",
                "customer_geo.region_name": "cust_region.r_name",
                # supplier geo snowflake (role-playing nation/region)
                "supplier_geo.supplier_key": "supplier.s_suppkey",
                "supplier_geo.supplier_name": "supplier.s_name",
                "supplier_geo.nation_key": "supp_nation.n_nationkey",
                "supplier_geo.nation_name": "supp_nation.n_name",
                "supplier_geo.region_key": "supp_region.r_regionkey",
                "supplier_geo.region_name": "supp_region.r_name",
                # part
                "part.part_key": "part.p_partkey",
                "part.part_name": "part.p_name",
                "part.brand": "part.p_brand",
                "part.type": "part.p_type",
                "part.size": "part.p_size",
                "part.retailprice": "part.p_retailprice",
            },
            "joins": [
                {"master": "lineitem.l_orderkey",
                 "detail": "orders.o_orderkey"},
                {"master": "orders.o_custkey",
                 "detail": "customer.c_custkey"},
                {"master": "customer.c_nationkey",
                 "detail": "nation.n_nationkey", "alias": "cust_nation"},
                {"master": "cust_nation.n_regionkey",
                 "detail": "region.r_regionkey", "alias": "cust_region"},
                {"master": "lineitem.l_suppkey",
                 "detail": "supplier.s_suppkey"},
                {"master": "supplier.s_nationkey",
                 "detail": "nation.n_nationkey", "alias": "supp_nation"},
                {"master": "supp_nation.n_regionkey",
                 "detail": "region.r_regionkey", "alias": "supp_region"},
                {"master": "lineitem.l_partkey",
                 "detail": "part.p_partkey"},
            ],
        },
        {
            # join-method / compound-key showcase over NAMED TABLE
            # EXPRESSIONS (registered in tpch_workspace):
            #   big_parts — part filtered to p_size > 25 (master/left
            #     join: lineitems of small parts keep NULL dims)
            #   li_notes — lineitem-derived detail joined on the
            #     COMPOUND key (l_orderkey, l_linenumber)
            # (parity: join methods sql/query.py:176-187, compound keys
            # sql/query.py:266-274)
            "name": "sales_outer",
            "fact": "lineitem",
            "key": "fact_key",
            "dimensions": ["bigpart", "returnflag"],
            "measures": [
                {"name": "quantity"},
                {"name": "retailprice"},
                {"name": "dqty"},
            ],
            "aggregates": [
                {"name": "quantity_sum", "function": "sum",
                 "measure": "quantity"},
                {"name": "retailprice_sum", "function": "sum",
                 "measure": "retailprice"},
                {"name": "dqty_sum", "function": "sum", "measure": "dqty"},
                {"name": "fact_count", "function": "count"},
            ],
            "mappings": {
                "fact_key": "lineitem.l_orderkey",
                "quantity": {"table": "lineitem", "column": "l_quantity",
                             "cast": "decimal(20,2)"},
                "retailprice": {"table": "big_parts",
                                "column": "p_retailprice",
                                "cast": "decimal(20,2)"},
                "dqty": {"table": "li_notes", "column": "double_qty",
                         "cast": "decimal(20,2)"},
                "bigpart.brand": "big_parts.p_brand",
                "returnflag.returnflag": "lineitem.l_returnflag",
            },
            "joins": [
                {"master": "lineitem.l_partkey",
                 "detail": "big_parts.p_partkey", "method": "master"},
                {"master": {"table": "lineitem",
                            "column": ["l_orderkey", "l_linenumber"]},
                 "detail": {"table": "li_notes",
                            "column": ["o_key", "l_num"]}},
            ],
        },
        {
            # the streaming fact browsed through the SAME model
            # language: the store reads the TIMESTAMP(NANOS) column
            # transparently, the calendar `date` dimension template
            # rebinds to events.ts per-cube
            "name": "events",
            "fact": "events",
            "key": "event_id",
            "dimensions": ["date", "etype"],
            "measures": [{"name": "value"}],
            "aggregates": [
                {"name": "value_sum", "function": "sum",
                 "measure": "value"},
                {"name": "value_count", "function": "count_nonempty",
                 "measure": "value"},
                {"name": "value_avg", "function": "avg",
                 "measure": "value"},
                {"name": "fact_count", "function": "count"},
            ],
            "mappings": {
                "value": {"table": "events", "column": "value",
                          "cast": "decimal(20,6)"},
                "date.year": {"table": "events", "column": "ts",
                              "extract": "year"},
                "date.month": {"table": "events", "column": "ts",
                               "extract": "month"},
                "date.day": {"table": "events", "column": "ts",
                             "extract": "day"},
                "etype.etype": "events.event_type",
            },
        },
        {
            # detail (right outer) join: every big_parts_ext row is kept,
            # including the sentinel brand that no fact references
            "name": "sales_detail",
            "fact": "lineitem",
            "dimensions": ["bigpart"],
            "measures": [
                {"name": "quantity"},
                {"name": "retailprice"},
            ],
            "aggregates": [
                {"name": "quantity_sum", "function": "sum",
                 "measure": "quantity"},
                {"name": "retailprice_sum", "function": "sum",
                 "measure": "retailprice"},
                {"name": "fact_count", "function": "count"},
            ],
            "mappings": {
                "quantity": {"table": "lineitem", "column": "l_quantity",
                             "cast": "decimal(20,2)"},
                "retailprice": {"table": "big_parts_ext",
                                "column": "p_retailprice",
                                "cast": "decimal(20,2)"},
                "bigpart.brand": "big_parts_ext.p_brand",
            },
            "joins": [
                {"master": "lineitem.l_partkey",
                 "detail": "big_parts_ext.p_partkey", "method": "detail"},
            ],
        },
    ],
}


def tpch_workspace(spark, sf_dir: str,
                   naming: Optional[dict] = None) -> Workspace:
    """Workspace with the TPC-H demo model bound to `sf_dir` parquet."""
    ws = Workspace(spark, store=sf_dir, naming=naming)
    ws.import_model(TPCH_MODEL)
    return ws
