"""Property-based fuzzing of the WHOLE aggregation request surface —
random drilldown × cut × split × order × pagination × null-filter
combinations replayed against an independent oracle (the companion of
test_fuzz_cuts.py, which fuzzes only the range-cut algebra).

Semantics being pinned (SURVEY §2.4/§2.6) — the ENGINE's documented
contract (operators/browser.py ``_order_columns``), which deviates
from the reference on split placement:

* effective result order = explicit order columns (refs absent from
  the result silently skipped), then the split column DESC, then the
  drilldown's natural order over the remaining level keys.  The
  reference's order_query instead puts the split column FIRST with
  the default ascending direction
  (/root/reference/cubes/sql/utils.py:92-162); the engine's
  explicit-keys-first/DESC placement is a deliberate, documented
  deviation, and this suite pins THAT, not reference parity;
* pagination = OFFSET page·page_size LIMIT page_size AFTER ordering
  (utils.py:82-89);
* the null-aggregate row filter drops rows AFTER pagination, never
  the summary (sql/browser.py:454-459,616-618);
* split is one more group-by column named ``__within_split__``
  (sql/browser.py:504-589).

The oracle: DuckDB joins the same parquet snowflake once into a
fact-grain frame (decimal-exact measures); every combination is then
re-aggregated / filtered / ordered / paginated in plain Python over
those rows — independent of both the engine's Column algebra and the
per-entry SQL oracles.  Because the effective order always ends with
the full set of drilldown level keys (plus split), it is TOTAL, so
results compare as ordered lists.
"""

from __future__ import annotations

import decimal
import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF_DIR = os.environ.get("CUBES_SPARK_TEST_SF", "/root/testdata/sf0.001")

AGGREGATES = ["price_sum", "quantity_sum", "fact_count", "price_min",
              "quantity_avg", "discount_nz_count", "price_even_min"]

#: engine drilldown ref -> (result columns, natural-order key columns)
DRILLDOWNS = {
    "date@ym:year": (["date.year"], ["date.year"]),
    "date@ym:month": (["date.year", "date.month"],
                      ["date.year", "date.month"]),
    "customer_geo:region": (
        ["customer_geo.region_key", "customer_geo.region_name"],
        ["customer_geo.region_key"]),
    "returnflag": (["returnflag.returnflag"], ["returnflag.returnflag"]),
    "linestatus": (["linestatus.linestatus"], ["linestatus.linestatus"]),
    "order@priority:priority": (["order.priority"], ["order.priority"]),
}

#: cut string -> predicate over a base-row dict
CUTS = {
    "date:1996": lambda r: r["date.year"] == 1996,
    "date:1996,4": lambda r: (r["date.year"], r["date.month"]) == (1996, 4),
    "returnflag:R": lambda r: r["returnflag.returnflag"] == "R",
    "!returnflag:A;R": lambda r: r["returnflag.returnflag"] not in ("A", "R"),
    "linestatus:F": lambda r: r["linestatus.linestatus"] == "F",
    "customer_geo:1": lambda r: r["customer_geo.region_key"] == 1,
    "date@ym:1996,6-1997,3": lambda r: (
        (1996, 6) <= (r["date.year"], r["date.month"]) <= (1997, 3)),
    "date@ym:-1996": lambda r: r["date.year"] <= 1996,
}

ORDER_KEYS = ["price_sum", "fact_count", "quantity_avg",
              "price_even_min", "returnflag.returnflag", "date.year",
              "customer_geo.region_name", "bogus_ref"]

SPLIT = "__within_split__"


@pytest.fixture(scope="module")
def base_rows():
    """Fact-grain snowflake projection from DuckDB (decimal-exact)."""
    q = f"""
        SELECT CAST(year(l.l_shipdate) AS BIGINT)  AS y,
               CAST(month(l.l_shipdate) AS BIGINT) AS m,
               CAST(r.r_regionkey AS BIGINT)       AS rk,
               r.r_name                            AS rn,
               l.l_returnflag                      AS rf,
               l.l_linestatus                      AS ls,
               o.o_orderpriority                   AS pr,
               CAST(l.l_extendedprice AS DECIMAL(20,2)) AS price,
               CAST(l.l_quantity AS DECIMAL(20,2))      AS qty,
               CAST(l.l_discount AS DECIMAL(6,2))       AS disc
        FROM read_parquet('{SF_DIR}/lineitem.parquet') l
        JOIN read_parquet('{SF_DIR}/orders.parquet') o
            ON l.l_orderkey = o.o_orderkey
        JOIN read_parquet('{SF_DIR}/customer.parquet') c
            ON o.o_custkey = c.c_custkey
        JOIN read_parquet('{SF_DIR}/nation.parquet') n
            ON c.c_nationkey = n.n_nationkey
        JOIN read_parquet('{SF_DIR}/region.parquet') r
            ON n.n_regionkey = r.r_regionkey
    """
    rows = []
    for y, m, rk, rn, rf, ls, pr, price, qty, disc in \
            duckdb.sql(q).fetchall():
        rows.append({
            "date.year": y, "date.month": m,
            "customer_geo.region_key": rk,
            "customer_geo.region_name": rn,
            "returnflag.returnflag": rf,
            "linestatus.linestatus": ls,
            "order.priority": pr,
            "price": price, "qty": qty, "disc": disc,
            # measure `price_even` = if(shipmonth % 2 == 0, price, NULL)
            "price_even": price if m % 2 == 0 else None,
        })
    assert rows
    return rows


@pytest.fixture(scope="module")
def browsers(spark):
    """(default, null-filtering) browsers over independent workspaces —
    the session tpch_browser fixture is never mutated."""
    from cubes_spark.demo import tpch_workspace

    plain = tpch_workspace(spark, SF_DIR).browser("sales")
    filtering = tpch_workspace(spark, SF_DIR).browser("sales")
    filtering.exclude_null_agregates = True
    return plain, filtering


def _aggregate_group(rows):
    price_sum = sum((r["price"] for r in rows), decimal.Decimal(0))
    qty_sum = sum((r["qty"] for r in rows), decimal.Decimal(0))
    evens = [r["price_even"] for r in rows
             if r["price_even"] is not None]
    return {
        "price_sum": float(price_sum),
        "quantity_sum": float(qty_sum),
        "fact_count": len(rows),
        "price_min": float(min(r["price"] for r in rows)),
        "quantity_avg": float(qty_sum) / float(len(rows)),
        "discount_nz_count": sum(1 for r in rows if r["disc"] != 0),
        "price_even_min": float(min(evens)) if evens else None,
    }


def _expected(base, dd_refs, cut, split, order, page, page_size,
              null_filter):
    rows = base if cut is None else [r for r in base if CUTS[cut](r)]
    group_cols = [c for ref in dd_refs for c in DRILLDOWNS[ref][0]]
    natural = [c for ref in dd_refs for c in DRILLDOWNS[ref][1]]

    groups = {}
    for r in rows:
        key = tuple(r[c] for c in group_cols)
        if split is not None:
            key += (CUTS[split](r),)
        groups.setdefault(key, []).append(r)

    out = []
    for key, members in groups.items():
        row = dict(zip(group_cols, key))
        if split is not None:
            row[SPLIT] = key[-1]
        row.update(_aggregate_group(members))
        out.append(row)

    # effective order: explicit (skipping absent refs) -> split DESC
    # -> natural keys; asc = NULLs first, desc = NULLs last (Spark)
    available = set(group_cols) | set(AGGREGATES) \
        | ({SPLIT} if split is not None else set())
    keys = []
    used = set()
    for ref, direction in order:
        if ref not in available:
            continue
        keys.append((ref, bool(direction
                               and direction.lower().startswith("desc"))))
        used.add(ref)
    if split is not None and SPLIT not in used:
        keys.append((SPLIT, True))
    for c in natural:
        if c not in used:
            keys.append((c, False))
            used.add(c)
    for col, desc in reversed(keys):
        out.sort(key=lambda r: (r[col] is not None,
                                r[col] if r[col] is not None else 0),
                 reverse=desc)

    if page_size is not None:
        start = (page or 0) * page_size
        out = out[start:start + page_size]
    if null_filter:
        out = [r for r in out
               if all(r[a] is not None for a in AGGREGATES)]
    return out


def _normalize(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


dd_strategy = st.lists(
    st.sampled_from(sorted(DRILLDOWNS)), min_size=1, max_size=3,
    unique_by=lambda ref: ref.split("@")[0].split(":")[0],
)
order_strategy = st.lists(
    st.tuples(st.sampled_from(ORDER_KEYS),
              st.sampled_from(["asc", "desc", None])),
    max_size=2, unique_by=lambda t: t[0],
)


@given(
    dd=dd_strategy,
    cut=st.none() | st.sampled_from(sorted(CUTS)),
    split=st.none() | st.sampled_from(sorted(CUTS)),
    order=order_strategy,
    page=st.none() | st.tuples(st.integers(0, 2), st.integers(1, 5)),
    null_filter=st.booleans(),
)
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_aggregation_surface_matches_bruteforce(
        browsers, base_rows, dd, cut, split, order, page, null_filter):
    browser = browsers[1] if null_filter else browsers[0]
    page_no, page_size = page if page else (None, None)

    df = browser.aggregation_dataframe(
        cell=cut, drilldown=list(dd), split=split,
        aggregates=AGGREGATES,
        order=[(r, d) for r, d in order],
        page=page_no, page_size=page_size,
    )
    got = [{k: _normalize(v) for k, v in r.asDict().items()}
           for r in df.collect()]

    want = _expected(base_rows, dd, cut, split, order, page_no,
                     page_size, null_filter)

    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        for col in w:
            assert g[col] == w[col], (col, g, w)
        # no extra surprise columns beyond the contract
        assert set(g) == set(w), (set(g) ^ set(w))
