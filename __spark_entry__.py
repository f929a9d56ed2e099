"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship snowflake drilldown at sf0.001.
``queries()`` exposes one callable per implemented operator family from
SURVEY.md §2 (plus the LLM-pipeline operators); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for each.

Determinism policy (so value-hashes match the oracle bit-for-bit):

* Monetary measures are cast to decimal at scan (model mappings) —
  decimal sums are exact, hence independent of partitioning and
  summation order; final outputs cast back to double, which both
  engines round identically from the same exact rational.
* Averages / variances are derived from exact sums with the *same*
  double-arithmetic formula on both sides.
* Hashes are md5-derived (see cubes_spark.llm.text.hash64), identical
  in Spark and DuckDB.
* Integer-ish outputs are cast to bigint on the Spark side to match
  DuckDB's BIGINT defaults.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubes_spark.demo import tpch_workspace
from cubes_spark.operators import olap
from cubes_spark.llm import (
    ann_lsh_cosine,
    cosine_topk,
    embedding_near_duplicates,
    exact_duplicates,
    fingerprint,
    language_id,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
    text_stats,
)

_browsers: dict = {}
_workspaces: dict = {}


def _ws(spark: SparkSession, sf_dir: str):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (id(spark), sf_dir)
    if key not in _workspaces:
        _workspaces[key] = tpch_workspace(spark, sf_dir)
    return _workspaces[key]


def _browser(spark: SparkSession, sf_dir: str):
    key = (id(spark), sf_dir)
    if key not in _browsers:
        _browsers[key] = _ws(spark, sf_dir).browser("sales")
    return _browsers[key]


_stores: dict = {}


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Schema-adaptive table read: ParquetStore sniffs the parquet
    footer and converts only genuine TIMESTAMP(NANOS) columns to µs
    timestamps; every other timestamp flavor reads natively.  (The
    physical unit of e.g. events.ts is a property of the data, not of
    the engine — never hard-code it.)"""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from cubes_spark.sources.workspace import ParquetStore

    key = (id(spark), sf_dir)
    if key not in _stores:
        _stores[key] = ParquetStore(spark, sf_dir)
    return _stores[key].table(name)


def _dbl(df: DataFrame, *cols: str) -> DataFrame:
    """Cast decimal aggregate columns to double for oracle comparison."""
    return df.withColumns({c: F.col(f"`{c}`").cast("double") for c in cols})


def _lng(df: DataFrame, *cols: str) -> DataFrame:
    return df.withColumns({c: F.col(f"`{c}`").cast("long") for c in cols})


# ---------------------------------------------------------------------------
# OLAP browser queries (SURVEY §2.2-2.6)
# ---------------------------------------------------------------------------


def q_agg_year(spark, sf_dir):
    """Drilldown aggregation over the virtual time dimension."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["date:year"],
        aggregates=["quantity_sum", "price_sum", "fact_count"],
    )
    return _lng(_dbl(df, "quantity_sum", "price_sum"), "date.year",
                "fact_count")


def q_agg_point_cut(spark, sf_dir):
    """PointCut cell filter + two-level drilldown."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        cell="date:1995",
        drilldown=["date@ym:month"],
        aggregates=["price_sum", "fact_count"],
    )
    return _lng(_dbl(df, "price_sum"), "date.year", "date.month",
                "fact_count")


def q_agg_set_cut(spark, sf_dir):
    df = _browser(spark, sf_dir).aggregation_dataframe(
        cell="returnflag:A;R",
        drilldown=["returnflag"],
        aggregates=["quantity_sum", "fact_count"],
    )
    return _lng(_dbl(df, "quantity_sum"), "fact_count")


def q_agg_invert_cut(spark, sf_dir):
    df = _browser(spark, sf_dir).aggregation_dataframe(
        cell="!returnflag:A;R",
        drilldown=["returnflag", "linestatus"],
        aggregates=["price_sum", "fact_count"],
    )
    return _lng(_dbl(df, "price_sum"), "fact_count")


def q_agg_range_cut(spark, sf_dir):
    """Hierarchical RangeCut over (year, month) paths."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        cell="date@ym:1995,3-1996,8",
        drilldown=["date@ym:month"],
        aggregates=["fact_count"],
    )
    return _lng(df, "date.year", "date.month", "fact_count")


def q_agg_half_open_range(spark, sf_dir):
    df = _browser(spark, sf_dir).aggregation_dataframe(
        cell="date:2000,6-",
        drilldown=["date:year"],
        aggregates=["fact_count"],
    )
    return _lng(df, "date.year", "fact_count")


def q_agg_snowflake(spark, sf_dir):
    """Snowflake join lineitem→orders→customer→nation→region."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["customer_geo:region"],
        aggregates=["price_sum", "fact_count"],
    )
    return _lng(_dbl(df, "price_sum"), "customer_geo.region_key",
                "fact_count")


def q_agg_roleplay(spark, sf_dir):
    """Role-playing dims: nation via customer AND via supplier."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["customer_geo@nation_only:nation",
                   "supplier_geo:region"],
        aggregates=["fact_count"],
    )
    return _lng(df, "customer_geo.nation_key", "supplier_geo.region_key",
                "fact_count")


def q_agg_expression(spark, sf_dir):
    """Derived measures: expression over base measures."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["returnflag"],
        aggregates=["discounted_price_sum", "charge_sum"],
    )
    return _dbl(df, "discounted_price_sum", "charge_sum")


def q_agg_expression_fns(spark, sf_dir):
    """Expression-language scalar functions end-to-end: if/CASE,
    round, scalar min (least), coalesce inside derived measures
    (parity: sql/expressions.py:25-60 function table)."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["returnflag"],
        aggregates=["capped_qty_sum", "price_band_sum", "fact_count"],
    )
    return _lng(_dbl(df, "capped_qty_sum", "price_band_sum"),
                "fact_count")


def q_agg_expression_case(spark, sf_dir):
    """Searched CASE in the expression language —
    ``case(cond1, v1, cond2, v2, ..., else)`` (parity:
    /root/reference/cubes/sql/expressions.py:46 ``case``)."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["returnflag"],
        aggregates=["qty_tier_sum", "fact_count"],
    )
    return _lng(df, "qty_tier_sum", "fact_count")


def q_agg_count_nonempty(spark, sf_dir):
    """``count_nonempty`` distinguished from plain ``count``: counts
    non-NULL values of a nullable derived measure (nullif(discount,0)),
    so the result is strictly below fact_count."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["returnflag"],
        aggregates=["discount_nz_count", "fact_count"],
    )
    return _lng(df, "discount_nz_count", "fact_count")


def q_agg_order_page(spark, sf_dir):
    """Explicit order by aggregate + pagination (page 1, size 5)."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["date@ym:month"],
        aggregates=["price_sum"],
        order=["price_sum:desc"],
        page=1, page_size=5,
    )
    return _lng(_dbl(df, "price_sum"), "date.year", "date.month")


def q_agg_minmax(spark, sf_dir):
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["returnflag"],
        aggregates=["price_min", "price_max", "part_count_distinct"],
    )
    return _lng(_dbl(df, "price_min", "price_max"), "part_count_distinct")


def q_agg_avg_var(spark, sf_dir):
    """avg / variance / stddev derived from exact sums with the same
    double formula as the oracle."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["returnflag"],
        aggregates=["quantity_sum", "quantity_sq_sum", "quantity_count"],
    )
    s = F.col("quantity_sum").cast("double")
    s2 = F.col("quantity_sq_sum").cast("double")
    n = F.col("quantity_count").cast("double")
    var = (s2 - s * s / n) / (n - F.lit(1.0))
    return df.select(
        F.col("`returnflag.returnflag`"),
        (s / n).alias("quantity_avg"),
        var.alias("quantity_var"),
        F.sqrt(var).alias("quantity_std"),
    )


def q_agg_split(spark, sf_dir):
    """Split dimension: in/out of the 1995 cell as a virtual dim."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["returnflag"],
        split="date:1995",
        aggregates=["price_sum", "fact_count"],
    )
    return _lng(_dbl(df, "price_sum"), "fact_count")


def q_agg_relative_time(spark, sf_dir):
    """Calendar cut: 'lastmonth' expanded by the member converter for
    the role:"time" dimension (now pinned for determinism)."""
    from datetime import datetime

    from cubes_spark.calendar import Calendar
    from cubes_spark.demo import tpch_workspace

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ws = tpch_workspace(spark, sf_dir)
    browser = ws.browser(
        "sales", calendar=Calendar(now=datetime(1996, 6, 15))
    )
    df = browser.aggregation_dataframe(
        cell="date@ym:lastmonth",
        drilldown=["date:day"],
        aggregates=["quantity_sum", "fact_count"],
    )
    return _lng(_dbl(df, "quantity_sum"), "date.year", "date.month",
                "date.day", "fact_count")


def q_topk_customers(spark, sf_dir):
    """High-cardinality drilldown guarded by pagination: top-5 customers
    by revenue."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["customer_geo:customer"],
        aggregates=["price_sum"],
        order=["price_sum:desc"],
        page=0, page_size=5,
    )
    return _lng(
        _dbl(df, "price_sum"),
        "customer_geo.region_key", "customer_geo.nation_key",
        "customer_geo.customer_key",
    )


def q_members(spark, sf_dir):
    """Distinct members of a hierarchy depth within a cell."""
    df = _browser(spark, sf_dir).members_dataframe(
        cell="customer_geo:2", dimension="customer_geo", depth=2,
    )
    return _lng(df, "customer_geo.region_key", "customer_geo.nation_key")


def q_facts_page(spark, sf_dir):
    """Detail facts with field selection, order, pagination."""
    df = _browser(spark, sf_dir).facts(
        cell="date:1995,1",
        fields=["fact_key", "linenumber", "quantity", "extendedprice",
                "returnflag"],
        order=["fact_key", "linenumber"],
        page=0, page_size=50,
    )
    return _lng(_dbl(df, "quantity", "extendedprice"), "fact_key",
                "linenumber")


def q_fact_list(spark, sf_dir):
    """facts(fact_list=...) — key-filtered detail rows."""
    df = _browser(spark, sf_dir).facts(
        fields=["fact_key", "linenumber", "quantity", "returnflag"],
        fact_list=[1, 2, 3, 5, 8, 13, 21, 34],
    )
    return _lng(_dbl(df, "quantity"), "fact_key", "linenumber")


# -- post-aggregation window calculators (SURVEY §2.5) ----------------------


def _calc_query(aggregate: str):
    def run(spark, sf_dir):
        df = _browser(spark, sf_dir).aggregation_dataframe(
            drilldown=["date@ym:month"],
            aggregates=["price_sum", aggregate],
        )
        out = _dbl(df, "price_sum", aggregate)
        return _lng(out, "date.year", "date.month")
    return run


q_calc_sma = _calc_query("price_sma")
q_calc_rsum = _calc_query("price_rsum")
q_calc_pctchange = _calc_query("price_pct_change")


def q_calc_ptot(spark, sf_dir):
    """Share-of-parent calculator (``ptot``): each (region, month)
    row's price as a fraction of ITS REGION's total — the "auto"
    calculator partition is every drilldown item but the last, so the
    whole-partition frame IS the parent grain."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["customer_geo:region", "date@ym:month"],
        aggregates=["price_sum", "price_ptot"],
    )
    out = _dbl(df, "price_sum", "price_ptot")
    return _lng(out, "customer_geo.region_key", "date.year",
                "date.month")

q_calc_wma = _calc_query("price_wma")
q_calc_sms = _calc_query("price_sms")
q_calc_ewma = _calc_query("price_ewma")
q_calc_smstd = _calc_query("price_smstd")
q_calc_smvar = _calc_query("price_smvar")
q_calc_smrsd = _calc_query("price_smrsd")


# -- native OLAP extensions (SURVEY §2.4 upgrade) ---------------------------


def q_rollup_ym(spark, sf_dir):
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["date@ym:month"], aggregates=["quantity_sum"],
        include_keys_only=True,
    )
    base = df.select(
        F.col("`date.year`").cast("long").alias("year"),
        F.col("`date.month`").cast("long").alias("month"),
        F.col("quantity_sum"),
    )
    out = olap.rollup_aggregate(
        base, ["year", "month"],
        [F.sum("quantity_sum").cast("double").alias("quantity_sum")],
    )
    return _lng(out, "grouping_id")


def q_cube_flags(spark, sf_dir):
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["returnflag", "linestatus"], aggregates=["fact_count"],
    )
    out = olap.cube_aggregate(
        df.select(
            F.col("`returnflag.returnflag`").alias("returnflag"),
            F.col("`linestatus.linestatus`").alias("linestatus"),
            F.col("fact_count"),
        ),
        ["returnflag", "linestatus"],
        [F.sum("fact_count").cast("long").alias("fact_count")],
    )
    return _lng(out, "grouping_id")


def q_preagg_year(spark, sf_dir):
    """Pre-aggregation rewrite: a month-grain cuboid is materialized,
    then a coarser year-grain query is served from it — the result must
    equal computing from the raw fact table (the oracle does)."""
    import tempfile

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = ("preagg", id(spark), sf_dir)
    if key not in _browsers:
        # dedicated browser: the cuboid must not rewrite other queries
        ws = tpch_workspace(spark, sf_dir)
        browser = ws.browser("sales")
        path = tempfile.mkdtemp(prefix="cubes_spark_cuboid_") + "/ym"
        browser.materialize_cuboid(
            path, drilldown=["date@ym:month"],
            aggregates=["quantity_sum", "price_sum", "fact_count"],
        )
        _browsers[key] = browser
    browser = _browsers[key]
    df = browser.aggregation_dataframe(
        drilldown=["date:year"],
        aggregates=["quantity_sum", "price_sum", "fact_count"],
    )
    return _lng(_dbl(df, "quantity_sum", "price_sum"), "date.year",
                "fact_count")


def q_grouping_sets(spark, sf_dir):
    """GROUP BY GROUPING SETS — one pass over two disjoint cuboids."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["returnflag", "linestatus"], aggregates=["quantity_sum"],
    )
    base = df.select(
        F.col("`returnflag.returnflag`").alias("returnflag"),
        F.col("`linestatus.linestatus`").alias("linestatus"),
        F.col("quantity_sum"),
    )
    out = olap.grouping_sets_aggregate(
        base, [["returnflag"], ["linestatus"]],
        ["CAST(sum(quantity_sum) AS DOUBLE) AS quantity_sum"],
    )
    return out


def q_crosstab(spark, sf_dir):
    """Pivot: returnflag rows × linestatus columns, fact counts."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["returnflag", "linestatus"], aggregates=["fact_count"],
    )
    out = olap.crosstab(
        df.select(
            F.col("`returnflag.returnflag`").alias("returnflag"),
            F.col("`linestatus.linestatus`").alias("linestatus"),
            F.col("fact_count"),
        ),
        rows=["returnflag"], column="linestatus",
        value=F.sum("fact_count").cast("long"),
        values=["F", "O"],
    )
    # an empty (flag, status) cell pivots to NULL while the oracle's
    # filtered COUNT yields 0 — on real TPC-H distributions (A,O) and
    # (R,O) are empty; the synthetic data only populates all six
    # combos by accident of the generator
    return out.select(
        "returnflag",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("F"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("O"),
    )


# ---------------------------------------------------------------------------
# events table (batch form of the streaming model)
# ---------------------------------------------------------------------------


def q_events_hourly(spark, sf_dir):
    """Tumbling 1-hour windows over event time — the batch equivalent of
    the streaming aggregation (same plan shape Structured Streaming
    runs incrementally)."""
    ev = _table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)")).alias("value_sum"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("value_sum").cast("double").alias("value_sum"),
            F.col("n_users").cast("long").alias("n_users"),
        )
    )


def q_events_stream_hourly(spark, sf_dir):
    """The SAME hourly aggregation as q_events_hourly, executed as a
    Structured Streaming query: events replayed through a watermarked
    file stream (availableNow), result from the memory sink.  Verified
    against the same SQL oracle — streaming == batch == oracle."""
    from cubes_spark.streaming import read_parquet_stream, replay_to_memory, \
        windowed_aggregate

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # schema=None: derive the stream schema from the source footer
    # (nanos/micros/millis all handled) instead of hard-coding a unit
    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    windowed = windowed_aggregate(
        stream,
        {
            "n_events": F.count(F.lit(1)).cast("long"),
            "value_sum": F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double"),
        },
        window="1 hour", group_by=["event_type"], watermark="2 hours",
    )
    result = replay_to_memory(windowed, "q_events_stream_hourly")
    return result.select("window_start", "event_type", "n_events",
                         "value_sum")


def q_events_stream_dedup(spark, sf_dir):
    """Streaming ingest dedup (dropDuplicatesWithinWatermark) over the
    replayed bounded events stream: first arrival per normalized
    (event_type|props) content wins, state bounded by the watermark.
    Aggregated to per-type unique counts so the result is independent
    of which duplicate row arrived first."""
    from cubes_spark.streaming import read_parquet_stream, \
        replay_to_memory, stream_exact_dedup

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    keyed = stream.withColumn(
        "__content__", F.concat_ws("|", "event_type", "props"))
    dedup = stream_exact_dedup(keyed, text_col="__content__",
                               id_col="event_id", ts_col="ts",
                               watermark="2 hours")
    result = replay_to_memory(dedup, "q_events_stream_dedup",
                              output_mode="append")
    return result.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_unique"))


def q_events_sessions(spark, sf_dir):
    """CUSTOM STATEFUL streaming operator (applyInPandasWithState):
    gap-based sessionization with an ordered event-type sequence
    payload — semantics session_window can't express — replayed over
    the bounded events stream in append mode.  Each user's final open
    session stays in GroupState (the append contract; the huge
    watermark keeps event-time timeouts from firing during replay), so
    the oracle's islands query drops each user's last session too."""
    from cubes_spark.streaming import read_parquet_stream, \
        replay_to_memory, stateful_sessionize

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    sessions = stateful_sessionize(stream, gap_seconds=1800,
                                   watermark="3650 days")
    return replay_to_memory(sessions, "q_events_sessions",
                            output_mode="append")


def q_events_sessions_native(spark, sf_dir):
    """Native session_window aggregation (state-merging sessions,
    gap 30 min) per user — the built-in counterpart of the custom
    stateful operator; session end = last event + gap, so the islands
    oracle adds the gap to each session's max timestamp."""
    from cubes_spark.streaming import session_aggregate

    ev = _table(spark, sf_dir, "events")
    out = session_aggregate(
        ev,
        {
            "n_events": F.count(F.lit(1)).cast("long"),
            "value_sum": F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double"),
        },
        gap="30 minutes", group_by=["user_id"],
    )
    return _lng(out, "user_id", "n_events")


def q_events_browse(spark, sf_dir):
    """The streaming fact browsed through the OLAP model: calendar
    cut + drilldown over the events cube (the store reads the
    TIMESTAMP(NANOS) column transparently; the date cut's sargable
    rewrite pushes a raw timestamp range into the scan)."""
    df = _ws(spark, sf_dir).browser("events").aggregation_dataframe(
        cell="date:2024,1",
        drilldown=["date:day", "etype"],
        aggregates=["value_sum", "fact_count"],
    )
    return _lng(_dbl(df, "value_sum"), "date.year", "date.month",
                "date.day", "fact_count")


def q_events_type_stats(spark, sf_dir):
    ev = _table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double").alias("value_sum"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# LLM-pipeline operators over documents / embeddings
# ---------------------------------------------------------------------------


def q_events_sliding(spark, sf_dir):
    """Sliding 2h/1h event-time windows (each event lands in two)."""
    from cubes_spark.streaming import windowed_aggregate

    ev = _table(spark, sf_dir, "events")
    out = windowed_aggregate(
        ev,
        {
            "n_events": F.count(F.lit(1)).cast("long"),
            "value_sum": F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double"),
        },
        window="2 hours", slide="1 hour", group_by=["event_type"],
    )
    return out.select("window_start", "event_type", "n_events", "value_sum")


def q_doc_common_ngrams(spark, sf_dir):
    """Most common 5-gram shingles across documents (dedup-analysis
    signal): document frequency per distinct shingle, top 20."""
    from cubes_spark.llm.dedup import _shingle_array
    from cubes_spark.llm.util import spread

    docs = _table(spark, sf_dir, "documents")
    exploded = spread(docs).select(
        F.col("doc_id"),
        F.explode(_shingle_array(F.col("text"), 5)).alias("shingle"),
    )
    return (
        exploded.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("shingle").asc())
        .limit(20)
    )


def q_doc_quality_filter(spark, sf_dir):
    """The pretraining-filter shape: keep documents above a quality
    threshold."""
    docs = _table(spark, sf_dir, "documents")
    stats = text_stats(docs)
    return stats.filter(F.col("quality_score") >= 0.5).select(
        "doc_id", "lang", "n_tokens", "quality_score"
    )


def q_doc_text_stats(spark, sf_dir):
    docs = _table(spark, sf_dir, "documents")
    return text_stats(docs).select(
        "doc_id", "n_chars_c", "n_tokens", "avg_token_len", "punct_ratio",
        "digit_ratio", "space_ratio", "stopword_ratio_en", "quality_score",
    )


def q_doc_bpe_tokens(spark, sf_dir):
    """Whitespace vs BPE-ish-regex token counts per document."""
    from cubes_spark.llm.text import bpe_token_count, token_array

    docs = _table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(token_array(F.col("text"))).cast("long").alias("n_ws_tokens"),
        bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


def q_doc_lang_quality(spark, sf_dir):
    """Quality roll-up by language.  The sum is computed over integer
    basis points (round(score*10000) as long) — exact integer addition
    on both engines, one double division at the end — so the result is
    bit-identical regardless of each engine's double→decimal rounding
    (the same bridge the emb_*_recall entries use)."""
    stats = text_stats(_table(spark, sf_dir, "documents"))
    return (
        stats.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("n_tokens")).cast("long").alias("total_tokens"),
            F.sum(F.round(F.col("quality_score") * 10000).cast("long"))
            .alias("_quality_bp"),
        )
        .withColumn(
            "quality_sum",
            (F.col("_quality_bp") / F.lit(10000.0)).cast("double"))
        .drop("_quality_bp")
    )


def q_doc_langid(spark, sf_dir):
    """Stopword language-ID predictions, counted per predicted lang."""
    pred = language_id(_table(spark, sf_dir, "documents"))
    return pred.groupBy("lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


def q_doc_fingerprint(spark, sf_dir):
    """Portable 60-bit document fingerprints (md5-derived)."""
    return fingerprint(_table(spark, sf_dir, "documents")) \
        .select("doc_id", "fingerprint")


def q_doc_exact_dup(spark, sf_dir):
    """Exact duplicate clusters (hash groupBy)."""
    docs = _table(spark, sf_dir, "documents")
    return exact_duplicates(docs).select(
        "content_hash",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("canonical_id").cast("long").alias("canonical_id"),
    )


def q_doc_minhash(spark, sf_dir):
    """MinHash-LSH near-duplicate candidate pairs (banded join)."""
    docs = _table(spark, sf_dir, "documents")
    return _lng(
        minhash_candidate_pairs(docs, num_hashes=16, bands=4, shingle_k=5),
        "id_a", "id_b",
    )


def q_doc_jaccard(spark, sf_dir):
    """LSH candidates verified by exact shingle-set Jaccard >= 0.5."""
    docs = _table(spark, sf_dir, "documents")
    cand = minhash_candidate_pairs(docs, num_hashes=16, bands=4,
                                   shingle_k=5).select("id_a", "id_b")
    return _lng(ngram_jaccard_pairs(cand, docs, shingle_k=5,
                                    min_jaccard=0.5), "id_a", "id_b")


def q_doc_simhash(spark, sf_dir):
    """SimHash near-duplicates (Hamming <= 3) via exact pigeonhole
    banding — identical to the all-pairs answer by construction."""
    docs = _table(spark, sf_dir, "documents")
    return _lng(
        simhash_near_duplicates(docs, nbits=48, max_distance=3),
        "id_a", "id_b", "distance",
    )


def q_emb_topk(spark, sf_dir):
    """Brute-force cosine top-5 for every 50th vector."""
    emb = _table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    out = cosine_topk(emb, queries, k=5)
    return _lng(out, "query_id", "neighbor_id", "rank")


def q_emb_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, exact method (the LSH
    scale path is bench/test-covered; exact matches the all-pairs SQL
    oracle bit-for-bit)."""
    emb = _table(spark, sf_dir, "embeddings")
    out = embedding_near_duplicates(emb, threshold=0.4, method="exact")
    return _lng(out, "id_a", "id_b")


def q_emb_ann(spark, sf_dir):
    """LSH-bucketed approximate nearest neighbours.  Deterministic
    (md5-derived hyperplanes), so the full approximate result has an
    exact SQL oracle (see _emb_ann_oracle)."""
    emb = _table(spark, sf_dir, "embeddings")
    out = ann_lsh_cosine(emb, k=5, num_planes=8, num_tables=2)
    return _lng(out, "query_id", "neighbor_id", "rank")


def q_emb_ivf(spark, sf_dir):
    """IVF (FAISS-style) approximate top-k: sample-trained centroids,
    cluster equi-join, multi-probe.  Training is fixed-seed on a fixed
    sorted sample, so the trained centroids — and hence the full result
    — have an exact SQL oracle (see _emb_ivf_oracle)."""
    from cubes_spark.llm import ivf_topk

    emb = _table(spark, sf_dir, "embeddings")
    out = ivf_topk(emb, k=5, nlist=16, nprobe=4)
    return _lng(out, "query_id", "neighbor_id", "rank")


def q_emb_kmeans(spark, sf_dir):
    """Embedding clustering: every vector assigned to its nearest
    sample-trained spherical-k-means centroid (fixed seed, centroid
    literals in-plan — exact SQL oracle replays the training,
    cubes_spark/llm/similarity.py:kmeans_clusters)."""
    from cubes_spark.llm import kmeans_clusters

    emb = _table(spark, sf_dir, "embeddings")
    return kmeans_clusters(emb, nlist=16, seed=42, sample_size=4096)


def q_emb_semdedup(spark, sf_dir):
    """SemDeDup-shaped semantic dedup: within-k-means-cell cosine
    near-dups dropped greedily by lowest id; pairwise work is an
    equi-join on cluster id, never corpus x corpus
    (cubes_spark/llm/similarity.py:semantic_dedup)."""
    from cubes_spark.llm import semantic_dedup

    emb = _table(spark, sf_dir, "embeddings")
    # the synthetic embeddings are near-orthogonal (max within-cell
    # cosine ~0.49): 0.35 makes the drop path observable
    out = semantic_dedup(emb, threshold=0.35, nlist=16, seed=42,
                         sample_size=4096)
    return out.select(
        "vec_id", "cluster",
        F.col("is_kept").cast("int").cast("long").alias("is_kept"),
    )


# ---------------------------------------------------------------------------
# driver-verified entries for formerly pytest-only operators (SURVEY §2:
# summary row, registry avg/stddev/variance, join methods, compound keys,
# fact-by-key, null-aggregate filter, order normalization, localization,
# schema inspection, denormalized sink, cuboid enumeration)
# ---------------------------------------------------------------------------


def q_agg_summary(spark, sf_dir):
    """Summary aggregation (no drilldown): the one-row cell total
    (parity: query/browser.py summary path)."""
    res = _browser(spark, sf_dir).aggregate(
        cell="date:1995",
        aggregates=["price_sum", "quantity_sum", "fact_count"],
    )
    s = res.summary
    return spark.createDataFrame(
        [(float(s["price_sum"]), float(s["quantity_sum"]),
          int(s["fact_count"]))],
        schema="price_sum double, quantity_sum double, fact_count long",
    )


def q_agg_registry_stats(spark, sf_dir):
    """avg/stddev/variance through the aggregate-function REGISTRY
    (functions/aggregates.py) — decimal measures use the exact-sum
    deterministic implementations, so the result is bit-reproducible
    under any partitioning and SQL-expressible."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["returnflag"],
        aggregates=["quantity_avg", "discount_avg", "price_stddev",
                    "price_variance", "fact_count"],
    )
    return _lng(df, "fact_count")


def q_cell_count_total(spark, sf_dir):
    """Total cell count computed alongside a paginated drilldown
    (single-pass persist; parity: total_cell_count)."""
    res = _browser(spark, sf_dir).aggregate(
        cell="date:1995", drilldown=["date@ym:month"],
        aggregates=["fact_count"],
        page=0, page_size=5, include_cell_count=True,
    )
    return spark.createDataFrame(
        [(int(res.total_cell_count),)], schema="total_cell_count long"
    )


def q_fact_by_key(spark, sf_dir):
    """Single fact lookup by key (parity: sql/browser.py:211-232).
    Projected fields are order-level, hence constant across the order's
    line items — the limit(1) row is deterministic."""
    row = _browser(spark, sf_dir).fact(
        42, fields=["order.status", "customer_geo.nation_name"]
    )
    return spark.createDataFrame(
        [(int(row["fact_key"]), row["order.status"],
          row["customer_geo.nation_name"])],
        schema="fact_key long, `order.status` string, "
               "`customer_geo.nation_name` string",
    )


def q_join_master_brand(spark, sf_dir):
    """Master (left-outer) join to the `big_parts` NAMED TABLE
    EXPRESSION: line items of small parts keep a NULL brand group."""
    df = _ws(spark, sf_dir).browser("sales_outer").aggregation_dataframe(
        drilldown=["bigpart"],
        aggregates=["quantity_sum", "fact_count"],
    )
    return _lng(_dbl(df, "quantity_sum"), "fact_count")


def q_join_detail_brand(spark, sf_dir):
    """Detail (right-outer) join: every `big_parts_ext` row is kept,
    including the sentinel brand no fact references."""
    df = _ws(spark, sf_dir).browser("sales_detail").aggregation_dataframe(
        drilldown=["bigpart"],
        aggregates=["retailprice_sum", "fact_count"],
    )
    return _lng(_dbl(df, "retailprice_sum"), "fact_count")


def q_join_compound_dqty(spark, sf_dir):
    """Compound-key join (l_orderkey, l_linenumber) to a derived detail
    table; a single-key join would fan out differently and change the
    sums."""
    df = _ws(spark, sf_dir).browser("sales_outer").aggregation_dataframe(
        drilldown=["returnflag"],
        aggregates=["quantity_sum", "dqty_sum"],
    )
    return _dbl(df, "quantity_sum", "dqty_sum")


def q_agg_null_filter(spark, sf_dir):
    """exclude_null_aggregates: drilldown rows with any NULL aggregate
    are dropped (parity: sql/browser.py:454-459) — here the NULL-brand
    group (its retailprice sum is NULL under the left join)."""
    browser = _ws(spark, sf_dir).browser(
        "sales_outer", exclude_null_aggregates=True
    )
    df = browser.aggregation_dataframe(
        drilldown=["bigpart"],
        aggregates=["retailprice_sum", "quantity_sum"],
    )
    return _dbl(df, "retailprice_sum", "quantity_sum")


def q_calc_order_norm(spark, sf_dir):
    """Order normalization for post-calculators: explicit month:desc is
    supplemented with the natural year order, and the SMA window follows
    the normalized order."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["date@ym:month"],
        aggregates=["price_sum", "price_sma"],
        order=["date.month:desc"],
    )
    out = _dbl(df, "price_sum", "price_sma")
    return _lng(out, "date.year", "date.month")


def q_members_locale(spark, sf_dir):
    """Localized member listing: browser locale 'xx' resolves
    nation_name through its locale-specific mapping
    (parity: sql/mapper.py:240-248)."""
    browser = _ws(spark, sf_dir).browser("sales", locale="xx")
    df = browser.members_dataframe(
        cell="customer_geo:2", dimension="customer_geo", depth=2,
    )
    return _lng(df, "customer_geo.region_key", "customer_geo.nation_key")


def q_schema_inspect(spark, sf_dir):
    """Store schema inspection: tables and their columns in ordinal
    order (parity: sql/store.py:631-661)."""
    store = _ws(spark, sf_dir).store
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]
    rows = []
    for name in tables:
        for i, field in enumerate(store.table(name).schema.fields):
            rows.append((name, field.name, i + 1))
    return spark.createDataFrame(
        rows, schema="table_name string, column_name string, ordinal long"
    )


def q_denorm_sink(spark, sf_dir):
    """Denormalized-view sink round-trip: materialize the star to
    parquet, read it back, aggregate — must equal aggregating the raw
    fact table (parity: create_denormalized_view,
    sql/store.py:294-370)."""
    import os
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(),
        f"cubes_spark_denorm_{abs(hash(sf_dir)) % 10**8}",
    )
    olap.materialize_denormalized(_browser(spark, sf_dir), path)
    back = spark.read.parquet(path)
    out = back.groupBy(F.col("returnflag__returnflag").alias("returnflag")) \
        .agg(
            F.sum("quantity").cast("double").alias("quantity_sum"),
            F.count(F.lit(1)).cast("long").alias("fact_count"),
        )
    return out


def q_cuboid_enum(spark, sf_dir):
    """Cuboid / level-combination enumeration for pre-aggregation
    planning (parity: query/computation.py:15-70)."""
    ws = _ws(spark, sf_dir)
    rows = []
    cuboids = olap.combined_cuboids(
        ["date", "customer_geo", "part"], required=("date",)
    )
    for i, combo in enumerate(cuboids):
        rows.append(("cuboid", i + 1, "|".join(combo)))
    levels = olap.combined_levels(
        [ws.dimension("date"), ws.dimension("customer_geo")]
    )
    for i, combo in enumerate(levels):
        rows.append(
            ("levels", i + 1, "|".join(",".join(p) for p in combo))
        )
    return spark.createDataFrame(
        rows, schema="kind string, seq long, spec string"
    )


_PLANT_OFFSET = 10_000_000


def _augmented_embeddings(spark, sf_dir):
    """Corpus + planted near-duplicates: for every vec_id % 10 == 0, a
    copy with +0.2 on component 1 (cosine ≈ 0.98 to its source) under
    id + 10M.  Deterministic double arithmetic on the float-cast
    values, so the oracle reconstructs identical vectors.  Random
    unit vectors never reach cosine 0.9, so the planted pairs are
    exactly the ≥0.9 near-duplicate ground truth."""
    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"),
        F.concat(
            F.array(F.element_at(vd, 1) + F.lit(0.2)),
            F.slice(vd, 2, F.size(vd) - 1),
        ).alias("embedding"),
    )
    return emb.select(
        "vec_id", vd.alias("embedding")
    ).unionByName(planted)


def q_emb_ann_recall(spark, sf_dir):
    """Driver signal for the ANN *scale* path quality: recall@1 of the
    LSH pipeline (the 100 TB path) on planted near-duplicate queries —
    the workload ANN is for (a random corpus's low-cosine neighbours
    are information-theoretically invisible to LSH; its true metric is
    finding HIGH-similarity matches).  Emits auditable counts: the
    recall in integer basis points and the >=0.8 acceptance bit.  The
    oracle recomputes both the exact and the LSH side independently."""
    corpus = _augmented_embeddings(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") >= _PLANT_OFFSET)
    exact = cosine_topk(corpus, queries, k=1).select(
        "query_id", "neighbor_id")
    approx = (
        ann_lsh_cosine(corpus, k=1, num_planes=8, num_tables=4)
        .filter(F.col("query_id") >= _PLANT_OFFSET)
        .select("query_id", "neighbor_id")
        .withColumn("__hit__", F.lit(1))
    )
    marked = exact.join(approx, ["query_id", "neighbor_id"], "left")
    agg = marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum(F.coalesce(F.col("__hit__"), F.lit(0)))
        .cast("long").alias("n_hit"),
    )
    return agg.select(
        "n_exact", "n_hit",
        F.expr("n_hit * 10000 div n_exact").alias("recall_bp"),
        (F.col("n_hit") * 10 >= F.col("n_exact") * 8).alias("recall_ok"),
    )


def q_emb_ivf_recall(spark, sf_dir):
    """Driver signal for the IVF *scale* path quality: recall@1 of
    sample-trained IVF with nprobe=4/nlist=16 on the planted
    near-duplicate queries; same auditable-count shape as
    emb_ann_recall.  The oracle retrains the identical fixed-seed
    k-means on the identically-constructed sample."""
    from cubes_spark.llm import ivf_topk

    corpus = _augmented_embeddings(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") >= _PLANT_OFFSET)
    exact = cosine_topk(corpus, queries, k=1).select(
        "query_id", "neighbor_id")
    approx = (
        ivf_topk(corpus, queries, k=1, nlist=16, nprobe=4,
                 exclude_self=True)
        .select("query_id", "neighbor_id")
        .withColumn("__hit__", F.lit(1))
    )
    marked = exact.join(approx, ["query_id", "neighbor_id"], "left")
    agg = marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum(F.coalesce(F.col("__hit__"), F.lit(0)))
        .cast("long").alias("n_hit"),
    )
    return agg.select(
        "n_exact", "n_hit",
        F.expr("n_hit * 10000 div n_exact").alias("recall_bp"),
        (F.col("n_hit") * 10 >= F.col("n_exact") * 8).alias("recall_ok"),
    )


def q_emb_projection(spark, sf_dir):
    """Deterministic JL random projection (md5-derived matrix) of
    every 25th embedding to 8 dims, exploded to (vec_id, idx, value)
    rows — the oracle replays the same projection with plane
    literals."""
    from cubes_spark.llm import random_projection

    emb = _table(spark, sf_dir, "embeddings") \
        .filter(F.col("vec_id") % 25 == 0)
    out = random_projection(emb, out_dim=8).select(
        "vec_id", F.posexplode("projected").alias("idx", "value")
    )
    return _lng(
        out.select("vec_id", "idx", F.round("value", 6).alias("value")),
        "vec_id", "idx",
    )


def q_emb_neardup_recall(spark, sf_dir):
    """Driver signal for the LSH near-duplicate *scale* path: engine
    runs method='lsh' (bucketed candidates + exact-cosine verify) and
    the exact all-pairs method at threshold 0.9 over the
    planted-duplicate corpus, and emits recall counts plus the
    precision==1.0 invariant (every LSH pair is exact-verified)."""
    corpus = _augmented_embeddings(spark, sf_dir)
    exact = embedding_near_duplicates(
        corpus, threshold=0.9, method="exact").select("id_a", "id_b")
    lsh = embedding_near_duplicates(
        corpus, threshold=0.9, method="lsh", num_planes=8, num_tables=4
    ).select("id_a", "id_b").withColumn("__hit__", F.lit(1))
    marked = exact.join(lsh, ["id_a", "id_b"], "left")
    agg = marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum(F.coalesce(F.col("__hit__"), F.lit(0)))
        .cast("long").alias("n_hit"),
    ).crossJoin(
        lsh.agg(F.count(F.lit(1)).cast("long").alias("n_lsh"))
    )
    return agg.select(
        "n_exact", "n_lsh", "n_hit",
        F.expr("n_hit * 10000 div n_exact").alias("recall_bp"),
        (F.col("n_hit") == F.col("n_lsh")).alias("precision_ok"),
        (F.col("n_hit") * 10 >= F.col("n_exact") * 8).alias("recall_ok"),
    )


def q_preagg_refresh(spark, sf_dir):
    """Incremental cuboid maintenance: month-grain cuboid built from
    the <=1995 slice, 1996+ merged in as a delta (union + one groupBy
    over distributive partials), then served re-aggregated to year
    grain — must equal aggregating the raw facts."""
    import os
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(),
        f"cubes_spark_refresh_{abs(hash(sf_dir)) % 10**8}",
    )
    browser = _browser(spark, sf_dir)
    olap.materialize_aggregate(
        browser, path, drilldown=["date@ym:month"],
        aggregates=["quantity_sum", "fact_count"], cell="date:-1995",
    )
    olap.refresh_aggregate(
        browser, path, drilldown=["date@ym:month"],
        aggregates=["quantity_sum", "fact_count"],
        delta_cell="date:1996-",
    )
    cuboid = spark.read.parquet(path)
    out = cuboid.groupBy(F.col("date__year").alias("year")).agg(
        F.sum("quantity_sum").cast("double").alias("quantity_sum"),
        F.sum("fact_count").cast("long").alias("fact_count"),
    )
    return _lng(out, "year", "fact_count")


def q_salted_join(spark, sf_dir):
    """Skew-salted dimension join (operators/scale.py): result-set
    identical to the plain equi-join — only the partitioning changes —
    so the plain SQL join IS the oracle."""
    from cubes_spark.operators.scale import salted_join

    li = _table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity")
    part = _table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li, part.withColumnRenamed("p_partkey", "l_partkey"),
        ["l_partkey"], salt=8,
    )
    out = joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.sum(F.col("l_quantity").cast("decimal(20,2)"))
        .cast("double").alias("quantity_sum"),
        F.count(F.lit(1)).cast("long").alias("fact_count"),
    )
    return out


def q_bucketed_join(spark, sf_dir):
    """Bucketed co-located join (operators/scale.py:write_bucketed):
    orders and lineitem written bucketed on the order key, re-read
    from the catalog and sort-merge-joined (merge hint — broadcast
    would trivially have no exchange and prove nothing).  The entry
    ASSERTS the executed plan contains zero hash-partition exchanges
    before returning, so a green driver row certifies both the values
    AND the shuffle-free co-location; result-set is identical to the
    plain join, so plain SQL is the oracle."""
    import os
    import tempfile

    from cubes_spark.operators.scale import (
        join_exchanges,
        read_bucketed_table,
        write_bucketed,
    )

    base = tempfile.mkdtemp(prefix="bucketed_join_")
    orders = _table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    li = _table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    write_bucketed(orders, "bkt_orders_entry", ["o_orderkey"], 8,
                   path=os.path.join(base, "orders"))
    write_bucketed(li, "bkt_lineitem_entry", ["o_orderkey"], 8,
                   path=os.path.join(base, "lineitem"))
    left = read_bucketed_table(spark, "bkt_orders_entry")
    right = read_bucketed_table(spark, "bkt_lineitem_entry")
    joined = left.hint("merge").join(right, "o_orderkey")
    # groupBy on the bucket key: the join's output partitioning
    # already clusters on o_orderkey, so the aggregate adds no
    # exchange either — write once, never shuffle again
    out = joined.groupBy("o_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(20,2)"))
        .cast("double").alias("quantity_sum"),
        F.count(F.lit(1)).cast("long").alias("line_count"),
        F.max("o_orderpriority").alias("priority"),
    ).filter(F.col("line_count") >= 6)
    exchanges = join_exchanges(out)
    if exchanges:
        raise AssertionError(
            f"bucketed join plan shuffled: {exchanges}")
    return out


def q_doc_winnow(spark, sf_dir):
    """Winnowing (MOSS) fingerprints over documents, summarized per
    doc (fingerprint count + xor-fold of the selected minima) so the
    result stays compact while pinning the exact selected set.
    Verified on every 5th document (both sides identically) to keep
    the gate's md5-per-gram cost bounded — an explicit verification
    sample, not an operator limit."""
    from cubes_spark.llm import winnow_fingerprints

    docs = _table(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") % 5 == 0)
    fps = winnow_fingerprints(docs, k=8, window=16)
    out = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
        # xor-fold: order-independent exact digest of the selected set
        F.aggregate(F.collect_list("fingerprint"),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc.bitwiseXOR(x))
        .alias("fp_xor"),
    )
    return out


def q_doc_repetition(spark, sf_dir):
    """Within-document n-gram repetition fractions (Gopher-style
    filter signal) for n in (2, 3)."""
    from cubes_spark.llm import repetition_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    out = repetition_stats(docs).select(
        "doc_id", "dup_ngram_frac_2", "dup_ngram_frac_3")
    return _lng(out, "doc_id")


def q_doc_pii(spark, sf_dir):
    """PII scrub: per-kind match counts + md5 of the redacted text —
    the hash pins the replacement byte-for-byte."""
    from cubes_spark.llm import redact_pii

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    out = redact_pii(docs).select(
        "doc_id", "n_email", "n_ipv4", "n_phone",
        F.md5(F.col("text_redacted")).alias("redacted_hash"),
    )
    return _lng(out, "doc_id")


def q_doc_trigram_lm(spark, sf_dir):
    """Corpus-trigram fluency model: per-doc summed quantized log2
    probabilities under the corpus's own trigram distribution
    (integer 1e-4 units — exact at any parallelism)."""
    from cubes_spark.llm import trigram_logprob

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return trigram_logprob(docs, quantized=True)


def q_doc_pipeline(spark, sf_dir):
    """The FLAGSHIP training-data pipeline composition, one plan:
    quality scoring + repetition filter + exact-dedup canonical
    selection, summarized per language — the filter chain a
    pretraining corpus build runs, with every stage individually
    driver-verified elsewhere and the composition verified here."""
    from cubes_spark.llm import repetition_stats
    from cubes_spark.llm.dedup import content_hash
    from pyspark.sql import Window

    docs = _table(spark, sf_dir, "documents")
    annotated = repetition_stats(text_stats(docs))
    wmin = Window.partitionBy("__ch__")
    canon = annotated.withColumn(
        "__ch__", content_hash(F.col("text"))
    ).withColumn("__min_id__", F.min("doc_id").over(wmin))
    kept = canon.filter(
        (F.col("quality_score") >= 0.5)
        & (F.col("dup_ngram_frac_2") < 0.3)
        & (F.col("doc_id") == F.col("__min_id__"))
    )
    out = kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    return out


def q_doc_dup_clusters(spark, sf_dir):
    """Dedup CLUSTERS from near-dup PAIRS: distributed min-label
    propagation (connected components) over the MinHash-LSH candidate
    pairs, then canonical-member selection — the step a training-data
    pipeline runs to keep ONE document per duplicate cluster.  The
    oracle recomputes the same pairs (doc_minhash's full SQL replica)
    and the components independently via union-find."""
    from cubes_spark.llm import duplicate_clusters

    docs = _table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, num_hashes=16, bands=4,
                                    shingle_k=5)
    out = duplicate_clusters(docs, pairs)
    return _lng(out, "doc_id", "component")


def q_doc_multimodal(spark, sf_dir):
    """Multimodal binary columns end-to-end: build REAL image bytes
    (PNG/GIF/BMP/JPEG headers, format by doc_id%4, dimensions derived
    from doc_id) inside the plan, then parse them back with the
    pure-JVM header readers (cubes_spark/llm/multimodal.py) — format
    sniff, big-endian PNG IHDR, little-endian GIF/BMP fields and the
    bounded JPEG SOF marker walk all get driver-verified against a
    closed-form oracle."""
    from cubes_spark.llm import image_dimensions

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    w = (F.lit(100) + F.col("doc_id") % 900).cast("long")
    h = (F.lit(80) + F.col("doc_id") % 600).cast("long")

    def be(col, nhex):
        return F.lpad(F.hex(col), nhex, "0")

    def le16(col):
        return F.concat(be(col % 256, 2), be((col / 256).cast("long") % 256, 2))

    def le32(col):
        out = []
        for i in range(4):
            out.append(be((col / (256 ** i)).cast("long") % 256, 2))
        return F.concat(*out)

    png = F.concat(
        F.lit("89504E470D0A1A0A" "0000000D" "49484452"),
        be(w, 8), be(h, 8), F.lit("0802000000" "63726330"),
    )
    gif = F.concat(F.lit("474946383961"), le16(w), le16(h),
                   F.lit("F70000"))
    bmp = F.concat(
        F.lit("424D"), le32(F.lit(70)), F.lit("00000000"),
        le32(F.lit(54)), le32(F.lit(40)), le32(w), le32(h),
        F.lit("0100" "1800"),
    )
    jpeg = F.concat(
        F.lit("FFD8"
              "FFE0" "0010" "4A46494600010200000000000000"  # APP0
              "FFFE" "0009" "636F6D6D656E74"                # COM
              "FFC0" "0011" "08"),                          # SOF0
        be(h, 4), be(w, 4),
        F.lit("03" "000000000000000000" "FFD9"),
    )
    payload = F.unhex(
        F.when(F.col("doc_id") % 4 == 0, png)
        .when(F.col("doc_id") % 4 == 1, gif)
        .when(F.col("doc_id") % 4 == 2, bmp)
        .otherwise(jpeg)
    )
    df = docs.withColumn("payload", payload)
    out = image_dimensions(df, "payload").drop("n_bytes")
    return _lng(out, "doc_id", "width", "height")


def q_doc_pixel_decode(spark, sf_dir):
    """REAL pixel decode end-to-end: complete greyscale PNG files —
    zlib container with stored-deflate blocks and a correct adler32
    computed by an in-plan fold — are built per doc_id, then decoded
    by the stdlib PNG decoder (zlib inflate + unfiltering) inside the
    Arrow ``mapInPandas`` operator ``png_pixel_stats``
    (cubes_spark/llm/multimodal.py).  Pixel values are closed-form in
    doc_id, so the DuckDB oracle recomputes the expected sums without
    decoding."""
    from cubes_spark.llm import png_pixel_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    w = (F.lit(4) + F.col("doc_id") % 5).cast("long")
    h = (F.lit(3) + F.col("doc_id") % 4).cast("long")

    def hex2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    def le16(col):
        return F.concat(hex2(col % 256), hex2((col / 256).cast("long")))

    def be32(col):
        return F.lpad(F.hex(col.cast("long")), 8, "0")

    # raw scanlines: filter byte 0 + pixel(x, y) = (id*7+x*13+y*31)%256
    pix = lambda x, y: (F.col("doc_id") * 7 + x * 13 + y * 31) % 256
    raw_hex = F.aggregate(
        F.sequence(F.lit(0), h - 1), F.lit(""),
        lambda acc, y: F.concat(
            acc, F.lit("00"),
            F.aggregate(F.sequence(F.lit(0), w - 1), F.lit(""),
                        lambda a2, x: F.concat(a2, hex2(pix(x, y))))),
    )
    rawlen = h * (w + 1)
    # adler32 fold over the raw bytes (RFC 1950): s1=(s1+b)%65521,
    # s2=(s2+s1)%65521 per byte
    adler = F.aggregate(
        F.sequence(F.lit(1), rawlen),
        F.struct(F.lit(1).cast("long").alias("s1"),
                 F.lit(0).cast("long").alias("s2")),
        lambda acc, i: F.struct(
            ((acc.getField("s1")
              + F.conv(F.substring(raw_hex, (i * 2 - 1).cast("int"), 2),
                       16, 10).cast("long")) % 65521).alias("s1"),
            ((acc.getField("s2") + acc.getField("s1")
              + F.conv(F.substring(raw_hex, (i * 2 - 1).cast("int"), 2),
                       16, 10).cast("long")) % 65521).alias("s2"),
        ),
    )
    adler_hex = be32(adler.getField("s2") * 65536 + adler.getField("s1"))
    zlib_hex = F.concat(
        F.lit("7801" "01"), le16(rawlen), le16(F.lit(65535) - rawlen),
        raw_hex, adler_hex,
    )
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"            # signature
              "0000000D" "49484452"),       # IHDR length + type
        be32(w), be32(h),
        F.lit("0800000000"                  # bit depth 8, grey, no interlace
              "00000000"),                  # IHDR CRC (decoder is lenient)
        be32(rawlen + 11), F.lit("49444154"),   # IDAT length + type
        zlib_hex,
        F.lit("00000000"                    # IDAT CRC
              "00000000" "49454E44" "00000000"),  # IEND
    )
    df = docs.withColumn("payload", F.unhex(png_hex))
    stats = png_pixel_stats(df, "payload")
    return stats.withColumn(
        "sample_mean",
        (F.col("sample_sum").cast("double")
         / F.col("n_samples")).cast("double"))


def _inplan_wav(docs):
    """Complete mono 16-bit PCM WAV files built per doc_id in-plan:
    ``n = 20 + doc_id % 16`` frames at
    ``rate = 8000 + (doc_id % 4) * 4000`` Hz, sample(i) stored as
    u16 ``(doc_id*11 + i*17) % 65536`` — shared by the audio-decode
    and audio-resample driver entries, whose oracles recompute sums
    from that closed form (signed value = stored − 32768 via the
    s16le reinterpretation)."""
    n = (F.lit(20) + F.col("doc_id") % 16).cast("long")   # frames, mono
    rate = (F.lit(8000) + (F.col("doc_id") % 4) * 4000).cast("long")

    def hex2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    def le16(col):
        return F.concat(hex2(col % 256), hex2((col / 256).cast("long")))

    def le32(col):
        out = []
        for i in range(4):
            out.append(hex2((col / (256 ** i)).cast("long") % 256))
        return F.concat(*out)

    # sample(i) as u16 = (doc_id*11 + i*17) % 65536; signed value is
    # that minus 32768 (decoded by the s16le reader)
    data_hex = F.aggregate(
        F.sequence(F.lit(0), n - 1), F.lit(""),
        lambda acc, i: F.concat(
            acc, le16((F.col("doc_id") * 11 + i * 17) % 65536)),
    )
    wav_hex = F.concat(
        F.lit("52494646"), le32(n * 2 + 36), F.lit("57415645"),  # RIFF/WAVE
        F.lit("666D7420"), le32(F.lit(16)),                      # fmt , 16
        F.lit("0100" "0100"),              # PCM, mono
        le32(rate), le32(rate * 2),        # sample rate, byte rate
        F.lit("0200" "1000"),              # block align 2, 16 bits
        F.lit("64617461"), le32(n * 2),    # data chunk
        data_hex,
    )
    return docs.withColumn("payload", F.unhex(wav_hex))


def q_doc_audio_decode(spark, sf_dir):
    """REAL audio decode end-to-end: the shared in-plan PCM WAVs
    (:func:`_inplan_wav`) decoded by the stdlib WAV decoder inside the
    Arrow ``mapInPandas`` operator ``wav_sample_stats``
    (cubes_spark/llm/multimodal.py).  Sample values are closed-form in
    doc_id, so the DuckDB oracle recomputes the expected sums without
    decoding."""
    from cubes_spark.llm import wav_sample_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    stats = wav_sample_stats(_inplan_wav(docs), "payload")
    return stats.withColumn(
        "sample_mean",
        (F.col("sample_sum").cast("double")
         / F.col("n_samples")).cast("double"))


def q_doc_audio_resample(spark, sf_dir):
    """REAL audio resample end-to-end: the shared in-plan PCM WAVs
    decoded, then nearest-sample resampled to 4 kHz inside
    ``audio_resample_stats`` (cubes_spark/llm/multimodal.py,
    numpy-vectorized — the rate-normalization step of an audio
    training pipeline).  Output length is ``(n * 4000) // rate``
    frames and output frame j reads source frame ``(j*n) // out_n``
    (both pure integer floor), so the oracle recomputes the resampled
    sum from the stored-sample closed form without any decoding."""
    from cubes_spark.llm import audio_resample_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    return audio_resample_stats(_inplan_wav(docs), "payload", 4000,
                                method="nearest")


def q_doc_g711_decode(spark, sf_dir):
    """REAL G.711 µ-law decode end-to-end: complete format-7 (µ-law)
    WAV files built per doc_id in-plan — stored byte(i) =
    ``(doc_id*7 + i*13) % 256``, ``n = 24 + doc_id % 8`` frames —
    expanded to 16-bit through the ITU-T G.711 table inside
    ``wav_sample_stats`` (cubes_spark/llm/multimodal.py, table checked
    entry-for-entry against audioop).  The expansion is integer
    closed-form (complement → mantissa/segment shift), so the oracle
    recomputes the decoded sum directly in SQL."""
    from cubes_spark.llm import wav_sample_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    n = (F.lit(24) + F.col("doc_id") % 8).cast("long")   # frames, mono

    def hex2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    def le32(col):
        out = []
        for i in range(4):
            out.append(hex2((col / (256 ** i)).cast("long") % 256))
        return F.concat(*out)

    data_hex = F.aggregate(
        F.sequence(F.lit(0), n - 1), F.lit(""),
        lambda acc, i: F.concat(
            acc, hex2((F.col("doc_id") * 7 + i * 13) % 256)),
    )
    pad = (n % 2).cast("int")                 # word-align the chunk
    wav_hex = F.concat(
        F.lit("52494646"), le32(n + pad + 36), F.lit("57415645"),
        F.lit("666D7420"), le32(F.lit(16)),
        F.lit("0700" "0100"),                 # µ-law, mono
        le32(F.lit(8000)), le32(F.lit(8000)),  # rate, byte rate
        F.lit("0100" "0800"),                 # block align 1, 8 bits
        F.lit("64617461"), le32(n),           # data chunk
        data_hex, F.substring(F.lit("00"), 1, pad * 2),
    )
    df = docs.withColumn("payload", F.unhex(wav_hex))
    return wav_sample_stats(df, "payload")


def q_doc_gif_decode(spark, sf_dir):
    """REAL GIF decode end-to-end: complete GIF89a files are built
    per doc_id in-plan — pixels emitted as literal 9-bit LZW codes
    after a clear code (the standard 'uncompressed GIF' encoding, a
    valid LZW stream), bit-packed LSB-first by an in-plan fold — then
    decoded by the stdlib LZW decoder inside the Arrow ``mapInPandas``
    operator ``gif_pixel_stats`` (cubes_spark/llm/multimodal.py).
    Pixel indices are closed-form in doc_id; the grey palette makes
    rgb_sum = 3 × index_sum."""
    from cubes_spark.llm import gif_pixel_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    w = (F.lit(4) + F.col("doc_id") % 5).cast("long")
    h = (F.lit(3) + F.col("doc_id") % 3).cast("long")
    n = w * h                      # <= 40 pixels: 9-bit codes suffice

    def hex2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    def le16(col):
        return F.concat(hex2(col % 256), hex2((col / 256).cast("long")))

    # code stream: CLEAR(256), n literal pixel codes, EOI(257) — after
    # a clear the dict grows by one entry per literal, staying far
    # below 512, so every code is 9 bits wide
    codes = F.concat(
        F.array(F.lit(256).cast("long")),
        F.transform(
            F.sequence(F.lit(0).cast("long"), n - 1),
            lambda i: (F.col("doc_id") * 5 + i * 29) % 256),
        F.array(F.lit(257).cast("long")),
    )
    pow2 = F.array(*[F.lit(1 << k).cast("long") for k in range(8)])

    def pack_step(acc, c):
        # LSB-first: or the 9-bit code in at bit offset nb (nb <= 7),
        # emit one byte always, a second when 16 bits are pending
        buf2 = (acc.getField("buf")
                + c * F.element_at(pow2, acc.getField("nb").cast("int") + 1))
        nb2 = acc.getField("nb") + 9
        rest1 = (buf2 / 256).cast("long")
        nb3 = nb2 - 8
        two = nb3 >= 8
        return F.struct(
            F.concat(acc.getField("hex"), hex2(buf2 % 256),
                     F.when(two, hex2(rest1 % 256)).otherwise(F.lit("")))
            .alias("hex"),
            F.when(two, (rest1 / 256).cast("long")).otherwise(rest1)
            .alias("buf"),
            F.when(two, nb3 - 8).otherwise(nb3).alias("nb"),
        )

    packed = F.aggregate(
        codes,
        F.struct(F.lit("").alias("hex"),
                 F.lit(0).cast("long").alias("buf"),
                 F.lit(0).cast("long").alias("nb")),
        pack_step,
        lambda acc: F.when(
            acc.getField("nb") > 0,
            F.concat(acc.getField("hex"), hex2(acc.getField("buf") % 256)),
        ).otherwise(acc.getField("hex")),
    )
    grey_palette = "".join(f"{i:02X}" * 3 for i in range(256))
    gif_hex = F.concat(
        F.lit("474946383961"), le16(w), le16(h),        # GIF89a + screen
        F.lit("F70000"), F.lit(grey_palette),           # 256-color table
        F.lit("2C" "0000" "0000"), le16(w), le16(h), F.lit("00"),
        F.lit("08"),                                    # LZW min code size
        hex2(F.length(packed) / 2), packed, F.lit("00"),  # one sub-block
        F.lit("3B"),
    )
    df = docs.withColumn("payload", F.unhex(gif_hex))
    return gif_pixel_stats(df, "payload")


def _inplan_bmp(docs):
    """Complete 24-bit BI_RGB BMPs (bottom-up rows, 4-byte padding)
    built per doc_id in-plan, stored byte (x, y, channel c in B,G,R
    order) = ``(doc_id*3 + x*7 + y*11 + c*5) % 256`` with
    ``w = 3 + doc_id % 4``, ``h = 2 + doc_id % 3`` — shared by the
    BMP-decode and image-resize driver entries, whose oracles
    recompute pixel sums from that closed form."""
    w = (F.lit(3) + F.col("doc_id") % 4).cast("long")
    h = (F.lit(2) + F.col("doc_id") % 3).cast("long")

    def hex2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    def le16(col):
        return F.concat(hex2(col % 256), hex2((col / 256).cast("long")))

    def le32(col):
        out = []
        for i in range(4):
            out.append(hex2((col / (256 ** i)).cast("long") % 256))
        return F.concat(*out)

    # stored byte (x, image-row y, channel c in B,G,R order):
    byte = lambda x, y, c: (F.col("doc_id") * 3 + x * 7 + y * 11
                            + c * 5) % 256
    stride = ((w * 3 + 3) / 4).cast("long") * 4
    pad_hex = F.substring(F.lit("000000"), 1,
                          ((stride - w * 3) * 2).cast("int"))
    # file rows bottom-up: file row f holds image row y = h-1-f
    data_hex = F.aggregate(
        F.sequence(F.lit(0), h - 1), F.lit(""),
        lambda acc, f: F.concat(
            acc,
            F.aggregate(
                F.sequence(F.lit(0), w - 1), F.lit(""),
                lambda a2, x: F.concat(
                    a2, hex2(byte(x, h - 1 - f, 0)),
                    hex2(byte(x, h - 1 - f, 1)),
                    hex2(byte(x, h - 1 - f, 2)))),
            pad_hex),
    )
    bmp_hex = F.concat(
        F.lit("424D"), le32(stride * h + 54),       # BM + file size
        F.lit("00000000"), le32(F.lit(54)),         # reserved + offset
        le32(F.lit(40)), le32(w), le32(h),          # info header
        F.lit("0100" "1800"), le32(F.lit(0)),       # planes, 24bpp, BI_RGB
        le32(stride * h),
        le32(F.lit(2835)), le32(F.lit(2835)),       # ppm
        le32(F.lit(0)), le32(F.lit(0)),
        data_hex,
    )
    return docs.withColumn("payload", F.unhex(bmp_hex))


def q_doc_bmp_decode(spark, sf_dir):
    """REAL BMP decode end-to-end: the shared in-plan 24-bit BMPs
    (:func:`_inplan_bmp`) decoded by the stdlib BMP decoder inside
    ``bmp_pixel_stats`` (cubes_spark/llm/multimodal.py).  Stored bytes
    are closed-form in doc_id, so the oracle recomputes the sums
    without decoding (the BGR→RGB reorder does not change the sum)."""
    from cubes_spark.llm import bmp_pixel_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    return bmp_pixel_stats(_inplan_bmp(docs), "payload")


def q_doc_image_resize(spark, sf_dir):
    """REAL image resize end-to-end: the shared in-plan 24-bit BMPs
    decoded, then nearest-neighbor resized to 2×2 inside
    ``image_resize_stats`` (cubes_spark/llm/multimodal.py,
    numpy-vectorized — the uniform-shape step of a multimodal training
    pipeline).  Nearest maps output pixel x to source pixel
    ``(x*w) // 2`` (pure integer floor), so the oracle recomputes the
    resized sample sum from the stored-byte closed form without any
    decoding; summing all three channels makes the BGR→RGB reorder
    irrelevant."""
    from cubes_spark.llm import image_resize_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    return image_resize_stats(_inplan_bmp(docs), "payload", 2, 2,
                              method="nearest")


def q_doc_bmp_rle(spark, sf_dir):
    """REAL BI_RLE8 decode end-to-end: run-length-compressed 8-bit
    BMPs built in-plan — absolute mode (with its word-align pad byte)
    on the bottom file row, encoded runs + EOL on the rest, EOB
    terminator — decoded by the stdlib RLE8 state machine inside
    ``bmp_pixel_stats`` (cubes_spark/llm/multimodal.py:_decode_rle8);
    sums are row-order invariant so the oracle recomputes them from
    the closed form."""
    from cubes_spark.llm import bmp_pixel_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    w = (F.lit(4) + F.col("doc_id") % 3).cast("long")
    h = (F.lit(2) + F.col("doc_id") % 2).cast("long")

    def hex2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    def le32(col):
        return F.concat(*[hex2((col / (256 ** i)).cast("long") % 256)
                          for i in range(4)])

    val = lambda k: (F.col("doc_id") + k) % 200
    # bottom file row: absolute [v0 v1 v2] + pad, then run (w-3)·v3
    row0 = F.concat(
        F.lit("0003"), hex2(val(0)), hex2(val(1)), hex2(val(2)),
        F.lit("00"), hex2(w - 3), hex2(val(3)), F.lit("0000"))
    rest = F.aggregate(
        F.sequence(F.lit(1), h - 1), F.lit(""),
        lambda acc, y: F.concat(
            acc, hex2(w), hex2((F.col("doc_id") + y * 13) % 200),
            F.lit("0000")))
    rle = F.concat(row0, rest, F.lit("0001"))
    bmp_hex = F.concat(
        F.lit("424D"), le32(F.lit(0)),              # size (unchecked)
        F.lit("00000000"), le32(F.lit(58)),         # offset: 54 + 1 quad
        le32(F.lit(40)), le32(w), le32(h),
        F.lit("0100" "0800"), le32(F.lit(1)),       # planes, 8bpp, RLE8
        le32(F.lit(0)), le32(F.lit(2835)), le32(F.lit(2835)),
        le32(F.lit(1)), le32(F.lit(0)),             # biClrUsed=1
        F.lit("00000000"),                          # 1-entry palette
        rle,
    )
    bmps = docs.withColumn("payload", F.unhex(bmp_hex))
    return bmp_pixel_stats(bmps, "payload")


def _ima_decode_reference(data, pred, index):
    """Independent IMA ADPCM reference decode for the oracle: written
    from the public spec, deliberately NOT importing the library's
    state machine (which unit tests verify against audioop)."""
    steps = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28,
             31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107,
             118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
             337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876,
             963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
             2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
             5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
             12635, 13899, 15289, 16818, 18500, 20350, 22385,
             24623, 27086, 29794, 32767]
    adjust = [-1, -1, -1, -1, 2, 4, 6, 8]
    out = [pred]
    for byte in data:
        for nib in (byte & 0x0F, byte >> 4):
            step = steps[index]
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + adjust[nib & 7]))
            out.append(pred)
    return out


def q_doc_adpcm_decode(spark, sf_dir):
    """REAL IMA ADPCM decode end-to-end: format-0x11 WAVs built
    in-plan (4-byte block header with signed predictor + step index,
    low-nibble-first data), run through the IMA state machine inside
    ``wav_sample_stats`` (cubes_spark/llm/multimodal.py:
    _decode_ima_adpcm).  Inputs are keyed by doc_id % 8, so the oracle
    inlines the 8 reference-decoded sums as literals (decoded at
    oracle-generation time by an independent spec implementation)."""
    from cubes_spark.llm import wav_sample_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    r = F.col("doc_id") % 8
    pred = r * 100 - 300
    index = r * 3

    def hex2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    def le16(col):
        return F.concat(hex2(col % 256), hex2((col / 256).cast("long")))

    def le32(col):
        return F.concat(*[hex2((col / (256 ** i)).cast("long") % 256)
                          for i in range(4)])

    data_hex = F.concat(*[hex2((F.lit(j * 37) + r * 11) % 256)
                          for j in range(8)])
    block_hex = F.concat(le16((pred + 65536) % 65536), hex2(index),
                         F.lit("00"), data_hex)
    fmt_hex = F.concat(
        F.lit("1100" "0100"), le32(F.lit(8000)), le32(F.lit(8000)),
        le16(F.lit(12)), le16(F.lit(4)))
    wav_hex = F.concat(
        F.lit("52494646"), le32(F.lit(20 + 16 + 12)),
        F.lit("57415645" "666D7420"), le32(F.lit(16)), fmt_hex,
        F.lit("64617461"), le32(F.lit(12)), block_hex)
    wavs = docs.withColumn("payload", F.unhex(wav_hex))
    return wav_sample_stats(wavs, "payload")


def q_auth_restricted(spark, sf_dir):
    """Authorization end-to-end: SimpleAuthorizer cell restriction
    (hidden cut returnflag:A + requested cut date:1995) applied to a
    drilldown — the restriction compiles to one more pushed-down
    filter (parity: auth.py:194-384 restricted_cell)."""
    from cubes_spark.auth import SimpleAuthorizer

    browser = _browser(spark, sf_dir)
    authz = SimpleAuthorizer(rights={
        "restricted": {
            "allowed_cubes": ["sales"],
            "cell_restrictions": {"sales": ["returnflag:A"]},
        },
    })
    cell = browser.prepare_cell("date:1995")
    restricted = authz.restricted_cell("restricted", browser.cube, cell)
    df = browser.aggregation_dataframe(
        cell=restricted, drilldown=["order"],
        aggregates=["quantity_sum", "fact_count"],
    )
    return _lng(_dbl(df, "quantity_sum"), "fact_count")


def q_json_lines_format(spark, sf_dir):
    """JSON-lines output formatter: one document per drilldown cell,
    exact field order (parity: formatters.py:136-148)."""
    browser = _browser(spark, sf_dir)
    result = browser.aggregate(
        cell="date:1995", drilldown=["returnflag"],
        aggregates=["fact_count"],
    )
    from cubes_spark.formatters import JSONLinesFormatter

    text = JSONLinesFormatter().format(browser.cube, result)
    rows = [(i, line) for i, line in enumerate(text.splitlines())]
    return spark.createDataFrame(rows, schema="line long, text string")


def q_agg_quantiles(spark, sf_dir):
    """Exact percentiles (Spark-native extra beyond the reference's
    aggregate set): F.percentile with linear interpolation — identical
    definition to ANSI quantile_cont, so the oracle is exact on the
    integral quantity values."""
    li = _table(spark, sf_dir, "lineitem")
    q = F.percentile(F.col("l_quantity").cast("long"),
                     [0.25, 0.5, 0.75])
    out = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        q.alias("qs"),
        F.count(F.lit(1)).cast("long").alias("fact_count"),
    )
    return out.select(
        "returnflag",
        F.element_at("qs", 1).alias("q25"),
        F.element_at("qs", 2).alias("q50"),
        F.element_at("qs", 3).alias("q75"),
        "fact_count",
    )


def q_agg_approx_distinct(spark, sf_dir):
    """HLL approx_count_distinct — the COUNT(DISTINCT) scale path (one
    fixed-size sketch per group instead of a distinct shuffle).  The
    sketch estimate is engine-defined, so the driver-checked contract
    is the exact count plus the <=5% relative-error acceptance bit."""
    li = _table(spark, sf_dir, "lineitem")
    out = li.agg(
        F.count_distinct("l_partkey").cast("long").alias("n_exact"),
        F.approx_count_distinct("l_partkey").cast("long")
        .alias("n_approx"),
    )
    err_ok = (
        F.abs(F.col("n_approx") - F.col("n_exact")) * 100
        <= F.col("n_exact") * 5
    )
    return out.select("n_exact", err_ok.alias("within_5pct"))


def q_report_combo(spark, sf_dir):
    """browser.report(): several query types batched over one cell
    (parity: query/browser.py:387-523), flattened to auditable rows."""
    browser = _browser(spark, sf_dir)
    rep = browser.report("date:1995", {
        "byflag": {"query": "aggregate", "drilldown": ["returnflag"],
                   "aggregates": ["fact_count"]},
        "statuses": {"query": "members", "dimension": "order",
                     "depth": 1},
        "total": {"query": "aggregate", "aggregates": ["fact_count"]},
    })
    rows = []
    for c in rep["byflag"]["cells"]:
        rows.append(("byflag", str(c["returnflag.returnflag"]),
                     int(c["fact_count"])))
    for m in rep["statuses"]:
        rows.append(("status", str(m["order.status"]), 0))
    rows.append(("total", "", int(rep["total"]["summary"]["fact_count"])))
    return spark.createDataFrame(
        rows, schema="kind string, member string, n long"
    )


def q_cell_details(spark, sf_dir):
    """cell_details / path_details: per-cut level keys and labels
    (parity: query/browser.py:525-639, sql/browser.py:314-343)."""
    browser = _browser(spark, sf_dir)
    details = browser.cell_details("customer_geo:2,7|date:1995")
    rows = []
    for i, detail in enumerate(details):
        for j, item in enumerate(detail):
            rows.append((i, j, str(item["_key"]), str(item["_label"])))
    return spark.createDataFrame(
        rows, schema="cut long, lvl long, key string, label string"
    )


def q_agg_natural_order(spark, sf_dir):
    """Natural (implicit level) order made observable through
    pagination: page 2 of 7 over a two-dimension drilldown is only
    stable if the engine orders by the drilldown's natural keys
    (parity: query/drilldown.py natural_order)."""
    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["date@ym:month", "returnflag"],
        aggregates=["fact_count"],
        page=2, page_size=7,
    )
    return _lng(df, "date.year", "date.month", "fact_count")


def q_csv_format(spark, sf_dir):
    """CSV output formatter byte-for-byte: header + natural-order data
    lines (parity: formatters.py:58-111,393-419)."""
    browser = _browser(spark, sf_dir)
    result = browser.aggregate(
        cell="date:1995", drilldown=["returnflag"],
        aggregates=["fact_count", "quantity_sum"],
    )
    from cubes_spark.formatters import CSVFormatter

    text = CSVFormatter().format(browser.cube, result)
    rows = [(i, line) for i, line in enumerate(text.splitlines())]
    return spark.createDataFrame(rows, schema="line long, text string")


def q_doc_chunks(spark, sf_dir):
    """Context-window chunking: fixed-size overlapping character
    chunks (max 256, overlap 32), verified chunk-for-chunk via md5
    (cubes_spark/llm/text.py:chunk_documents)."""
    from cubes_spark.llm import chunk_documents

    docs = _table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, max_chars=256, overlap=32)
    return chunks.select(
        F.col("doc_id"), F.col("chunk_id"),
        F.length("chunk_text").cast("long").alias("chunk_len"),
        F.md5(F.col("chunk_text")).alias("chunk_hash"),
    )


def q_doc_split(spark, sf_dir):
    """Deterministic hash-based train/val assignment (10% val),
    counted per (lang, split) — reproducible across engines
    (cubes_spark/llm/text.py:deterministic_split)."""
    from cubes_spark.llm import deterministic_split

    docs = deterministic_split(_table(spark, sf_dir, "documents"))
    return docs.groupBy("lang", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


def q_doc_normalize(spark, sf_dir):
    """Unicode normalization (NFC): a decomposed suffix ('e' + U+0301
    combining acute) appended in-plan must compose to the precomposed
    form — the canonical-form ingest step without which dedup/hashing
    treats visually identical text as different
    (cubes_spark/llm/text.py:normalize_unicode).  DuckDB's
    nfc_normalize is the oracle."""
    from cubes_spark.llm import normalize_unicode

    docs = _table(spark, sf_dir, "documents")
    src = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" caf"),
                 F.lit("e\u0301")).alias("text"))   # decomposed
    out = normalize_unicode(src)
    return out.select(
        "doc_id",
        F.length("normalized").cast("long").alias("n_chars_norm"),
        F.md5(F.col("normalized")).alias("norm_md5"),
    )


def q_doc_pagerank(spark, sf_dir):
    """Integer fixed-point PageRank over an in-plan link graph (each
    doc links to (id*2+1)%N and (id*3+2)%N), 3 iterations — bit-
    identical at any parallelism because all arithmetic is integer
    (cubes_spark/llm/web.py:link_pagerank); the oracle unrolls the
    same recurrence in SQL."""
    from cubes_spark.llm import link_pagerank

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 2 + 1) % n).alias("dst"),
    ).unionByName(docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 3 + 2) % n).alias("dst"),
    ))
    return link_pagerank(edges, iterations=3).select(
        F.col("node").cast("long").alias("node"),
        "rank_units",
    )


def _pagerank_oracle() -> str:
    """Unrolled 3-iteration integer PageRank recurrence (doc ids are
    contiguous 0..N-1, so the node set is exactly `documents`)."""
    scale = 10 ** 12

    def step(prev: str, cur: str) -> str:
        return f"""
        {cur} AS (
            SELECT n.node,
                (SELECT ({scale} * 150 // 1000) // c.n FROM cnt c)
                + COALESCE(SUM({prev}.r * 850 // (1000 * dg.dg)), 0)
                    AS r
            FROM nodes n
            LEFT JOIN edges e ON e.dst = n.node
            LEFT JOIN {prev} ON {prev}.node = e.src
            LEFT JOIN deg dg ON dg.node = e.src
            GROUP BY n.node)"""

    return f"""
        WITH cnt AS (SELECT COUNT(*) AS n FROM documents),
        nodes AS (SELECT doc_id AS node FROM documents),
        edges AS (
            SELECT d.doc_id AS src, (d.doc_id * 2 + 1) % c.n AS dst
            FROM documents d, cnt c
            UNION ALL
            SELECT d.doc_id, (d.doc_id * 3 + 2) % c.n
            FROM documents d, cnt c),
        deg AS (SELECT src AS node, COUNT(*) AS dg
                FROM edges GROUP BY 1),
        r0 AS (
            SELECT node, (SELECT {scale} // c.n FROM cnt c) AS r
            FROM nodes),
        {step('r0', 'r1')},
        {step('r1', 'r2')},
        {step('r2', 'r3')}
        SELECT CAST(node AS BIGINT) AS node,
            CAST(r AS BIGINT) AS rank_units
        FROM r3"""


def _textrank_oracle() -> str:
    """Unrolled 2-iteration integer PageRank over the adjacent
    content-token co-occurrence multigraph (both directions, self
    pairs dropped) — token-for-token the link_pagerank recurrence
    doc_pagerank replays, with the node set = distinct tokens."""
    scale = 10 ** 12

    def step(prev: str, cur: str) -> str:
        return f"""
        {cur} AS (
            SELECT n.node,
                (SELECT ({scale} * 150 // 1000) // c.n FROM cnt c)
                + COALESCE(SUM({prev}.r * 850 // (1000 * dg.dg)), 0)
                    AS r
            FROM nodes n
            LEFT JOIN edges e ON e.dst = n.node
            LEFT JOIN {prev} ON {prev}.node = e.src
            LEFT JOIN deg dg ON dg.node = e.src
            GROUP BY n.node)"""

    return rf"""
        WITH tok AS (
            SELECT doc_id, t, i FROM (
                SELECT doc_id,
                    unnest(CASE WHEN trim(lower(text)) = '' THEN []
                        ELSE string_split_regex(trim(lower(text)),
                                                '\s+') END) AS t,
                    generate_subscripts(
                        CASE WHEN trim(lower(text)) = '' THEN []
                        ELSE string_split_regex(trim(lower(text)),
                                                '\s+') END, 1) AS i
                FROM documents)
            WHERE regexp_matches(t, '^[a-z]{{3,}}$')),
        pairs AS (
            SELECT t AS a, lead(t) OVER (
                PARTITION BY doc_id ORDER BY i) AS b
            FROM tok),
        kept AS (SELECT a, b FROM pairs
                 WHERE b IS NOT NULL AND a <> b),
        edges AS MATERIALIZED (
            SELECT a AS src, b AS dst FROM kept
            UNION ALL
            SELECT b, a FROM kept),
        nodes AS MATERIALIZED (SELECT DISTINCT src AS node
                               FROM edges),
        cnt AS (SELECT COUNT(*) AS n FROM nodes),
        deg AS (SELECT src AS node, COUNT(*) AS dg
                FROM edges GROUP BY 1),
        r0 AS (
            SELECT node, (SELECT {scale} // c.n FROM cnt c) AS r
            FROM nodes),
        {step('r0', 'r1')},
        {step('r1', 'r2')}
        SELECT node AS token, CAST(r AS BIGINT) AS rank_units
        FROM r2
        ORDER BY r DESC, node ASC LIMIT 20"""


def _hilbert_oracle() -> str:
    """Replays hilbert_value token-for-token: identical min-max
    scaling, then the same 16 unrolled xy2d steps from
    hilbert_step_exprs with DuckDB's ``//`` as the only dialect
    difference; chained CTEs carry (hx_i, hy_i, hd_i)."""
    from cubes_spark.operators.scale import hilbert_step_exprs

    bits = 16
    ctes = ["""stats AS MATERIALIZED (
            SELECT CAST(min(l_partkey) AS BIGINT) AS mn_p,
                CAST(max(l_partkey) AS BIGINT) AS mx_p,
                CAST(min(l_suppkey) AS BIGINT) AS mn_s,
                CAST(max(l_suppkey) AS BIGINT) AS mx_s
            FROM lineitem
        )""", f"""s0 AS (
            SELECT l_partkey, l_suppkey,
                (((CAST(l_partkey AS BIGINT) - mn_p) * {(1 << bits) - 1})
                 // greatest(mx_p - mn_p, 1)) AS hx0,
                (((CAST(l_suppkey AS BIGINT) - mn_s) * {(1 << bits) - 1})
                 // greatest(mx_s - mn_s, 1)) AS hy0,
                CAST(0 AS BIGINT) AS hd0
            FROM lineitem CROSS JOIN stats
        )"""]
    s, i = 1 << (bits - 1), 1
    while s > 0:
        xe, ye, de = hilbert_step_exprs(
            f"hx{i-1}", f"hy{i-1}", f"hd{i-1}", s, div="//")
        ctes.append(f"""s{i} AS (
            SELECT l_partkey, l_suppkey, {xe} AS hx{i},
                {ye} AS hy{i}, {de} AS hd{i}
            FROM s{i-1}
        )""")
        s, i = s >> 1, i + 1
    last = i - 1
    return f"""
        WITH {', '.join(ctes)}
        SELECT hd{last} // 16777216 AS h_bucket,
            CAST(count(*) AS BIGINT) AS n,
            min(l_partkey) AS min_part, max(l_partkey) AS max_part,
            min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
        FROM s{last} GROUP BY 1"""


def _hits_oracle() -> str:
    """Unrolled 2-iteration integer HITS: the same synthetic doc
    graph, HUGEINT sums, sum-normalization by integer division."""
    scale = 10 ** 12

    def half(score_in: str, out: str, col_in: str, col_out: str,
             match_in: str, match_out: str) -> str:
        return f"""
        r{out} AS (
            SELECT n.node,
                COALESCE(SUM({score_in}.{col_in}), 0) AS v
            FROM nodes n
            LEFT JOIN edges e ON e.{match_out} = n.node
            LEFT JOIN {score_in}
                ON {score_in}.node = e.{match_in}
            GROUP BY n.node),
        {out} AS (
            SELECT node, CASE WHEN t.s = 0 THEN CAST(0 AS HUGEINT)
                ELSE (CAST(v AS HUGEINT) * {scale}) // t.s END
                AS {col_out}
            FROM r{out}, (SELECT SUM(v) AS s FROM r{out}) t)"""

    return f"""
        WITH cnt AS (SELECT COUNT(*) AS n FROM documents),
        nodes AS (SELECT doc_id AS node FROM documents),
        edges AS (
            SELECT d.doc_id AS src, (d.doc_id * 5 + 3) % c.n AS dst
            FROM documents d, cnt c
            UNION ALL
            SELECT d.doc_id, (d.doc_id * 7 + 1) % c.n
            FROM documents d, cnt c),
        h0 AS (SELECT node, CAST({scale} AS HUGEINT) AS h
               FROM nodes),
        {half('h0', 'a1', 'h', 'a', 'src', 'dst')},
        {half('a1', 'h1', 'a', 'h', 'dst', 'src')},
        {half('h1', 'a2', 'h', 'a', 'src', 'dst')},
        {half('a2', 'h2', 'a', 'h', 'dst', 'src')}
        SELECT CAST(a2.node AS BIGINT) AS node,
            CAST(a2.a AS BIGINT) AS auth_units,
            CAST(h2.h AS BIGINT) AS hub_units
        FROM a2 JOIN h2 ON a2.node = h2.node"""


def q_events_asof(spark, sf_dir):
    """As-of join (operators/asof.py): each purchase enriched with the
    user's latest click at-or-before it, within a 30-minute tolerance
    — union + one by-key windowed shuffle, no range join, no row
    multiplication (plan: 1 exchange, 0 join nodes; see
    test_asof.test_single_shuffle_plan).  Ties break on the highest
    click event_id, so the LATERAL argmax oracle replays exactly."""
    from cubes_spark.operators.asof import asof_join

    ev = _table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.col("value").alias("purchase_value"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts",
        F.col("value").alias("click_value"))
    out = asof_join(purchases, clicks, on="ts", by="user_id",
                    right_values=["click_id", "click_value"],
                    right_order="click_id",
                    tolerance_seconds=1800.0)
    return out.select(
        "event_id", "user_id", "purchase_value",
        F.col("click_id_right").alias("click_id"),
        F.col("click_value_right").alias("click_value"),
        (F.unix_micros(F.col("ts"))
         - F.unix_micros(F.col("ts_right"))).alias("gap_us"),
    )


def q_events_stream_join(spark, sf_dir):
    """Stream-stream interval join (streaming/stream.py:
    stream_interval_join): purchases and clicks as two watermarked
    file streams, inner-joined per user with the click at most 30
    minutes before the purchase — the watermark+interval condition is
    what bounds join state on an unbounded stream.  Replayed to
    completion (availableNow, append mode); the plain batch SQL
    interval join is the oracle."""
    from cubes_spark.streaming import read_parquet_stream, \
        replay_to_memory, stream_interval_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = f"{sf_dir}/events.parquet"
    purchases = read_parquet_stream(spark, src) \
        .filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts",
                F.col("value").alias("purchase_value"))
    clicks = read_parquet_stream(spark, src) \
        .filter(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("click_ts"),
                F.col("value").alias("click_value"))
    joined = stream_interval_join(
        purchases, clicks, on="user_id",
        left_ts="ts", right_ts="click_ts",
        lower_seconds=1800, upper_seconds=0, watermark="2 hours",
    )
    result = replay_to_memory(joined, "q_events_stream_join",
                              output_mode="append")
    return result.select(
        "event_id", "user_id", "purchase_value", "click_id",
        "click_value",
        (F.unix_micros(F.col("ts"))
         - F.unix_micros(F.col("click_ts"))).alias("gap_us"),
    )


def q_events_funnel(spark, sf_dir):
    """Ordered-funnel conversion (view -> click -> purchase): per-step
    reacher counts with strict first-touch ordering (each step after
    the user's first occurrence of the previous one) —
    cubes_spark/operators/olap.py:funnel_counts."""
    from cubes_spark.operators.olap import funnel_counts

    ev = _table(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"])


def q_events_cohorts(spark, sf_dir):
    """Weekly cohort retention triangle: users bucketed by first-
    activity week, counted distinct per returning week offset —
    cubes_spark/operators/olap.py:cohort_retention."""
    from cubes_spark.operators.olap import cohort_retention

    ev = _table(spark, sf_dir, "events")
    return cohort_retention(ev, period="week")


def q_events_sessions_batch(spark, sf_dir):
    """Batch sessionization via the lag + cumulative-island windows
    (cubes_spark/streaming/stream.py:batch_sessionize) — the bounded-
    data complement of the custom stateful streaming operator, with
    the same session payload but including every user's final
    session."""
    from cubes_spark.streaming import batch_sessionize

    ev = _table(spark, sf_dir, "events")
    out = batch_sessionize(ev, gap_seconds=1800)
    return out.select(
        "user_id", "session_start", "session_end", "n_events",
        "value_usum", "event_seq",
    )


def q_doc_warc_pipeline(spark, sf_dir):
    """The COMPOSED web-ingest pipeline in one plan: WARC shards with
    HTML response bodies built in-plan → parse_warc (Content-Length
    walk) → html_to_text (tag strip + entity decode) → token/length
    stats — crawl bytes to training text end-to-end; the oracle
    recomputes the stats from the closed-form expected text."""
    from cubes_spark.llm import html_to_text, parse_warc
    from cubes_spark.llm.text import token_array

    docs = _table(spark, sf_dir, "documents")
    esc = F.replace(F.col("text"), F.lit("&"), F.lit("&amp;"))
    esc = F.replace(esc, F.lit("<"), F.lit("&lt;"))
    esc = F.replace(esc, F.lit(">"), F.lit("&gt;"))
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><h1>"), F.col("source"),
        F.lit("</h1><script>var x = 1 < 2;</script><p>"), esc,
        F.lit("</p></body></html>"))
    http_head = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
              "Content-Length: "),
        F.octet_length(html).cast("string"), F.lit("\r\n\r\n"))
    payload = F.concat(http_head, html)
    warc = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\n"
              "WARC-Target-URI: http://example.com/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"), payload, F.lit("\r\n\r\n"))
    shards = docs.select("doc_id", warc.cast("binary").alias("payload"))
    recs = parse_warc(shards, warc_col="payload", id_col="doc_id")
    pages = recs.filter(F.col("warc_type") == "response").select(
        F.col("id").alias("doc_id"),
        F.col("body").cast("string").alias("html"))
    text = html_to_text(pages)
    return text.select(
        "doc_id",
        F.length("text").cast("long").alias("text_len"),
        F.size(token_array(F.col("text"))).cast("long")
            .alias("n_tokens"),
        F.md5(F.col("text")).alias("text_md5"),
    )


def q_doc_substring_dup(spark, sf_dir):
    """Exact substring dedup (Lee et al. 2022 shape): 8-token spans
    occurring in >=2 distinct documents, via local explode + one
    map-side-combinable hash group-by — only the 64-bit portable span
    hash is shuffled (cubes_spark/llm/dedup.py:duplicate_spans)."""
    from cubes_spark.llm import duplicate_spans

    docs = _table(spark, sf_dir, "documents")
    return duplicate_spans(docs, k=8).select(
        "span_hash",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
        F.col("canonical_id").cast("long").alias("canonical_id"),
    )


def q_doc_span_docs(spark, sf_dir):
    """Per-document duplicated-span exposure (boilerplate removal
    policy knob): span counts + how many of them are corpus-duplicated
    (cubes_spark/llm/dedup.py:span_duplicate_docs)."""
    from cubes_spark.llm import span_duplicate_docs

    docs = _table(spark, sf_dir, "documents")
    return span_duplicate_docs(docs, k=8).select(
        "doc_id",
        F.col("n_dup_spans").cast("long").alias("n_dup_spans"),
        F.col("n_spans").cast("long").alias("n_spans"),
    )


def q_doc_pack(spark, sf_dir):
    """GPT-style sequence packing: documents concatenated in doc_id
    order, token stream sliced into 512-token context windows; one row
    per (window, document) overlap.  Global prefix offsets via the
    two-phase prefix sum (range repartition + bounded per-partition
    collect), never a one-partition window
    (cubes_spark/llm/text.py:pack_sequences)."""
    from cubes_spark.llm import pack_sequences

    docs = _table(spark, sf_dir, "documents")
    return pack_sequences(docs, window=512, num_partitions=8).select(
        "bin_id", "doc_id", "offset_in_bin", "tokens_in_bin",
        "n_tokens",
    )


_TAR_NUL = "\x00"

#: constant ustar header bytes (everything except name + size), in
#: field order mode..pad; the checksum field is 8 spaces here because
#: that is its value DURING checksum computation
_TAR_CONST_PRE = ("0000644" + _TAR_NUL + "0000000" + _TAR_NUL
                  + "0000000" + _TAR_NUL)                 # mode uid gid
_TAR_CONST_MID = "00000000000" + _TAR_NUL                  # mtime
_TAR_CONST_POST = ("0" + _TAR_NUL * 100                    # type linkname
                   + "ustar" + _TAR_NUL + "00"             # magic version
                   + _TAR_NUL * 64                         # uname gname
                   + "0000000" + _TAR_NUL + "0000000" + _TAR_NUL
                   + _TAR_NUL * 155 + _TAR_NUL * 12)       # prefix pad
_TAR_CONST_SUM = sum(ord(ch) for ch in
                     _TAR_CONST_PRE + _TAR_CONST_MID + " " * 8
                     + _TAR_CONST_POST)


def _tar_member(name_col, content_col):
    """One complete ustar member (512-byte header + NUL-padded
    content) as a string column.  The header checksum is the constant
    field contribution plus SQL ascii folds over the two variable
    fields (name, octal size) — NUL padding contributes zero."""
    def ascii_sum(col):
        return F.aggregate(
            F.sequence(F.lit(1), F.length(col)),
            F.lit(0).cast("long"),
            lambda acc, i: acc + F.ascii(F.substring(col, i, F.lit(1))),
        )

    size = F.octet_length(content_col).cast("long")
    oct11 = F.lpad(F.conv(size.cast("string"), 10, 8), 11, "0")
    chk = (F.lit(_TAR_CONST_SUM) + ascii_sum(name_col)
           + ascii_sum(oct11))
    header = F.concat(
        F.rpad(name_col, 100, _TAR_NUL),
        F.lit(_TAR_CONST_PRE),
        oct11, F.lit(_TAR_NUL),
        F.lit(_TAR_CONST_MID),
        F.lpad(F.conv(chk.cast("string"), 10, 8), 6, "0"),
        F.lit(_TAR_NUL + " "),
        F.lit(_TAR_CONST_POST),
    )
    pad = F.substring(F.lit(_TAR_NUL * 512), 1,
                      ((512 - size % 512) % 512).cast("int"))
    return F.concat(header, content_col, pad)


def q_doc_tar_shards(spark, sf_dir):
    """WebDataset-style tar shards built IN-PLAN (complete ustar
    headers: octal fields, checksum via SQL ascii folds over the
    variable fields, 512-byte framing), exploded for real by the
    stdlib tarfile reader; member bytes recovered exactly
    (cubes_spark/llm/web.py:parse_tar)."""
    from cubes_spark.llm import parse_tar

    docs = _table(spark, sf_dir, "documents")
    name_txt = F.concat(F.lit("doc_"), F.col("doc_id").cast("string"),
                        F.lit(".txt"))
    name_cls = F.concat(F.lit("doc_"), F.col("doc_id").cast("string"),
                        F.lit(".cls"))
    shard = F.concat(
        _tar_member(name_txt, F.col("text")),
        _tar_member(name_cls, F.col("lang")),
        F.lit(_TAR_NUL * 1024),
    )
    shards = docs.select("doc_id", shard.cast("binary").alias("payload"))
    members = parse_tar(shards, tar_col="payload", id_col="doc_id")
    return members.select(
        F.col("id").alias("doc_id"), "member_idx", "name", "size",
        F.md5(F.col("payload")).alias("payload_md5"),
    )


#: Curation-analytics model: the documents table derived into a
#: quality-stats fact via a named TABLE EXPRESSION (computed through
#: Catalyst — the derivation pushes into the scan), browsed as a cube.
_DOCS_MODEL = {
    "table_expressions": {
        "doc_stats": (
            "SELECT doc_id, lang, source, n_chars, "
            "CASE WHEN n_chars < 250 THEN 'short' "
            "WHEN n_chars < 350 THEN 'medium' ELSE 'long' END "
            "AS len_bucket, "
            "CASE WHEN trim(text) = '' THEN 0 "
            "ELSE size(split(trim(text), '\\\\s+')) END AS n_tokens "
            "FROM documents"
        ),
    },
    "dimensions": [
        {"name": "lang"},
        {"name": "source"},
        {"name": "len_bucket"},
    ],
    "cubes": [{
        "name": "docs",
        "fact": "doc_stats",
        "key": "doc_id",
        "dimensions": ["lang", "source", "len_bucket"],
        "measures": [{"name": "n_chars"}, {"name": "n_tokens"}],
        "aggregates": [
            {"name": "doc_count", "function": "count"},
            {"name": "chars_sum", "function": "sum",
             "measure": "n_chars"},
            {"name": "tokens_sum", "function": "sum",
             "measure": "n_tokens"},
        ],
        "mappings": {
            "lang.lang": "doc_stats.lang",
            "source.source": "doc_stats.source",
            "len_bucket.len_bucket": "doc_stats.len_bucket",
        },
    }],
}


def q_doc_webdataset_export(spark, sf_dir):
    """WebDataset EXPORT → INGEST round-trip: documents packed into
    deterministic tar shards of 50 (one shuffle keyed by shard id,
    cubes_spark/llm/web.py:pack_webdataset), then exploded back by
    parse_tar; every member byte-exact against the source columns."""
    from cubes_spark.llm import pack_webdataset, parse_tar

    docs = _table(spark, sf_dir, "documents")
    src = docs.withColumn(
        "shard", F.floor(F.col("doc_id") / 50).cast("long"))
    shards = pack_webdataset(
        src, "shard", key_col="doc_id",
        part_cols={"txt": "text", "cls": "lang"})
    members = parse_tar(
        shards.withColumnRenamed("shard", "doc_id"),
        tar_col="payload", id_col="doc_id")
    return members.select(
        F.col("id").alias("shard_id"), "name", "size",
        F.md5(F.col("payload")).alias("payload_md5"),
    )


def q_docs_stream_quality(spark, sf_dir):
    """STREAMING curation: the documents table replayed as a bounded
    file stream, per-document quality scoring (the same pure column
    expressions run unchanged on a stream) and a per-(lang, passed)
    running aggregate in complete mode — the shape of a live ingest
    pipeline scoring documents as they land."""
    from cubes_spark.llm import text_stats
    from cubes_spark.streaming import read_parquet_stream, \
        replay_to_memory

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_parquet_stream(spark, f"{sf_dir}/documents.parquet")
    scored = text_stats(stream)
    out = scored.withColumn(
        "passed",
        (F.col("quality_score") >= 0.5).cast("int").cast("long"),
    ).groupBy("lang", "passed").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    return replay_to_memory(out, "q_docs_stream_quality",
                            output_mode="complete")


def q_doc_bpe_encode(spark, sf_dir):
    """REAL learned BPE end-to-end: merges trained driver-side on the
    bounded id-sorted sample (classic greedy pair counting), applied
    distributed with the rank-greedy encoder in one Arrow stage
    (cubes_spark/llm/bpe.py).  The oracle retrains the identical
    merge list and re-encodes every document with an INDEPENDENT
    in-training-order applier (equivalence proven in tests), inlining
    the per-document token counts and md5s."""
    from cubes_spark.llm import bpe_encode, train_bpe

    docs = _table(spark, sf_dir, "documents")
    merges = train_bpe(docs, num_merges=96, sample_size=512)
    out = bpe_encode(docs, merges)
    return out.select(
        F.col("id").alias("doc_id"),
        F.size("tokens").cast("long").alias("n_tokens"),
        F.md5(F.array_join(F.col("tokens"), "\x1f")).alias("tokens_md5"),
    )


def _bpe_oracle() -> str:
    """Retrains the identical merge list (same id-sorted sample, same
    greedy trainer) and encodes every document with the INDEPENDENT
    Sennrich-style in-order applier; per-document expectations are
    inlined as VALUES."""
    import hashlib

    import duckdb

    from cubes_spark.llm.bpe import _PRETOKEN_RE, train_bpe_from_texts

    path = f"{_oracle_sf_dir()}/documents.parquet"
    sample = duckdb.sql(
        f"SELECT text FROM read_parquet('{path}') "
        "ORDER BY doc_id LIMIT 512").fetchall()
    merges = train_bpe_from_texts([r[0] for r in sample], 96)

    def in_order(word):
        sym = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{path}')").fetchall()
    cache: dict = {}
    values = []
    for doc_id, text in rows:
        tokens = []
        for word in _PRETOKEN_RE.findall(text or ""):
            got = cache.get(word)
            if got is None:
                got = in_order(word)
                cache[word] = got
            tokens.extend(got)
        digest = hashlib.md5("\x1f".join(tokens).encode()).hexdigest()
        values.append(f"({doc_id}, {len(tokens)}, '{digest}')")
    return f"""
        SELECT v.d AS doc_id, CAST(v.n AS BIGINT) AS n_tokens,
            v.h AS tokens_md5
        FROM (VALUES {", ".join(values)}) v(d, n, h)"""


def q_doc_bpe_vocab(spark, sf_dir):
    """Corpus vocabulary statistics over the LEARNED tokenization:
    BPE-encode every document, explode tokens, count — the top-50
    table (count desc, token asc) that drives vocab pruning /
    coverage checks.  The oracle re-runs training + the independent
    in-order encoder and inlines the expected table."""
    from cubes_spark.llm import bpe_encode, train_bpe

    docs = _table(spark, sf_dir, "documents")
    merges = train_bpe(docs, num_merges=96, sample_size=512)
    out = bpe_encode(docs, merges)
    counts = (
        out.select(F.explode("tokens").alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(50)
    )
    return counts.select("token", F.col("n").cast("long").alias("n"))


def _bpe_vocab_oracle() -> str:
    """Top-50 learned-token counts via the independent in-order
    applier (shares the sample/trainer with _bpe_oracle)."""
    from collections import Counter

    import duckdb

    from cubes_spark.llm.bpe import _PRETOKEN_RE, train_bpe_from_texts

    path = f"{_oracle_sf_dir()}/documents.parquet"
    sample = duckdb.sql(
        f"SELECT text FROM read_parquet('{path}') "
        "ORDER BY doc_id LIMIT 512").fetchall()
    merges = train_bpe_from_texts([r[0] for r in sample], 96)

    def in_order(word):
        sym = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    rows = duckdb.sql(
        f"SELECT text FROM read_parquet('{path}')").fetchall()
    counts: Counter = Counter()
    word_freq: Counter = Counter()
    for (text,) in rows:
        word_freq.update(_PRETOKEN_RE.findall(text or ""))
    for word, freq in word_freq.items():
        for tok in in_order(word):
            counts[tok] += freq
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    values = ", ".join(
        "(" + "'" + tok.replace("'", "''") + "'" + f", {n})"
        for tok, n in top)
    return f"""
        SELECT v.t AS token, CAST(v.n AS BIGINT) AS n
        FROM (VALUES {values}) v(t, n)"""


def q_doc_image_dedup(spark, sf_dir):
    """Image near-duplicate groups via perceptual hashing: in-plan
    24-bit BMPs whose pixel content is keyed by doc_id % 16 (so every
    residue class is a visually-identical group), decoded + aHashed +
    grouped by the hash (cubes_spark/llm/multimodal.py:
    image_duplicates).  The oracle recomputes each residue's aHash
    with an independent implementation and inlines the 16 hashes."""
    from cubes_spark.llm import image_duplicates

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    r = (F.col("doc_id") % 16).cast("long")
    w = (F.lit(6) + r % 3).cast("long")
    h = (F.lit(5) + r % 2).cast("long")

    def hex2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    def le32(col):
        return F.concat(*[hex2((col / (256 ** i)).cast("long") % 256)
                          for i in range(4)])

    byte = lambda x, y, c: (r * 37 + x * (r + 7) + y * (2 * r + 11)
                            + c * 3) % 256
    stride = ((w * 3 + 3) / 4).cast("long") * 4
    pad_hex = F.substring(F.lit("000000"), 1,
                          ((stride - w * 3) * 2).cast("int"))
    data_hex = F.aggregate(
        F.sequence(F.lit(0), h - 1), F.lit(""),
        lambda acc, f: F.concat(
            acc,
            F.aggregate(
                F.sequence(F.lit(0), w - 1), F.lit(""),
                lambda a2, x: F.concat(
                    a2, hex2(byte(x, f, 0)), hex2(byte(x, f, 1)),
                    hex2(byte(x, f, 2)))),
            pad_hex),
    )
    bmp_hex = F.concat(
        F.lit("424D"), le32(stride * h + 54),
        F.lit("00000000"), le32(F.lit(54)),
        le32(F.lit(40)), le32(w), le32(h),
        F.lit("0100" "1800"), le32(F.lit(0)),
        le32(stride * h),
        le32(F.lit(2835)), le32(F.lit(2835)),
        le32(F.lit(0)), le32(F.lit(0)),
        data_hex,
    )
    bmps = docs.withColumn("payload", F.unhex(bmp_hex))
    return image_duplicates(bmps, "payload")


def _image_dedup_oracle() -> str:
    """Independent aHash per residue class: stored-byte formula →
    top-down grayscale → 8×8 nearest → integer mean-compare bits.
    Written from the definition, not the library code."""
    values = []
    for r in range(16):
        w, h = 6 + r % 3, 5 + r % 2

        def stored(x, fy, c):
            return (r * 37 + x * (r + 7) + fy * (2 * r + 11)
                    + c * 3) % 256

        # image row ry = file row h-1-ry (bottom-up BMP); gray is the
        # floor-mean over the three channels (order-invariant)
        gray = [[sum(stored((X * w) // 8, h - 1 - (Y * h) // 8, c)
                     for c in range(3)) // 3
                 for X in range(8)] for Y in range(8)]
        total = sum(sum(row) for row in gray)
        val = 0
        for Y in range(8):
            for X in range(8):
                val = (val << 1) | (1 if gray[Y][X] * 64 >= total
                                    else 0)
        values.append(f"({r}, '{format(val, '016x')}')")
    return f"""
        SELECT v.hsh AS ahash, COUNT(*) AS n_docs,
            CAST(MIN(d.doc_id) AS BIGINT) AS canonical_id
        FROM documents d
        JOIN (VALUES {", ".join(values)}) v(r, hsh)
            ON d.doc_id % 16 = v.r
        GROUP BY 1"""


def q_doc_audio_dedup(spark, sf_dir):
    """Audio near-duplicate groups via the contour fingerprint:
    in-plan PCM WAVs whose waveform is keyed by doc_id % 12 (each
    residue class identical), decoded + fingerprinted + grouped
    (cubes_spark/llm/multimodal.py:audio_duplicates).  The oracle
    recomputes each residue's fingerprint independently."""
    from cubes_spark.llm import audio_duplicates

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    r = (F.col("doc_id") % 12).cast("long")
    n = (F.lit(40) + r).cast("long")

    def hex2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    def le16(col):
        return F.concat(hex2(col % 256), hex2((col / 256).cast("long")))

    def le32(col):
        return F.concat(*[hex2((col / (256 ** i)).cast("long") % 256)
                          for i in range(4)])

    # sawtooth keyed by the residue: v(i) = ((i*(2r+3)) % 200) - 100
    sample_hex = F.aggregate(
        F.sequence(F.lit(0), n - 1), F.lit(""),
        lambda acc, i: F.concat(
            acc, le16(((i * (r * 2 + 3)) % 200 - 100 + 65536) % 65536)),
    )
    wav_hex = F.concat(
        F.lit("52494646"), le32(F.lit(36) + n * 2),
        F.lit("57415645" "666D7420"), le32(F.lit(16)),
        F.lit("0100" "0100"), le32(F.lit(8000)), le32(F.lit(16000)),
        F.lit("0200" "1000"),
        F.lit("64617461"), le32(n * 2), sample_hex)
    wavs = docs.withColumn("payload", F.unhex(wav_hex))
    return audio_duplicates(wavs, "payload")


def _audio_dedup_oracle() -> str:
    """Independent contour fingerprint per residue class (mono s16
    sawtooth, 65 nearest anchors, rising-edge bits)."""
    values = []
    for r in range(12):
        n = 40 + r
        mono = [((i * (2 * r + 3)) % 200) - 100 for i in range(n)]
        pts = [mono[(i * n) // 65] for i in range(65)]
        val = 0
        for i in range(64):
            val = (val << 1) | (1 if pts[i + 1] > pts[i] else 0)
        values.append(f"({r}, '{format(val, '016x')}')")
    return f"""
        SELECT v.fp AS fingerprint, COUNT(*) AS n_docs,
            CAST(MIN(d.doc_id) AS BIGINT) AS canonical_id
        FROM documents d
        JOIN (VALUES {", ".join(values)}) v(r, fp)
            ON d.doc_id % 12 = v.r
        GROUP BY 1"""


def q_doc_mixture(spark, sf_dir):
    """Data-mixture sampling: per-language keep rates (en 80%, de 50%,
    fr 30%, others 10%) applied as one narrow portable-hash filter,
    rolled up per language (cubes_spark/llm/text.py:mixture_sample)."""
    from cubes_spark.llm import mixture_sample

    docs = _table(spark, sf_dir, "documents")
    kept = mixture_sample(
        docs, "lang", {"en": 800, "de": 500, "fr": 300},
        default_permille=100)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


def q_doc_incremental_dedup(spark, sf_dir):
    """Incremental ingest dedup: the fresh batch (non-ingested docs
    PLUS re-crawls — ingested content under new ids, built in-plan)
    anti-joined on the normalized content hash against the
    already-ingested slice; every re-crawl must drop, every genuinely
    new doc must survive — only hashes move, never text
    (cubes_spark/llm/dedup.py:dedup_against)."""
    from cubes_spark.llm import dedup_against

    docs = _table(spark, sf_dir, "documents")
    ingested = docs.filter(F.col("doc_id") % 4 == 0)
    recrawls = ingested.withColumn(
        "doc_id", F.col("doc_id") + 1000000)
    fresh = docs.filter(F.col("doc_id") % 4 != 0).unionByName(recrawls)
    kept = dedup_against(fresh, ingested)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


def q_doc_quality_cube(spark, sf_dir):
    """OLAP over the curation pipeline: the documents table derived
    into a quality-stats fact by a named table expression and browsed
    through the cube engine — point cut on source + lang x len-bucket
    drilldown (the full dimensional surface applied to training-data
    curation)."""
    from cubes_spark.sources.workspace import Workspace

    ws = Workspace(spark, store=sf_dir)
    ws.import_model(_DOCS_MODEL)
    df = ws.browser("docs").aggregation_dataframe(
        cell="source:src1;src2;src3;src4;src5",
        drilldown=["lang", "len_bucket"],
        aggregates=["doc_count", "chars_sum", "tokens_sum"],
    )
    return _lng(df, "doc_count", "chars_sum", "tokens_sum")


def q_doc_inflate(spark, sf_dir):
    """Compressed-shard ingestion: zlib streams built in-plan
    (stored-deflate block + adler32 computed by a SQL fold — the PNG
    builder's container recipe), decompressed for real by stdlib zlib
    in inflate_column (cubes_spark/llm/web.py); recovered bytes match
    the source text md5-exact."""
    from cubes_spark.llm import inflate_column

    docs = _table(spark, sf_dir, "documents")

    def hex2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    def le16(col):
        return F.concat(hex2(col % 256), hex2((col / 256).cast("long")))

    raw_hex = F.hex(F.col("text"))
    rawlen = F.octet_length("text").cast("long")
    adler = F.aggregate(
        F.sequence(F.lit(1), rawlen),
        F.struct(F.lit(1).cast("long").alias("s1"),
                 F.lit(0).cast("long").alias("s2")),
        lambda acc, i: F.struct(
            ((acc.getField("s1")
              + F.conv(F.substring(raw_hex, (i * 2 - 1).cast("int"), 2),
                       16, 10).cast("long")) % 65521).alias("s1"),
            ((acc.getField("s2") + acc.getField("s1")
              + F.conv(F.substring(raw_hex, (i * 2 - 1).cast("int"), 2),
                       16, 10).cast("long")) % 65521).alias("s2"),
        ),
    )
    adler_hex = F.lpad(F.hex((adler.getField("s2") * 65536
                              + adler.getField("s1")).cast("long")),
                       8, "0")
    zlib_hex = F.concat(
        F.lit("7801" "01"), le16(rawlen), le16(F.lit(65535) - rawlen),
        raw_hex, adler_hex)
    shards = docs.select(
        "doc_id", F.unhex(zlib_hex).alias("payload"))
    out = inflate_column(shards)
    return out.select(
        "doc_id",
        F.octet_length("inflated").cast("long").alias("n_bytes"),
        F.md5(F.col("inflated")).alias("payload_md5"),
    )


def q_doc_jsonl(spark, sf_dir):
    """JSON-lines ingestion round-trip: two records per document built
    in-plan with to_json (real escaping), re-parsed by parse_jsonl
    (from_json, permissive) — field values recovered exactly
    (cubes_spark/llm/web.py:parse_jsonl)."""
    from cubes_spark.llm import parse_jsonl

    docs = _table(spark, sf_dir, "documents")
    line1 = F.to_json(F.struct(
        F.col("doc_id").alias("id"), F.col("lang"), F.col("text")))
    line2 = F.to_json(F.struct(
        (F.col("doc_id") + 1000000).alias("id"),
        F.lit("und").alias("lang"),
        F.substring(F.col("text"), 1, 100).alias("text")))
    blob = F.concat(line1, F.lit("\n"), line2)
    src = docs.select("doc_id", blob.alias("payload"))
    recs = parse_jsonl(src, schema="id long, lang string, text string")
    return recs.select(
        "doc_id", "line_no",
        F.col("rec.id").alias("rec_id"),
        F.col("rec.lang").alias("rec_lang"),
        F.md5(F.col("rec.text")).alias("text_md5"),
    )


def q_doc_sample(spark, sf_dir):
    """Deterministic hash-Bernoulli sampling (25%): reproducible
    across engines/partitionings, rolled up per language
    (cubes_spark/llm/text.py:deterministic_sample)."""
    from cubes_spark.llm import deterministic_sample

    docs = _table(spark, sf_dir, "documents")
    kept = deterministic_sample(docs, keep_permille=250)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


def q_doc_stratified(spark, sf_dir):
    """Deterministic stratified sampling: the 25 smallest-hash docs
    per language (ties by id) — equal-allocation eval-set carving
    (cubes_spark/llm/text.py:stratified_sample)."""
    from cubes_spark.llm import stratified_sample

    docs = _table(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", 25).select("doc_id", "lang")


def q_doc_decontam(spark, sf_dir):
    """Test-set decontamination: distinct-8-gram overlap of every
    document against an in-plan benchmark slice (doc_id % 25 == 0);
    the benchmark gram set is deduped + broadcast so the corpus side
    never shuffles for the membership test
    (cubes_spark/llm/dedup.py:benchmark_contamination)."""
    from cubes_spark.llm import benchmark_contamination

    docs = _table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    out = benchmark_contamination(docs, bench, k=8, threshold=0.2)
    return out.select(
        "doc_id", "n_grams", "n_overlap",
        F.col("contaminated").cast("int").cast("long")
            .alias("contaminated"),
    )


def q_doc_warc_extract(spark, sf_dir):
    """WARC shards built in-plan (warcinfo + HTTP response records,
    exact Content-Length framing over UTF-8 byte lengths), parsed for
    real by cubes_spark.llm.web.parse_warc; response bodies recovered
    byte-exact (md5 vs the source text)."""
    from cubes_spark.llm import parse_warc

    docs = _table(spark, sf_dir, "documents")
    info_body = F.lit("software: cubes-spark")
    http_head = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain; "
              "charset=utf-8\r\nContent-Length: "),
        F.octet_length("text").cast("string"), F.lit("\r\n\r\n"))
    payload = F.concat(http_head, F.col("text"))
    warc = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: "),
        F.octet_length(info_body).cast("string"),
        F.lit("\r\n\r\n"), info_body, F.lit("\r\n\r\n"),
        F.lit("WARC/1.0\r\nWARC-Type: response\r\n"
              "WARC-Target-URI: http://example.com/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"), payload, F.lit("\r\n\r\n"))
    shards = docs.select("doc_id", warc.cast("binary").alias("payload"))
    recs = parse_warc(shards, warc_col="payload", id_col="doc_id")
    resp = F.col("warc_type") == "response"
    return recs.groupBy(F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.max(F.when(resp, F.col("target_uri"))).alias("target_uri"),
        F.max(F.when(resp, F.col("http_status"))).cast("long")
            .alias("http_status"),
        F.max(F.when(resp, F.col("content_type"))).alias("content_type"),
        F.max(F.when(resp, F.col("body_len"))).cast("long")
            .alias("body_len"),
        F.max(F.when(resp, F.md5(F.col("body")))).alias("body_md5"),
    )


def q_doc_html_text(spark, sf_dir):
    """HTML pages built in-plan (title/h1/script/style/comment, the
    document text entity-escaped into a <p>, a next-doc link), reduced
    to clean text by cubes_spark.llm.web.html_to_text — script bodies
    with bare '<' and double-escaped entities covered — plus link
    extraction; oracle is the closed-form expected text."""
    from cubes_spark.llm import extract_links, html_to_text

    docs = _table(spark, sf_dir, "documents")
    esc = F.replace(F.col("text"), F.lit("&"), F.lit("&amp;"))
    esc = F.replace(esc, F.lit("<"), F.lit("&lt;"))
    esc = F.replace(esc, F.lit(">"), F.lit("&gt;"))
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>body {color: #fff;}</style></head>\n"
              "<body><h1>"), F.col("source"),
        F.lit("</h1>\n<!-- built in-plan -->\n"
              "<script type=\"text/javascript\">var x = 1 < 2;</script>"
              "\n<p>"),
        esc,
        F.lit("</p>\n<a href=\"https://example.com/doc/"),
        (F.col("doc_id") + 1).cast("string"),
        F.lit("\">next</a>\n</body></html>"))
    pages = docs.select("doc_id", html.alias("html"))
    out = extract_links(html_to_text(pages))
    return out.select(
        "doc_id",
        F.length("text").cast("long").alias("text_len"),
        F.md5(F.col("text")).alias("text_md5"),
        F.size("links").cast("long").alias("n_links"),
        F.element_at("links", 1).alias("first_link"),
    )


def _inplan_avi(docs):
    """Complete AVI containers (RIFF hdrl/strf/movi, BI_RGB 24-bit
    DIB frames) built per doc_id in-plan: ``n = 2 + doc_id % 3``
    frames of ``w = 3 + doc_id % 3`` × ``h = 2 + doc_id % 2``, stored
    byte (frame f, x, FILE row y, channel c in B,G,R order) =
    ``(doc_id*7 + f*19 + x*5 + y*11 + c*3) % 256`` — shared by the
    video-frames and video-pipeline driver entries (decoded image row
    r is file row h-1-r; per-frame totals are row-order invariant,
    pixel-selecting oracles must flip)."""
    w = (F.lit(3) + F.col("doc_id") % 3).cast("long")
    h = (F.lit(2) + F.col("doc_id") % 2).cast("long")
    n = (F.lit(2) + F.col("doc_id") % 3).cast("long")   # frames

    def hex2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    def le32(col):
        out = []
        for i in range(4):
            out.append(hex2((col / (256 ** i)).cast("long") % 256))
        return F.concat(*out)

    byte = lambda f, x, y, c: (F.col("doc_id") * 7 + f * 19 + x * 5
                               + y * 11 + c * 3) % 256
    stride = ((w * 3 + 3) / 4).cast("long") * 4
    pad_hex = F.substring(F.lit("000000"), 1,
                          ((stride - w * 3) * 2).cast("int"))
    fsz = stride * h

    def frame_hex(f):
        return F.aggregate(
            F.sequence(F.lit(0), h - 1), F.lit(""),
            lambda acc, y: F.concat(
                acc,
                F.aggregate(
                    F.sequence(F.lit(0), w - 1), F.lit(""),
                    lambda a2, x: F.concat(
                        a2, hex2(byte(f, x, y, 0)),
                        hex2(byte(f, x, y, 1)),
                        hex2(byte(f, x, y, 2)))),
                pad_hex),
        )

    movi_body = F.aggregate(
        F.sequence(F.lit(0), n - 1), F.lit(""),
        lambda acc, f: F.concat(
            acc, F.lit("30306462"), le32(fsz), frame_hex(f)),
    )
    strf = F.concat(
        F.lit("73747266"), le32(F.lit(40)),          # strf, size 40
        le32(F.lit(40)), le32(w), le32(h),           # BITMAPINFOHEADER
        F.lit("0100" "1800"), le32(F.lit(0)),        # planes, 24bpp, BI_RGB
        le32(fsz), le32(F.lit(0)), le32(F.lit(0)),
        le32(F.lit(0)), le32(F.lit(0)),
    )
    hdrl = F.concat(F.lit("4C495354"), le32(F.lit(4 + 48)),
                    F.lit("6864726C"), strf)
    movi_size = F.lit(4) + n * (F.lit(8) + fsz)
    movi = F.concat(F.lit("4C495354"), le32(movi_size),
                    F.lit("6D6F7669"), movi_body)
    body_size = F.lit(4 + 60 + 8) + movi_size
    avi_hex = F.concat(
        F.lit("52494646"), le32(body_size), F.lit("41564920"),
        hdrl, movi,
    )
    return docs.withColumn("payload", F.unhex(avi_hex))


def q_doc_video_frames(spark, sf_dir):
    """REAL video frame sampling end-to-end: the shared in-plan AVIs
    (:func:`_inplan_avi`) demuxed and decoded by the stdlib AVI reader
    with every_k=2 frame sampling (cubes_spark/llm/multimodal.py:
    decode_avi / avi_frame_stats).  Frame bytes are closed-form in
    (doc_id, frame), so the oracle recomputes per-frame sums without
    demuxing (BGR→RGB reorder and row order are sum-invariant)."""
    from cubes_spark.llm import avi_frame_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    return avi_frame_stats(_inplan_avi(docs), "payload", every_k=2)


def q_doc_video_pipeline(spark, sf_dir):
    """The FULL multimodal video chain end-to-end — demux + every-k
    frame sampling + per-frame nearest resize to 2×2 in one Arrow
    stage (cubes_spark/llm/multimodal.py:video_frame_pipeline) over
    the shared in-plan AVIs.  Output pixel (X, Y) reads decoded image
    pixel ``((X*w)//2, (Y*h)//2)``, which is FILE row
    ``h-1-(Y*h)//2`` of the stored bottom-up DIB, so the oracle
    recomputes each resized frame's sum from the stored-byte closed
    form with the row flip applied; summing all three channels makes
    the BGR→RGB reorder irrelevant."""
    from cubes_spark.llm import video_frame_pipeline

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    return video_frame_pipeline(_inplan_avi(docs), "payload", 2, 2,
                                every_k=2, method="nearest")


def q_doc_mkv_meta(spark, sf_dir):
    """REAL Matroska metadata extraction end-to-end: complete EBML
    containers (header + Segment → Info/Tracks → TrackEntry) built
    per doc_id in-plan with correct varint sizes, parsed by the stdlib
    EBML walker (cubes_spark/llm/multimodal.py:matroska_tracks /
    matroska_metadata).  Track layout and timestamp scale are
    closed-form in doc_id."""
    from cubes_spark.llm import matroska_metadata

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    n_audio = (F.lit(1) + F.col("doc_id") % 2).cast("long")
    has_sub = (F.col("doc_id") % 3) == 0
    scale = ((F.lit(1) + F.col("doc_id") % 4) * 100000).cast("long")

    def hex2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    def codec_hex(s):
        return "".join(f"{b:02X}" for b in s.encode())

    def entry_hex(ttype, codec):
        inner = ("83" "81" + f"{ttype:02X}"
                 + "86" + f"{0x80 + len(codec):02X}" + codec_hex(codec))
        return "AE" + f"{0x80 + len(inner) // 2:02X}" + inner

    video = entry_hex(1, "V_VP9")            # 12 bytes
    audio = entry_hex(2, "A_OPUS")           # 13 bytes
    sub = entry_hex(17, "S_TEXT/UTF8")       # 18 bytes
    # EBML header: 1A45DFA3 + size + DocType("matroska")
    header = ("1A45DFA3" "8B" "4282" "88"
              + codec_hex("matroska"))
    # Info: 1549A966 + size 7 + TimestampScale(3-byte value)
    info = F.concat(F.lit("1549A966" "87" "2AD7B1" "83"),
                    F.lpad(F.hex(scale), 6, "0"))
    tracks_body_len = (F.lit(len(video) // 2)
                       + n_audio * (len(audio) // 2)
                       + F.when(has_sub, F.lit(len(sub) // 2))
                       .otherwise(F.lit(0)))
    tracks = F.concat(
        F.lit("1654AE6B"), hex2(F.lit(0x80) + tracks_body_len),
        F.lit(video),
        F.when(n_audio == 2, F.lit(audio + audio))
        .otherwise(F.lit(audio)),
        F.when(has_sub, F.lit(sub)).otherwise(F.lit("")),
    )
    segment_body_len = F.lit(12) + F.lit(5) + tracks_body_len
    mkv_hex = F.concat(
        F.lit(header),
        F.lit("18538067"), hex2(F.lit(0x80) + segment_body_len),
        info, tracks,
    )
    df = docs.withColumn("payload", F.unhex(mkv_hex))
    return matroska_metadata(df, "payload")


def q_doc_jpeg_roundtrip(spark, sf_dir):
    """REAL baseline-JPEG encode→decode roundtrip per row, inside an
    Arrow ``mapInPandas`` batch: deterministic flat greyscale images
    are Huffman-encoded (forward DCT + Annex-K tables,
    cubes_spark/llm/multimodal.py:encode_jpeg) and decoded back
    (full entropy decode + IDCT, decode_jpeg).  Flat images are
    DC-only streams, so reconstruction is EXACT and the oracle is
    closed-form in doc_id."""
    import pandas as pd

    from cubes_spark.llm.multimodal import (
        PIXEL_STATS_SCHEMA, decode_jpeg, encode_jpeg,
    )

    docs = _table(spark, sf_dir, "documents").select("doc_id")

    def roundtrip(batches):
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "n_samples": [], "sample_sum": []}
            for did in pdf["doc_id"]:
                did = int(did)
                w = 8 + (did % 3) * 8
                h = 8 + (did % 2) * 8
                v = (did * 37) % 256
                payload = encode_jpeg(w, h, [bytes([v]) * (w * h)])
                gw, gh, _nc, planes = decode_jpeg(payload)
                out["doc_id"].append(did)
                out["width"].append(gw)
                out["height"].append(gh)
                out["n_samples"].append(len(planes[0]))
                out["sample_sum"].append(sum(planes[0]))
            yield pd.DataFrame(out)

    return docs.mapInPandas(roundtrip, PIXEL_STATS_SCHEMA)


def q_doc_jpeg_progressive(spark, sf_dir):
    """REAL progressive (SOF2) JPEG decode end-to-end: per-block-flat
    greyscale images are encoded as THREE-scan progressive streams
    (DC first with successive approximation Al=1, DC refinement, full
    AC band — cubes_spark/llm/multimodal.py:encode_jpeg_progressive)
    and decoded back through the T.81 Annex-G coefficient-accumulation
    path (decode_jpeg).  Per-block-flat images are DC-only with even
    DC coefficients, so reconstruction is EXACT and the oracle is
    closed-form in doc_id."""
    import pandas as pd

    from cubes_spark.llm.multimodal import (
        PIXEL_STATS_SCHEMA, decode_jpeg, encode_jpeg_progressive,
    )

    docs = _table(spark, sf_dir, "documents").select("doc_id")

    def roundtrip(batches):
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "n_samples": [], "sample_sum": []}
            for did in pdf["doc_id"]:
                did = int(did)
                bw = 2 + did % 2                 # blocks across
                bh = 1 + did % 3                 # blocks down
                w, h = bw * 8, bh * 8
                plane = bytearray(w * h)
                for y in range(h):
                    for x in range(w):
                        plane[y * w + x] = \
                            (did * 31 + (x // 8) * 17
                             + (y // 8) * 29) % 256
                payload = encode_jpeg_progressive(w, h, bytes(plane))
                gw, gh, _nc, planes = decode_jpeg(payload)
                out["doc_id"].append(did)
                out["width"].append(gw)
                out["height"].append(gh)
                out["n_samples"].append(len(planes[0]))
                out["sample_sum"].append(sum(planes[0]))
            yield pd.DataFrame(out)

    return docs.mapInPandas(roundtrip, PIXEL_STATS_SCHEMA)


def q_xlsx_roundtrip(spark, sf_dir):
    """XLSX formatter verified through a REAL workbook round-trip: the
    dependency-free OOXML writer's zip is re-opened, the sheet XML
    parsed, and the recovered grid compared cell-for-cell against the
    SQL oracle (parity: reference formatters.py:114-130)."""
    import io
    import zipfile
    from xml.etree import ElementTree

    from cubes_spark.formatters import XLSXFormatter

    browser = _browser(spark, sf_dir)
    result = browser.aggregate(
        cell="date:1995", drilldown=["returnflag"],
        aggregates=["fact_count", "quantity_sum"],
    )
    payload = XLSXFormatter().format(browser.cube, result)
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        sheet = zf.read("xl/worksheets/sheet1.xml").decode()
    grid = []
    for row in ElementTree.fromstring(sheet).findall(".//m:row", ns):
        values = []
        for cell in row.findall("m:c", ns):
            t = cell.find("m:is/m:t", ns)
            v = cell.find("m:v", ns)
            values.append(t.text if t is not None else v.text)
        grid.append(values)
    header = grid[0]
    assert header == ["returnflag.returnflag", "fact_count",
                      "quantity_sum"], header
    rows = [(r[0], int(float(r[1])), float(r[2])) for r in grid[1:]]
    return spark.createDataFrame(
        rows, schema='`returnflag.returnflag` string, fact_count long, '
                     'quantity_sum double')


def q_namespace_agg(spark, sf_dir):
    """Namespaced model resolution end-to-end: the sales model imported
    under namespace ``ext.demo``, browsed as ``ext.demo.sales`` —
    results identical to the root-namespace cube (parity: reference
    namespace lookup, /root/reference/cubes/namespace.py)."""
    ws = _ws(spark, sf_dir)
    key = ("__ns_demo__", id(spark), sf_dir)
    if key not in _browsers:
        from cubes_spark.demo import TPCH_MODEL

        ws.import_model(TPCH_MODEL, namespace="ext.demo")
        _browsers[key] = ws.browser("ext.demo.sales")
    df = _browsers[key].aggregation_dataframe(
        drilldown=["returnflag"],
        aggregates=["price_sum", "fact_count"],
    )
    return _lng(_dbl(df, "price_sum"), "fact_count")



def q_doc_line_dedup(spark, sf_dir):
    """C4-style corpus-global line dedup: 20-token lines, first
    occurrence (doc order, then position) survives, documents
    reassembled from surviving lines
    (cubes_spark/llm/text.py:line_dedup).  The oracle replays the
    same segmentation, the same integral first-occurrence window and
    the same reassembly in SQL."""
    from cubes_spark.llm import line_dedup

    docs = _table(spark, sf_dir, "documents")
    out = line_dedup(docs, line_tokens=20)
    return _lng(out, "doc_id", "n_lines", "n_lines_kept")


def q_doc_shuffle_shards(spark, sf_dir):
    """Deterministic global training-data shuffle: hash-derived shard
    + within-shard hash rank (cubes_spark/llm/text.py:shuffle_shards)
    — pseudo-random order, bit-reproducible with no RNG state."""
    from cubes_spark.llm import shuffle_shards

    docs = _table(spark, sf_dir, "documents")
    out = shuffle_shards(docs, num_shards=8)
    return _lng(out.select("doc_id", "shard", "position"),
                "doc_id", "position").withColumn(
        "shard", F.col("shard").cast("long"))


def q_doc_domain_cap(spark, sf_dir):
    """Per-domain document cap: top-10 docs per source by size
    (deterministic ties by id) — the anti-concentration step of web
    curation (cubes_spark/llm/text.py:cap_per_domain)."""
    from cubes_spark.llm import cap_per_domain

    docs = _table(spark, sf_dir, "documents")
    out = cap_per_domain(docs, domain_col="source", max_per_domain=10,
                         quality_col="n_chars")
    return _lng(out.select("doc_id", "source", "n_chars"),
                "doc_id", "n_chars")



def q_emb_semdedup_greedy(spark, sf_dir):
    """SemDeDup with the paper's EXACT sequential-greedy keep-set,
    distributed as bounded decidability rounds (a vector decides once
    all its lower-id near neighbours have; kept iff none kept) —
    on transitive chains this keeps what the one-pass rule
    over-removes (cubes_spark/llm/similarity.py:semantic_dedup_greedy).
    The oracle unrolls the same rounds as chained CTEs, so both
    engines compute the identical bounded fixed point."""
    from cubes_spark.llm import semantic_dedup_greedy

    emb = _table(spark, sf_dir, "embeddings")
    out = semantic_dedup_greedy(emb, threshold=0.35, nlist=16, seed=42,
                                sample_size=4096, max_rounds=8)
    return out.select(
        "vec_id", "cluster",
        F.col("is_kept").cast("int").cast("long").alias("is_kept"),
    )



def q_doc_tfidf(spark, sf_dir):
    """Per-document TF-IDF keywords: top-5 terms by tf * smoothed-IDF
    with deterministic ties (cubes_spark/llm/text.py:tfidf_keywords).
    The oracle recomputes tf, df, N and ln((N+1)/(df+1)) in SQL —
    float-exact because both engines compute the same double
    expression."""
    from cubes_spark.llm import tfidf_keywords

    docs = _table(spark, sf_dir, "documents")
    out = tfidf_keywords(docs, top_k=5)
    return _lng(out, "doc_id", "tf", "rank")



def q_doc_embed(spark, sf_dir):
    """Feature-hashing document embeddings (hashing trick): token ->
    +/-1 on component hash64(token) mod dim, L2-normalized — the
    in-engine text->vector step that feeds the ANN / semantic-dedup
    family (cubes_spark/llm/text.py:feature_hash_embed).  The oracle
    replays both md5-derived hashes and the same fold in SQL; compared
    via the rounded vector component at doc_id mod dim plus the exact
    count of non-zero components."""
    from cubes_spark.llm import feature_hash_embed

    docs = _table(spark, sf_dir, "documents")
    out = feature_hash_embed(docs, dim=16)
    comp = (F.col("doc_id") % 16).cast("int")
    return _lng(
        out.select(
            "doc_id",
            F.round(F.element_at("embedding", comp + 1), 6)
            .alias("probe_component"),
            F.aggregate(
                "embedding", F.lit(0).cast("long"),
                lambda acc, x: acc
                + F.when(x != 0.0, 1).otherwise(0).cast("long"))
            .alias("n_nonzero"),
        ),
        "doc_id", "n_nonzero")



def q_doc_quality_model(spark, sf_dir):
    """LEARNED quality filter (DCLM/fastText-filter shape): logistic
    regression over the engine's text statistics, trained driver-side
    on the first-256-docs sample with the rule-based quality score as
    weak labels, scored as a pure-JVM dot product
    (cubes_spark/llm/quality.py).  The oracle retrains the identical
    model from the identical rounded features via DuckDB + the same
    numpy IRLS, then replays the scoring with weight literals — the
    logit is a bit-identical double on both engines (same IEEE op
    order); the sigmoid is exposed to users but not compared (exp()
    rounding is engine-specific)."""
    from cubes_spark.llm import (
        score_quality_classifier,
        train_quality_classifier,
    )

    docs = _table(spark, sf_dir, "documents")
    weights = train_quality_classifier(docs, sample_size=256)
    out = score_quality_classifier(docs, weights)
    return _lng(
        out.select(
            "doc_id",
            F.round("logit", 6).alias("logit"),
            (F.col("logit") > 0).cast("int").cast("long")
            .alias("label"),
        ),
        "doc_id", "label")


def q_drill_across(spark, sf_dir):
    """Drill-across (operators/olap.py:drill_across): the sales and
    sales_outer cubes aggregated to the SAME conformed returnflag
    grain and full-outer-joined — Kimball's multi-fact query, which
    the reference (one cube per query) cannot express.  Each side is
    its own grain-sized cuboid; the join is grain-cardinality, never
    fact-to-fact."""
    from cubes_spark.operators.olap import drill_across

    ws = _ws(spark, sf_dir)
    out = drill_across(
        [(ws.browser("sales"), ["price_sum", "fact_count"]),
         (ws.browser("sales_outer"), ["quantity_sum", "dqty_sum"])],
        drilldown=["returnflag"],
    )
    return _lng(
        _dbl(out, "sales_price_sum", "sales_outer_quantity_sum",
             "sales_outer_dqty_sum"),
        "sales_fact_count")


def q_emb_pq(spark, sf_dir):
    """Product-quantization ADC top-k (llm/similarity.py:pq_topk;
    Jégou et al. 2011): corpus vectors encoded to 8 codewords (32x
    memory cut), queries scan codes with asymmetric distances —
    the in-cell scan of an IVF-PQ index.  Codebooks train on the
    deterministic id-ordered sample; distances are int64 sums of
    1e-12-quantized subspace terms, so the oracle retrains the same
    codebooks and replays encode + ADC bit-exactly."""
    from cubes_spark.llm import pq_topk

    emb = _table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return pq_topk(emb, queries, k=5, exclude_self=True)


def q_doc_ssjoin(spark, sf_dir):
    """EXACT set-similarity self-join (llm/dedup.py:
    jaccard_similarity_join, AllPairs prefix filtering): every pair
    of documents with token-set Jaccard >= 0.95, integer-verified —
    the oracle is the BRUTE-FORCE all-pairs scan, so a hash match
    proves the prefix filter missed nothing (recall exactly 1.0,
    unlike MinHash)."""
    from cubes_spark.llm import jaccard_similarity_join

    docs = _table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 300).select("doc_id", "text")
    return jaccard_similarity_join(docs, threshold=0.95)


def q_events_twap(spark, sf_dir):
    """Time-weighted average (TWAP): each user-day's value states
    weighted by how long they held (event until next event; the last
    holds to midnight).  All arithmetic is INTEGER — value in cents ×
    duration in µs sums exactly at any parallelism (a float TWAP's
    partial-sum order would break bit-parity).  One user-keyed window
    + one groupBy."""
    from pyspark.sql import Window

    ev = _table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    day = F.date_trunc("day", F.col("ts"))
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    day_end = F.unix_micros(day + F.expr("INTERVAL 24 HOURS"))
    next_ts = F.coalesce(F.unix_micros(F.lead("ts").over(w)), day_end)
    dur_us = next_ts - F.unix_micros(F.col("ts"))
    v_cents = F.round(F.col("value") * 100).cast("long")
    weighted = ev.select(
        "user_id", day.alias("day"),
        (v_cents * dur_us).alias("__wv__"),
        dur_us.alias("__d__"),
    )
    return weighted.groupBy("user_id", "day").agg(
        F.sum("__wv__").cast("long").alias("weighted_cents_us"),
        F.sum("__d__").cast("long").alias("held_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def q_doc_communities(spark, sf_dir):
    """Label-propagation communities (llm/web.py:label_propagation)
    over an in-plan ring graph (blocks of 50 docs): 3 synchronous
    rounds, most-frequent-neighbor labels with min tie-break —
    deterministic at any parallelism; the oracle unrolls the same
    rounds in SQL (MATERIALIZED per round)."""
    from cubes_spark.llm import label_propagation

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    edges = docs.select(
        F.col("doc_id").alias("src"),
        (F.expr("doc_id div 50") * 50
         + (F.col("doc_id") % 50 + 1) % 50).alias("dst"),
    )
    return label_propagation(edges, rounds=3).select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("label"))


def q_events_anomaly(spark, sf_dir):
    """Time-series anomaly scoring: hourly error counts z-scored
    against the trailing 24-hour window (exclusive of the current
    hour — scoring a point against a baseline that contains it mutes
    the anomaly).  Quantized z in integer 1e-4 units for exact
    parity; flagged at |z| > 3.  Grain-bounded window work over the
    pre-aggregated hourly series."""
    from pyspark.sql import Window

    ev = _table(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.orderBy("hour").rowsBetween(-24, -1)
    mean = F.avg(F.col("n").cast("double")).over(w)
    nw = F.count("n").over(w).cast("double")
    s = F.sum(F.col("n").cast("double")).over(w)
    s2 = F.sum((F.col("n") * F.col("n")).cast("double")).over(w)
    var = F.when(nw < 2, F.lit(0.0)).otherwise(
        (s2 - s * s / nw) / (nw - F.lit(1.0)))
    std = F.sqrt(var)
    z = F.when(std > 0,
               (F.col("n").cast("double") - mean) / std)
    out = hourly.select(
        "hour", "n",
        F.round(z * 10000).cast("long").alias("z_q"),
        (F.abs(F.coalesce(z, F.lit(0.0))) > 3).alias("is_anomaly"),
    )
    return out


def q_events_paths(spark, sf_dir):
    """Event path analysis (funnel discovery): the 50 most common
    3-step event-type sequences across user journeys — two leads over
    the per-user ordered stream, then a count.  One user-keyed window
    shuffle + one path groupBy; paths, not users, bound the output."""
    from pyspark.sql import Window

    ev = _table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "event_type", "e2", "e3")
                .alias("path"))
        .groupBy("path").agg(F.count(F.lit(1)).cast("long")
                             .alias("n_paths"))
    )
    top = paths.orderBy(F.col("n_paths").desc(),
                        F.col("path").asc()).limit(50)
    w2 = Window.orderBy(F.col("n_paths").desc(), F.col("path").asc())
    return top.withColumn("rank",
                          F.row_number().over(w2).cast("long"))


def q_profile_orders(spark, sf_dir):
    """Column profiling (data-quality report): per-column null count,
    approx-free exact distinct count, min/max as strings — one
    aggregate pass per metric family over the orders table, unioned
    into a per-column report.  The profiling shape every ingestion
    pipeline runs before trusting a feed."""
    ev = _table(spark, sf_dir, "orders")
    parts = []
    for c in ["o_orderkey", "o_custkey", "o_orderstatus",
              "o_totalprice", "o_orderpriority"]:
        col = F.col(c)
        parts.append(ev.agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(col.isNull().cast("long")).cast("long")
            .alias("n_null"),
            F.countDistinct(col).cast("long").alias("n_distinct"),
            F.min(col).cast("string").alias("min_value"),
            F.max(col).cast("string").alias("max_value"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_events_scd2(spark, sf_dir):
    """SCD Type-2 history collapse (operators/olap.py:scd2_collapse):
    each user's event-type change log becomes versioned dimension
    rows with valid_from/valid_to/is_current — lag-based change
    detection, running-sum versioning, lead-based intervals; one
    key-partitioned shuffle, no self-joins.  Oracle replays the same
    windows in SQL."""
    from cubes_spark.operators.olap import scd2_collapse

    ev = _table(spark, sf_dir, "events").filter(
        F.col("user_id") < 30).select(
        "user_id", "ts", "event_id", "event_type")
    out = scd2_collapse(ev, ["user_id"], ["event_type"], "ts",
                        order_extra=["event_id"])
    return out.select("user_id", "event_type", "valid_from",
                      "valid_to", "is_current", "version")


def q_sql_view(spark, sf_dir):
    """Raw-SQL access to the cube (Workspace.register_sql_views): the
    denormalized star exposed as a LAZY temp view, aggregated with
    plain spark.sql — columns prune and filters push down to the
    scans (dimension joins remain, broadcast-sized; the browser's
    star builder is the join-pruned path), and the result equals the
    plain SQL over the raw tables."""
    ws = _ws(spark, sf_dir)
    ws.register_sql_views(cubes=["sales"])
    return spark.sql("""
        SELECT date__year AS year,
            CAST(SUM(CAST(quantity AS DECIMAL(20,2))) AS DOUBLE)
                AS quantity_sum,
            CAST(COUNT(*) AS BIGINT) AS fact_count
        FROM cube_sales GROUP BY 1""")


def q_parent_child(spark, sf_dir):
    """Ragged parent-child hierarchy flattening (operators/olap.py:
    flatten_parent_child): a 4-level customer reporting chain
    (parent = custkey div 10) resolved to (id, root, depth) by
    pointer jumping — log2(depth) self-join rounds, not depth rounds;
    the oracle is DuckDB's WITH RECURSIVE walking every chain."""
    from cubes_spark.operators.olap import flatten_parent_child

    cust = _table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.when(F.col("c_custkey") >= 10,
               F.expr("c_custkey div 10")).alias("parent"))
    return flatten_parent_child(cust, "id", "parent", max_depth=64)


def q_events_stream_hh(spark, sf_dir):
    """Streaming heavy hitters: a per-day count-min grid built
    INCREMENTALLY over the watermarked event stream (state = 2×64
    counters per window regardless of key cardinality), replayed to
    completion and compared cell-for-cell against the batch SQL grid
    — streaming == batch == oracle for a sketch, not just a sum."""
    from cubes_spark.functions.sketches import countmin_sketch
    from cubes_spark.streaming import read_parquet_stream, \
        replay_to_memory

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    grid = countmin_sketch(stream, "user_id", depth=2, width=64,
                           window="1 day", ts_col="ts",
                           watermark="2 hours")
    result = replay_to_memory(grid, "q_events_stream_hh")
    return result.select("window_start", "row", "bucket", "n")


def q_events_bloom(spark, sf_dir):
    """Bloom-filter membership (functions/sketches.py): the set of
    users with any purchase over 90 summarized into a 4096-bit /
    128-word filter, probed for every distinct user.  The entry emits
    the no-false-negative proof per row (a member may never probe
    false); the md5-derived bit grid replays integer-exactly in
    SQL, false positives and all."""
    from cubes_spark.functions.sketches import (
        bloom_build,
        bloom_contains,
    )

    ev = _table(spark, sf_dir, "events")
    members = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 90)
    ).select("user_id").distinct()
    bloom = bloom_build(members, "user_id")
    probes = ev.select("user_id").distinct()
    probed = bloom_contains(bloom, probes, "user_id")
    actual = members.withColumn("actual", F.lit(True))
    out = probed.join(actual, "user_id", "left").withColumn(
        "actual", F.coalesce(F.col("actual"), F.lit(False)))
    return out.select(
        "user_id", "maybe_present", "actual",
        (F.col("maybe_present") | ~F.col("actual"))
        .alias("no_false_neg"))


def q_events_countmin(spark, sf_dir):
    """Count-min heavy hitters (functions/sketches.py): a 4×256 grid
    over event user_ids, point-estimated for every distinct user and
    compared against the exact counts — the estimate can only
    overestimate (cm_ok asserts it per row), and the md5-derived grid
    replays integer-exactly in SQL."""
    from cubes_spark.functions.sketches import (
        countmin_estimates,
        countmin_sketch,
    )

    ev = _table(spark, sf_dir, "events")
    sketch = countmin_sketch(ev, "user_id")
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n"))
    est = countmin_estimates(sketch, exact, "user_id")
    return est.select(
        "user_id", "exact_n", "cm_estimate",
        (F.col("cm_estimate") >= F.col("exact_n")).alias("cm_ok"))


def q_fuzzy_names(spark, sf_dir):
    """Fuzzy entity resolution (llm/dedup.py:fuzzy_pairs): customer
    names within Levenshtein distance 1, found by FastSS
    deletion-neighborhood blocking + single-shuffle bucket pairs.
    The oracle is the BRUTE-FORCE all-pairs scan — a hash match
    proves the blocking missed nothing (FastSS completeness), not
    just that verified pairs are right."""
    from cubes_spark.llm import fuzzy_pairs

    cust = _table(spark, sf_dir, "customer") \
        .filter(F.col("c_custkey") <= 300) \
        .select(F.col("c_custkey").alias("doc_id"),
                F.col("c_name").alias("name"))
    return fuzzy_pairs(cust, col="name").select(
        "id_a", "id_b", "distance")


def q_topk_per_region(spark, sf_dir):
    """Per-group top-N (operators/olap.py:top_n_per_group): the three
    highest-revenue customers of each region — ranked over the
    ALREADY-AGGREGATED customer grain, so the window's per-partition
    state is customers, not facts."""
    from cubes_spark.operators.olap import top_n_per_group

    df = _browser(spark, sf_dir).aggregation_dataframe(
        drilldown=["customer_geo:customer"],
        aggregates=["price_sum"],
    )
    out = top_n_per_group(
        df, ["customer_geo.region_key"],
        [F.col("price_sum").desc(),
         F.col("`customer_geo.customer_key`").asc()],
        n=3)
    out = out.select(
        "`customer_geo.region_key`", "`customer_geo.nation_key`",
        "`customer_geo.customer_key`", "price_sum", "rank")
    return _lng(
        _dbl(out, "price_sum"),
        "customer_geo.region_key", "customer_geo.nation_key",
        "customer_geo.customer_key")


def q_events_gap_fill(spark, sf_dir):
    """Dense time spine (operators/olap.py:fill_time_gaps): hourly
    error-event counts with every empty hour present as an explicit
    zero row — a plain GROUP BY cannot emit absent hours; the spine
    is a sequence() explode of the 2-value min/max row, never a fact
    rescan."""
    from cubes_spark.operators.olap import fill_time_gaps

    ev = _table(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_errors"))
    )
    filled = fill_time_gaps(hourly, "hour", step="1 hour")
    return filled.select(
        "hour", F.col("n_errors").cast("long").alias("n_errors"))


def q_compact_roundtrip(spark, sf_dir):
    """Small-files compaction (operators/scale.py:compact_table): the
    events table written as 64 tiny files, compacted in place, then
    re-read — the entry returns the per-type value sums plus the
    compaction's file-count proof (files shrank to the byte-sized
    target; data bit-identical), so a green row certifies the rewrite
    lost nothing."""
    import glob
    import os
    import tempfile

    from cubes_spark.operators.scale import compact_table

    ev = _table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    path = os.path.join(tempfile.mkdtemp(prefix="compact_"), "ev")
    ev.repartition(64).write.mode("overwrite").parquet(path)
    files_before = len(glob.glob(os.path.join(path, "*.parquet")))
    compact_table(spark, path, target_file_mb=256)
    files_after = len(glob.glob(os.path.join(path, "*.parquet")))
    back = spark.read.parquet(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(20,2)")).cast("double")
        .alias("value_sum"),
        F.min("event_id").cast("long").alias("min_id"),
        F.max("event_id").cast("long").alias("max_id"),
    ).withColumn(
        "compacted_ok",
        F.lit(bool(files_after < files_before and files_after >= 1)))


def q_emb_pq_recall(spark, sf_dir):
    """Driver signal for the PQ scale-path quality: recall@1 of the
    ADC scan vs the exact cosine top-1 on the planted near-duplicate
    queries — same auditable-count shape as emb_ivf_recall.  The
    oracle retrains identical codebooks on the identically-constructed
    augmented sample and replays encode + ADC + the exact ranking."""
    from cubes_spark.llm import pq_topk

    corpus = _augmented_embeddings(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") >= _PLANT_OFFSET)
    exact = cosine_topk(corpus, queries, k=1).select(
        "query_id", "neighbor_id")
    approx = (
        pq_topk(corpus, queries, k=1, exclude_self=True)
        .select("query_id", "neighbor_id")
        .withColumn("__hit__", F.lit(1))
    )
    marked = exact.join(approx, ["query_id", "neighbor_id"], "left")
    agg = marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum(F.coalesce(F.col("__hit__"), F.lit(0)))
        .cast("long").alias("n_hit"),
    )
    return agg.select(
        "n_exact", "n_hit",
        F.expr("n_hit * 10000 div n_exact").alias("recall_bp"),
        (F.col("n_hit") * 10 >= F.col("n_exact") * 8).alias("recall_ok"),
    )


def q_doc_dsir_sample(spark, sf_dir):
    """DSIR Gumbel-top-k resampling (llm/quality.py:dsir_resample):
    64 docs sampled without replacement proportional to the
    importance weight, with per-document md5-seeded Gumbel noise —
    deterministic, partition-invariant, and the oracle replays the
    identical hash/ln arithmetic."""
    from cubes_spark.llm import (
        dsir_bucket_counts_pair,
        dsir_log_ratios,
        dsir_resample,
        dsir_score,
    )

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text")
    ratios_q = dsir_log_ratios(
        *dsir_bucket_counts_pair(docs, F.col("lang") == "en",
                                 dim=128))
    scored = dsir_score(docs, ratios_q)
    out = dsir_resample(scored, k=64)
    return out.select("doc_id", "lang", "dsir_score_q",
                      "gumbel_key", "rank")


#: fixed query for the BM25 retrieval entry
_BM25_TERMS = ["customer", "query", "stream", "vector"]


def q_doc_bm25(spark, sf_dir):
    """BM25 keyword retrieval (llm/text.py:bm25_search): top-20 docs
    for a fixed 4-term query.  Postings are filtered to the query
    terms before any shuffle; per-term contributions quantize to
    int64 1e-9 units so the document score is an exact sum at any
    parallelism; top-k via TakeOrdered, rank window only over the 20
    survivors.  The oracle recomputes df/idf/avgdl independently and
    replays the same IEEE expression order."""
    from cubes_spark.llm import bm25_search

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_search(docs, _BM25_TERMS, top_k=20)


def q_doc_dsir(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169;
    cubes_spark/llm/quality.py): hashed unigram+bigram importance
    weights ``log p_target - log p_raw`` with the English subset as
    the target distribution.  Counting is distributed with a
    dim-bounded collect; scoring is one JVM fold per document over a
    128-entry literal ratio array, quantized to int64 1e-6 units so
    the sum is exact at any parallelism.  The oracle independently
    recounts both distributions in DuckDB and replays the scoring."""
    from cubes_spark.llm import (
        dsir_bucket_counts_pair,
        dsir_log_ratios,
        dsir_score,
    )

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text")
    target_counts, raw_counts = dsir_bucket_counts_pair(
        docs, F.col("lang") == "en", dim=128)
    ratios_q = dsir_log_ratios(target_counts, raw_counts)
    out = dsir_score(docs, ratios_q)
    return out.select("doc_id", "lang", "dsir_score_q", "n_grams")


# ---------------------------------------------------------------------------
# driver surface
# ---------------------------------------------------------------------------


def q_slicer_http_agg(spark, sf_dir):
    """Remote Slicer store loopback (sources/slicer.py SlicerHTTPStore
    + SlicerBrowser; parity: reference server/store.py SlicerStore,
    server/browser.py SlicerBrowser): hosts this workspace's own HTTP
    server on an ephemeral loopback port, federates it into a SECOND
    workspace via import_slicer, and runs the yearly aggregate
    REMOTELY — a real urllib round-trip; the relayed cells must equal
    the base SQL the local browser would produce."""
    import threading

    from werkzeug.serving import make_server

    from cubes_spark.server import create_server
    from cubes_spark.sources.workspace import Workspace

    app = create_server(_ws(spark, sf_dir))
    server = make_server("127.0.0.1", 0, app)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        ws = Workspace(spark)
        ws.import_slicer(f"http://127.0.0.1:{server.server_port}",
                         cubes=["sales"])
        result = ws.browser("sales").aggregate(
            drilldown=["date:year"],
            aggregates=["quantity_sum", "price_sum", "fact_count"])
        cells = list(result.cells)
    finally:
        server.shutdown()
        thread.join(timeout=5)
    rows = [(int(c["date.year"]), float(c["quantity_sum"]),
             float(c["price_sum"]), int(c["fact_count"]))
            for c in cells]
    return spark.createDataFrame(
        rows, "`date.year` long, quantity_sum double, "
              "price_sum double, fact_count long")


def q_lineitem_hll(spark, sf_dir):
    """HyperLogLog distinct-count sketch (functions/sketches.py:
    hll_registers/hll_estimate; Flajolet et al. 2007): per returnflag,
    exact distinct order count vs the integer-exact HLL estimate from
    256 mergeable registers.  The md5-split bucket/rank arithmetic and
    the harmonic-sum estimate are pure integers, so the oracle rebuilds
    the identical registers AND estimate; hll_ok asserts the ±25%
    band (m=256 → σ≈6.5%)."""
    from cubes_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )

    li = _table(spark, sf_dir, "lineitem")
    regs = hll_registers(li, "l_orderkey", ["l_returnflag"])
    est = hll_estimate(regs, ["l_returnflag"])
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").cast("long").alias("n_exact"))
    out = exact.join(est, "l_returnflag")
    return out.select(
        "l_returnflag", "n_exact", "hll_est",
        (F.abs(F.col("hll_est") - F.col("n_exact")) * 4
         <= F.col("n_exact")).alias("hll_ok"))


def q_basket_pairs(spark, sf_dir):
    """Market-basket co-occurrence (operators/olap.py:basket_pairs;
    association-rule support/lift): part pairs ordered together in
    >= 2 orders, with per-item supports and integer-basis-point lift.
    One equi-self-join on the basket key — work bounded by basket
    width, never |items|²."""
    from cubes_spark.operators.olap import basket_pairs

    li = _table(spark, sf_dir, "lineitem")
    out = basket_pairs(li, "l_orderkey", "l_partkey", min_count=2)
    return _lng(out, "item_a", "item_b")


def q_events_seasonality(spark, sf_dir):
    """Hour-of-day seasonal index per event type in exact ppm
    (cubes_spark/operators/olap.py:seasonality_profile): slot mean vs
    group mean by integer cross-multiplication — the load-curve
    profile with no double division anywhere."""
    from cubes_spark.operators.olap import seasonality_profile

    ev = _table(spark, sf_dir, "events")
    return seasonality_profile(ev, ["event_type"], "ts", "value",
                               slot="hour_of_day")


def q_orders_abc(spark, sf_dir):
    """ABC / Pareto customer classification
    (cubes_spark/operators/olap.py:abc_classification): descending
    cumulative revenue share per value tie-group off the weighted
    two-phase histogram — A ≤ 80%, B ≤ 95%, C above, all-integer
    basis points, no global sort-rank."""
    from cubes_spark.operators.olap import abc_classification

    orders = _table(spark, sf_dir, "orders")
    return abc_classification(orders, "o_custkey", "o_totalprice")


def q_doc_readability(spark, sf_dir):
    """Integer milli-point Flesch-shape readability
    (llm/text.py:readability_scores): floor-division semantics make
    the classic words/sentences + syllables/words formula exact and
    engine-portable; vowel-group syllables, terminal-punctuation
    sentences."""
    from cubes_spark.llm import readability_scores

    docs = _table(spark, sf_dir, "documents")
    return readability_scores(docs, "text")


def q_doc_diversity(spark, sf_dir):
    """Per-document Gini–Simpson lexical diversity in exact ppm
    (llm/text.py:token_diversity): (n² − Σc²)/n² over token counts —
    the all-rational repetition/boilerplate signal (no logs)."""
    from cubes_spark.llm import token_diversity

    docs = _table(spark, sf_dir, "documents")
    return token_diversity(docs, "text")


def q_source_overlap(spark, sf_dir):
    """Pairwise corpus-slice content overlap
    (llm/dedup.py:source_shingle_overlap): Jaccard of each source
    pair's distinct 5-char shingle sets in basis points — dedupe to
    the (source, shingle) grain first, so per-shingle join work is
    bounded by the slice count, never the corpus."""
    from cubes_spark.llm import source_shingle_overlap

    docs = _table(spark, sf_dir, "documents")
    return source_shingle_overlap(docs, "source", "text", k=5)


def q_lineitem_iqr(spark, sf_dir):
    """Per-returnflag Tukey-fence outlier counts on exact integer
    quartiles (cubes_spark/operators/olap.py:grouped_iqr_outliers):
    Q1/Q3 as rank-based order statistics inside each group's
    partition window, fences compared in doubled cents so 1.5·IQR
    stays integral."""
    from cubes_spark.operators.olap import grouped_iqr_outliers

    li = _table(spark, sf_dir, "lineitem")
    return grouped_iqr_outliers(li, ["l_returnflag"],
                                "l_extendedprice")


def q_events_winfunnel(spark, sf_dir):
    """Time-constrained funnel signup → view → purchase within 24h
    (cubes_spark/operators/olap.py:window_funnel; ClickHouse
    windowFunnel shape, earliest-chain semantics): per user the first
    signup, then the first later view, then the first later purchase
    — depth counts links whose time from the signup stays inside the
    window, stopping at the first miss."""
    from cubes_spark.operators.olap import window_funnel

    ev = _table(spark, sf_dir, "events")
    return window_funnel(ev, "user_id", "ts", "event_type",
                         ["signup", "view", "purchase"],
                         window_seconds=86400)


def q_events_cusum(spark, sf_dir):
    """Per-type CUSUM changepoint estimate over hourly value sums
    (cubes_spark/operators/olap.py:cusum_changepoint; Page 1954):
    scaled integer cusum n·P_i − i·T, argmax |s| with earliest-bucket
    ties — level-shift location with zero double arithmetic."""
    from cubes_spark.operators.olap import cusum_changepoint

    ev = _table(spark, sf_dir, "events")
    return cusum_changepoint(ev, ["event_type"], "ts", "value",
                             bucket="hour")


def q_doc_pmi(spark, sf_dir):
    """Adjacent-bigram collocations scored by the integer PMI
    association ratio (llm/text.py:pmi_collocations; Church & Hanks
    1990): lift_ppm = 10^6·c_ab·N div (c_a·c_b) — exact ppm, no
    double logs, pairs under 5 occurrences dropped."""
    from cubes_spark.llm import pmi_collocations

    docs = _table(spark, sf_dir, "documents")
    return pmi_collocations(docs, "text", min_count=5)


def q_part_kcore(spark, sf_dir):
    """k-core peeling (llm/web.py:kcore_subgraph; Seidman 1983) over
    the part-affinity graph: 3 synchronous peel rounds at k=3 — the
    density filter that keeps only parts whose co-order neighbourhood
    stays >= 3-connected after weak nodes drop.  Fixed rounds make
    the state SQL-unrollable (label_propagation's oracle strategy);
    production uses until_converged=True."""
    from cubes_spark.llm.web import kcore_subgraph
    from cubes_spark.operators.olap import basket_pairs

    li = _table(spark, sf_dir, "lineitem")
    edges = basket_pairs(li, "l_orderkey", "l_partkey",
                         min_count=2).select("item_a", "item_b")
    return _lng(kcore_subgraph(edges, k=3, rounds=3,
                               src="item_a", dst="item_b"), "node")


def q_orders_gini(spark, sf_dir):
    """Revenue-concentration Gini over per-customer order totals
    (cubes_spark/operators/olap.py:gini_concentration): exact
    integer basis points from the cumulative value histogram —
    tied values contribute their rank-run total in closed form, so
    no global sort-rank ever runs."""
    from cubes_spark.operators.olap import gini_concentration

    orders = _table(spark, sf_dir, "orders")
    return gini_concentration(orders, "o_custkey", "o_totalprice")


def q_events_seqmatch(spark, sf_dir):
    """Event-sequence pattern detection
    (cubes_spark/operators/olap.py:sequence_match; ClickHouse
    sequenceCount family): per user, events become a code string in
    strict (ts, event_id) order and 'vc*p' (view, any clicks,
    purchase) is counted non-overlapping; position of the first
    conversion included."""
    from cubes_spark.operators.olap import sequence_match

    ev = _table(spark, sf_dir, "events")
    return sequence_match(
        ev, "user_id", "ts", "event_type", "vc*p",
        codes={"view": "v", "click": "c", "purchase": "p",
               "signup": "s", "error": "e"},
        tiebreak_col="event_id")


def q_events_markov(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (cubes_spark/operators/olap.py:markov_transitions):
    adjacent (state → next) pairs under deterministic (ts, event_id)
    order, transition probability as exact integer ppm — the
    "what happens after X" model, no double ratios anywhere."""
    from cubes_spark.operators.olap import markov_transitions

    ev = _table(spark, sf_dir, "events")
    return markov_transitions(ev, "user_id", "ts", "event_type",
                              tiebreak_col="event_id")


def q_orders_streaks(spark, sf_dir):
    """Gaps-and-islands longest consecutive-month order streak per
    customer (cubes_spark/operators/olap.py:longest_streak): islands
    via the month_index − row_number constant, earliest-run
    tiebreak, streak start reported as (year, month)."""
    from cubes_spark.operators.olap import longest_streak

    orders = _table(spark, sf_dir, "orders")
    return longest_streak(orders, "o_custkey", "o_orderdate")


def q_orders_mad(spark, sf_dir):
    """Per-priority median absolute deviation of order totals in
    exact cents (cubes_spark/operators/olap.py:grouped_mad; Hampel
    1974): both medians are percentile_disc order statistics from
    group-partitioned rank windows — robust dispersion with zero
    interpolation."""
    from cubes_spark.operators.olap import grouped_mad

    orders = _table(spark, sf_dir, "orders")
    return grouped_mad(orders, ["o_orderpriority"], "o_totalprice")


def q_events_attribution(spark, sf_dir):
    """Last-touch conversion attribution
    (cubes_spark/operators/olap.py:last_touch_attribution): each
    purchase credits the most recent strictly-preceding
    view/click/signup by the same user within 24h (microsecond-exact
    gap; no touch → '(none)'), via a last-ignore-nulls running window
    — never a per-conversion scan-back join."""
    from cubes_spark.operators.olap import last_touch_attribution

    ev = _table(spark, sf_dir, "events")
    return last_touch_attribution(
        ev, "user_id", "ts", "event_type", conversion="purchase",
        channels=["view", "click", "signup"],
        window_seconds=24 * 3600, tiebreak_col="event_id")


def q_lineitem_hilbert(spark, sf_dir):
    """Hilbert-curve clustering key (operators/scale.py:
    hilbert_value; the stronger-locality sibling of Z-order — the
    layout idea behind liquid clustering): per 256th of the curve
    over (l_partkey, l_suppkey), row count and min/max envelope of
    both dimensions.  The xy2d walk runs as 16 unrolled integer
    steps (hilbert_step_exprs) whose SQL the oracle replays
    token-for-token — the only dialect difference is the integer-
    division operator."""
    from cubes_spark.operators.scale import hilbert_value

    li = _table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey")
    h = hilbert_value(li, ["l_partkey", "l_suppkey"], bits=16)
    return (
        h.groupBy(F.expr("h div 16777216").alias("h_bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.min("l_partkey").alias("min_part"),
             F.max("l_partkey").alias("max_part"),
             F.min("l_suppkey").alias("min_supp"),
             F.max("l_suppkey").alias("max_supp"))
    )


def q_doc_hits(spark, sf_dir):
    """Integer fixed-point HITS hubs/authorities (llm/web.py:
    hits_scores; Kleinberg 1999) over the synthetic directed doc
    graph (doc_id → (5·id+3) mod n and (7·id+1) mod n): sum-
    normalized per half-iteration in 1/10^12 units, 2 iterations
    unrolled — bit-identical at any parallelism, like
    link_pagerank."""
    from cubes_spark.llm.web import hits_scores

    docs = _table(spark, sf_dir, "documents")
    n = docs.count()
    edges = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 5 + 3) % n).alias("dst")).union(
        docs.select(F.col("doc_id"),
                    (F.col("doc_id") * 7 + 1) % n))
    return _lng(hits_scores(edges, iterations=2), "node")


def q_events_balance(spark, sf_dir):
    """Floor-clamped running balance per user (operators/olap.py:
    clamped_running_sum): value deltas in cents, errors negative; the
    zero-floor recurrence B_i = max(B_{i-1}+x_i, 0) computed by its
    prefix-sum closed form (two running windows — no stateful UDF),
    summarized per user with the final balance and clamp count."""
    from cubes_spark.operators.olap import clamped_running_sum

    ev = _table(spark, sf_dir, "events").withColumn(
        "__d__",
        (F.round(F.col("value") * 100).cast("long")
         * F.when(F.col("event_type") == "error", -1).otherwise(1))
        .cast("long"))
    bal = clamped_running_sum(ev, "user_id", "ts", "__d__",
                              tiebreak_col="event_id")
    return (bal.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.max(F.struct("ts", "event_id", "balance"))
                 .getField("balance").cast("long")
                 .alias("final_balance"),
                 F.sum(F.col("clamped").cast("long")).cast("long")
                 .alias("n_clamps")))


def q_events_holt(spark, sf_dir):
    """Holt linear-trend smoothing over daily value sums per event
    type (cubes_spark/operators/olap.py:holt_trend; Holt 1957,
    alpha=beta=1/2): deterministic fixed-point integer recurrence
    folded JVM-side with F.aggregate over the calendar-bounded
    series — arithmetic shifts so Spark and the oracle's recursive
    CTE floor identically on negative trends."""
    from cubes_spark.operators.olap import holt_trend

    ev = _table(spark, sf_dir, "events")
    return holt_trend(ev, ["event_type"], "ts", "value",
                      bucket="day", horizon=1)


def q_events_bitmap(spark, sf_dir):
    """Mergeable-bitmap EXACT distinct rollup
    (functions/sketches.py:bitmap_distinct_rollup; the ClickHouse
    groupBitmap / Druid bitmap-index pattern): per-type distinct
    users from packed bit arrays built in one (type, chunk) pass,
    and the '(all)' row from OR-merging those same kilobyte bitmaps
    — the second grain never rescans the facts."""
    from cubes_spark.functions.sketches import bitmap_distinct_rollup

    ev = _table(spark, sf_dir, "events")
    return bitmap_distinct_rollup(ev, "event_type", "user_id")


def q_doc_rake(spark, sf_dir):
    """RAKE keyphrase extraction (llm/text.py:rake_keyphrases; Rose
    et al. 2010) in exact integer ppm: phrases are maximal
    stopword/punctuation-delimited content-token runs (gaps-and-
    islands over a per-document window), each word scores
    10^6*degree div frequency over all kept phrases, a phrase sums
    its word scores — no double ratios, SQL-replayable."""
    from cubes_spark.llm import rake_keyphrases

    docs = _table(spark, sf_dir, "documents")
    return rake_keyphrases(docs, "text", "doc_id")


def q_events_semiadd(spark, sf_dir):
    """Semi-additive LastNonEmpty aggregation
    (operators/olap.py:semiadditive_last): per month and event type,
    each user contributes the value of their LAST event — never a
    sum along time — summed across users; enforces what the
    reference only annotates (nonadditive='time',
    metadata/attributes.py:298-338).  Both shuffles are algebraic
    max(struct) / sum — map-side combinable, no fact-table window."""
    from cubes_spark.operators.olap import semiadditive_last

    ev = _table(spark, sf_dir, "events")
    return semiadditive_last(ev, ["event_type"], "user_id", "ts",
                             "value", bucket="month",
                             tiebreak_cols=["event_id"])


def q_events_acf(spark, sf_dir):
    """Integer-exact autocorrelation of daily value sums per event
    type at lags 1..7 (operators/olap.py:autocorrelation): n-scaled
    deviations d_i = n*y_i - S avoid the mean division, decimal(38,0)
    products, sign * truncating-div ppm so Spark's div and DuckDB's
    // agree on negative correlations."""
    from cubes_spark.operators.olap import autocorrelation

    ev = _table(spark, sf_dir, "events")
    return autocorrelation(ev, ["event_type"], "ts", "value",
                           bucket="day", max_lag=7)


def q_doc_freq_tokens(spark, sf_dir):
    """Exact frequent tokens above 0.5% corpus share via the
    two-phase Misra-Gries pattern (functions/sketches.py:
    frequent_items): bounded per-partition summaries guarantee
    candidate completeness, exact recount of candidates only — the
    full-vocabulary groupBy never happens, so 'which tokens exceed
    0.1% of 100 TB' shuffles candidate rows, not the vocabulary."""
    from cubes_spark.functions.sketches import frequent_items
    from cubes_spark.llm.text import token_array

    docs = _table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(token_array(F.lower(F.col("text")))).alias("tok")
    ).filter(F.col("tok") != "")
    return frequent_items(toks, "tok", min_share_ppm=5000)


def q_events_burstiness(spark, sf_dir):
    """Inter-arrival burstiness per user (operators/olap.py:
    burstiness): exact-ppm Fano factor of microsecond gaps,
    (n*Q - S^2) div (n*S) — variance over mean with no early
    division; one per-user window then one algebraic aggregation."""
    from cubes_spark.operators.olap import burstiness

    ev = _table(spark, sf_dir, "events")
    return burstiness(ev, ["user_id"], "ts")


def q_orders_benford(spark, sf_dir):
    """Benford first-digit audit of order totals (operators/dq.py:
    benford_digits): observed vs log10(1+1/d) digit shares and a
    chi-square-style deviation, all in integer ppm — the irrational
    logs enter only as nine pre-rounded constants both engines
    share."""
    from cubes_spark.operators.dq import benford_digits

    od = _table(spark, sf_dir, "orders")
    return benford_digits(od, "o_totalprice")


def q_part_ra(spark, sf_dir):
    """Resource-allocation link prediction (llm/web.py:
    ra_link_prediction; Zhou, Lu & Zhang 2009) over the part-affinity
    graph: non-adjacent pairs score sum over common neighbours of
    10^6 div degree — Adamic-Adar's rational sibling, hub neighbours
    discounted to noise.  Same single-wedge-join shape as
    part_links; integer ppm replays exactly in SQL."""
    from cubes_spark.llm.web import ra_link_prediction
    from cubes_spark.operators.olap import basket_pairs

    li = _table(spark, sf_dir, "lineitem")
    edges = basket_pairs(li, "l_orderkey", "l_partkey",
                         min_count=2).select("item_a", "item_b")
    out = ra_link_prediction(edges, "item_a", "item_b",
                             min_common=2)
    return _lng(out, "node_a", "node_b")


def q_rfm_customers(spark, sf_dir):
    """RFM quartile segmentation of customers from their orders
    (cubes_spark/operators/olap.py:rfm_segments): exact
    percentile_disc bin boundaries computed via the distributed
    two-phase histogram (never a one-partition window), recency
    reversed per the RFM convention, integer-cents monetary."""
    from cubes_spark.operators.olap import rfm_segments

    orders = _table(spark, sf_dir, "orders")
    return rfm_segments(orders, "o_custkey", "o_orderdate",
                        "o_totalprice", as_of="1998-12-31")


def q_multiformat_store(spark, sf_dir):
    """Multi-format store sources (sources/workspace.py ParquetStore
    EXTENSIONS): nation written as CSV (header + schema inference),
    region as JSON-lines, then read back THROUGH the store catalog and
    joined — the ingest formats a pipeline normalizes into parquet,
    resolved by the same table() lookup.  The oracle reads the
    original parquet."""
    import os
    import shutil

    from cubes_spark.sources.workspace import ParquetStore

    tmp = f"/tmp/cubes_spark_fmtstore_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    _table(spark, sf_dir, "nation").coalesce(1).write \
        .mode("overwrite").option("header", "true") \
        .csv(os.path.join(tmp, "nation.csv"))
    _table(spark, sf_dir, "region").coalesce(1).write \
        .mode("overwrite").json(os.path.join(tmp, "region.jsonl"))
    store = ParquetStore(spark, tmp)
    assert sorted(store.list_tables()) == ["nation", "region"]
    nation, region = store.table("nation"), store.table("region")
    out = (
        nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nations"),
             F.sum(F.col("n_nationkey").cast("long")).cast("long")
             .alias("key_sum"))
    )
    return out


def q_doc_cdc_dedup(spark, sf_dir):
    """Content-defined chunking dedup profile (llm/dedup.py:
    cdc_chunks/cdc_dedup_stats; FastCDC/rsync family): rolling-hash
    boundaries split each document into ~32-char content-addressed
    chunks; per-doc counts of chunks whose hash recurs in another
    document, ratio in integer basis points.  Boundaries, chunk
    hashes and ratios are all md5/integer arithmetic — the oracle
    replays chunking end-to-end."""
    from cubes_spark.llm.dedup import cdc_dedup_stats

    docs = _table(spark, sf_dir, "documents")
    return cdc_dedup_stats(docs)


def q_orders_quantiles(spark, sf_dir):
    """Mergeable histogram-quantile sketch (functions/sketches.py:
    histogram_quantiles): per order-priority price quantiles read off
    a $1000-wide cumulative histogram — the mergeable-state quantile
    answer (one map-side-combinable bucket groupBy; the true
    rank value provably lies in [est_lo, est_hi] by construction).
    All integer arithmetic; the oracle replays the histogram walk
    bit-for-bit."""
    from cubes_spark.functions.sketches import histogram_quantiles

    orders = _table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority"),
        F.round(F.col("o_totalprice") * 100).cast("long")
        .alias("price_cents"))
    return histogram_quantiles(
        orders, "price_cents", [2500, 5000, 9000, 9900],
        width=100000, group_cols=["o_orderpriority"])


def q_part_triangles(spark, sf_dir):
    """Degree-oriented triangle counting (llm/web.py:triangle_counts;
    node-iterator++/compact-forward) over the part-affinity graph
    (basket_pairs edges, parts co-ordered in >= 2 orders): per-node
    triangle counts — the local clustering signal.  Orientation from
    low to high degree bounds wedge work at ~sqrt(|E|) out-degree,
    the reason hubs don't explode the self-join."""
    from cubes_spark.llm.web import triangle_counts
    from cubes_spark.operators.olap import basket_pairs

    li = _table(spark, sf_dir, "lineitem")
    edges = basket_pairs(li, "l_orderkey", "l_partkey",
                         min_count=2).select("item_a", "item_b")
    out = triangle_counts(edges, "item_a", "item_b")
    return _lng(out, "node")


def q_events_stream_hll(spark, sf_dir):
    """Streaming approx-distinct: per-day HyperLogLog registers built
    INCREMENTALLY over the watermarked event stream (state = 32
    registers per open window no matter how many distinct users flow
    through), replayed to completion; the batch side then reads the
    integer-exact estimate off the collected registers and compares
    against the exact per-day distinct count — streaming == batch ==
    oracle for a cardinality sketch.  ±50% acceptance band (m=32,
    σ≈18%)."""
    from cubes_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )
    from cubes_spark.streaming import read_parquet_stream, \
        replay_to_memory

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    regs = hll_registers(stream, "user_id", m=32, window="1 day",
                         ts_col="ts", watermark="2 hours")
    result = replay_to_memory(regs, "q_events_stream_hll")
    est = hll_estimate(result, ["window_start"], m=32)
    ev = _table(spark, sf_dir, "events")
    exact = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("window_start")
    ).agg(F.count_distinct("user_id").cast("long").alias("n_exact"))
    out = exact.join(est, "window_start")
    return out.select(
        "window_start", "n_exact", "hll_est",
        (F.abs(F.col("hll_est") - F.col("n_exact")) * 2
         <= F.col("n_exact")).alias("hll_ok"))


def q_orders_kmv(spark, sf_dir):
    """KMV distinct sketch with SET OPERATIONS (functions/sketches.py:
    kmv_sketch/kmv_set_ops; Beyer et al. SIGMOD 2007): per order-
    priority pair, estimated union / intersection / Jaccard of the
    distinct-customer sets from 256-hash synopses — the segment-
    overlap question HLL registers cannot answer — checked against the
    exact pairwise counts with a ±25% acceptance band (k=256 →
    σ≈6.3%).  All hash, threshold and estimator arithmetic is
    integer/decimal-exact, so the oracle replays every value."""
    from cubes_spark.functions.sketches import kmv_set_ops, kmv_sketch

    orders = _table(spark, sf_dir, "orders")
    sk = kmv_sketch(orders, "o_custkey", ["o_orderpriority"], k=256)
    ops = kmv_set_ops(sk, "o_orderpriority", k=256)
    d = orders.select("o_orderpriority", "o_custkey").distinct()
    counts = d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    inter = (
        d.alias("a").join(
            d.withColumnRenamed("o_orderpriority", "pb").alias("b"),
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderpriority") < F.col("pb")))
        .groupBy(F.col("a.o_orderpriority").alias("group_a"),
                 F.col("pb").alias("group_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    exact = (
        inter
        .join(counts.withColumnRenamed("o_orderpriority", "group_a")
              .withColumnRenamed("n", "na"), "group_a")
        .join(counts.withColumnRenamed("o_orderpriority", "group_b")
              .withColumnRenamed("n", "nb"), "group_b")
        .select("group_a", "group_b", "n_inter",
                (F.col("na") + F.col("nb") - F.col("n_inter"))
                .alias("n_union"))
    )
    out = ops.join(exact, ["group_a", "group_b"])
    return out.select(
        "group_a", "group_b", "union_est", "inter_est", "jaccard_bp",
        "n_union", "n_inter",
        (F.abs(F.col("union_est") - F.col("n_union")) * 4
         <= F.col("n_union")).alias("union_ok"),
        (F.abs(F.col("inter_est") - F.col("n_inter")) * 4
         <= F.col("n_inter")).alias("inter_ok"))


def q_orders_psample(spark, sf_dir):
    """Approximate query processing from a bounded weighted sample
    (functions/aqp.py: priority_sample/priority_estimate; Duffield,
    Lund & Thorup JACM 2007): per order priority, total revenue
    estimated from a 256-row priority sample with Horvitz-Thompson
    weights — the fixed-size synopsis that answers subset-sum queries
    without rescanning the facts.  The uniform draw is the portable
    md5 hash and priorities/threshold/estimate are DECIMAL-exact, so
    the oracle replays the sample AND the estimate bit-for-bit;
    ps_ok asserts the ±25% band (k=256 → σ≈6%)."""
    from cubes_spark.functions.aqp import (
        priority_estimate,
        priority_sample,
    )

    orders = _table(spark, sf_dir, "orders")
    o = orders.withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long"))
    s = priority_sample(o, "cents", 256, "o_orderkey",
                        ["o_orderpriority"])
    est = priority_estimate(s, 256, ["o_orderpriority"])
    exact = o.groupBy("o_orderpriority").agg(
        F.sum("cents").cast("long").alias("exact_sum"))
    out = est.join(exact, "o_orderpriority")
    return out.select(
        "o_orderpriority", "est_sum", "n_sampled", "exact_sum",
        (F.abs(F.col("est_sum") - F.col("exact_sum")) * 4
         <= F.col("exact_sum")).alias("ps_ok"))


def q_lineitem_zorder(spark, sf_dir):
    """Z-order (Morton) multi-dimensional clustering key
    (operators/scale.py: zorder_value — the layout behind
    Delta/Iceberg OPTIMIZE ZORDER): per 256th of the curve over
    (l_partkey, l_suppkey), row count and the min/max envelope of
    BOTH dimensions — the tight per-segment boxes that let footer
    statistics prune files for predicates on any participating
    column.  Min-max scaling and bit interleaving are pure integer
    ops, so the oracle rebuilds identical curve values.  (The
    write-side payoff is measured in tests/test_scale.py: a 2-D box
    query skips ~98% of z-laid-out files vs 0% of random layout.)"""
    from cubes_spark.operators.scale import zorder_value

    li = _table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey")
    z = zorder_value(li, ["l_partkey", "l_suppkey"], bits=16)
    return (
        z.groupBy(F.expr("z div 16777216").alias("z_bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.min("l_partkey").alias("min_part"),
             F.max("l_partkey").alias("max_part"),
             F.min("l_suppkey").alias("min_supp"),
             F.max("l_suppkey").alias("max_supp"))
    )


def q_cuboid_greedy(spark, sf_dir):
    """Materialized-view selection over the cuboid lattice
    (operators/preagg.py: cuboid_sizes + greedy_cuboid_selection;
    Harinarayan, Rajaraman & Ullman SIGMOD 1996): exact sizes of all
    2³ cuboids of (priority, status, year) from ONE cube() pass, each
    cuboid's first-round HRU benefit ``2^n_dims · (base − size)``,
    and the greedy algorithm's first pick — the decision layer above
    Cuboid.materialize/preagg routing that chooses WHICH aggregates
    to build under a space budget (at 100 TB you cannot build all
    2^d).  The multi-round greedy is driver arithmetic over 2^d
    numbers (tests/test_preagg.py); sizes and the first pick are
    integer-exact and replayed by the oracle."""
    from pyspark.sql import Window

    from cubes_spark.operators.preagg import cuboid_sizes

    orders = _table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
        F.year("o_orderdate").alias("yr"))
    sizes = cuboid_sizes(orders, ["pri", "st", "yr"])
    base = sizes.filter(F.col("grouping_id") == 0).select(
        F.col("size").alias("__base__"))
    benefit = (
        F.when(F.col("grouping_id") == 0, F.lit(0))
        .otherwise(
            F.pow(F.lit(2.0), F.col("n_dims").cast("double"))
            .cast("long")
            * (F.col("__base__") - F.col("size")))
    )
    w = Window.orderBy(F.desc("benefit_r1"), F.asc("size"),
                       F.asc("grouping_id"))
    return (
        sizes.crossJoin(F.broadcast(base))
        .withColumn("benefit_r1", benefit.cast("long"))
        .withColumn(
            "picked_first",
            (F.col("grouping_id") != 0)
            & (F.row_number().over(w) == 1))
        .select("grouping_id", "n_dims", "size", "benefit_r1",
                "picked_first")
    )


def q_part_links(spark, sf_dir):
    """Common-neighbor link prediction (llm/web.py:
    jaccard_link_prediction; Liben-Nowell & Kleinberg 2003) over the
    part-affinity graph: for non-adjacent part pairs sharing >= 2
    affinity neighbours, the Jaccard score of their neighbour sets in
    basis points — "parts that should co-occur but don't yet".
    Candidates come from one wedge join at the shared neighbour
    (never |V|^2); integer bp scores replay exactly in SQL."""
    from cubes_spark.llm.web import jaccard_link_prediction
    from cubes_spark.operators.olap import basket_pairs

    li = _table(spark, sf_dir, "lineitem")
    edges = basket_pairs(li, "l_orderkey", "l_partkey",
                         min_count=2).select("item_a", "item_b")
    out = jaccard_link_prediction(edges, "item_a", "item_b",
                                  min_common=2)
    return _lng(out, "node_a", "node_b")


def q_dq_orders(spark, sf_dir):
    """Declarative data-quality suite (operators/dq.py: dq_check;
    dbt-expectations/Deequ family): seven rules over orders — null,
    range, accepted-values, regex, SQL expression, key uniqueness,
    referential integrity — with per-rule violation counts.  All
    row-level rules share ONE aggregation pass; unique adds one
    map-side-combinable groupBy, the FK one anti-join.  Rules are
    chosen to produce nonzero violations (range cap, missing
    accepted value, non-unique customer key) so the counting is
    exercised, not just the happy path."""
    from cubes_spark.operators.dq import dq_check

    orders = _table(spark, sf_dir, "orders")
    cust = _table(spark, sf_dir, "customer")
    rules = [
        {"check": "not_null", "column": "o_orderkey"},
        {"check": "in_range", "column": "o_totalprice",
         "min": 0, "max": 200000},
        {"check": "accepted_values", "column": "o_orderpriority",
         "values": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                    "4-NOT SPECIFIED"]},
        {"check": "matches", "column": "o_orderstatus",
         "pattern": "^[OF]$"},
        {"name": "big_ticket", "check": "expression",
         "expr": "o_totalprice >= 5000"},
        {"check": "unique", "columns": ["o_orderkey"]},
        {"name": "repeat_customers", "check": "unique",
         "columns": ["o_custkey"]},
        {"check": "foreign_key", "columns": ["o_custkey"],
         "ref": cust, "ref_columns": ["c_custkey"]},
    ]
    return dq_check(orders, rules)


def q_orders_ols(spark, sf_dir):
    """Per-priority least-squares daily trend (operators/olap.py:
    group_ols_trend): OLS from the five integer moment sums only —
    slope in micro-cents/day and r² in ppm, both truncating-div
    integers; one shuffle to the day grain, one algebraic
    aggregation, no window."""
    from cubes_spark.operators.olap import group_ols_trend

    od = _table(spark, sf_dir, "orders")
    return group_ols_trend(od, ["o_orderpriority"], "o_orderdate",
                           "o_totalprice", bucket="day")


def q_events_json_stats(spark, sf_dir):
    """Typed JSON field extraction + grouped exact stats
    (operators/olap.py:json_field_stats): from_json with a one-field
    schema parses props JVM-side; missing/malformed fields are
    counted as NULLs, never dropped rows."""
    from cubes_spark.operators.olap import json_field_stats

    ev = _table(spark, sf_dir, "events")
    return json_field_stats(ev, ["event_type"], "props", "k")


def q_orders_ks(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance between URGENT and LOW
    order totals (operators/stats.py:ks_two_sample): D maximized on
    the integer cross-product |ca*nb - cb*na|, cumulative counts from
    the two-phase value-bucketed prefix sum — no global sort; d_ppm
    is the one truncating div at the end."""
    from cubes_spark.operators.stats import ks_two_sample

    od = _table(spark, sf_dir, "orders")
    return ks_two_sample(od, "o_orderpriority", "o_totalprice",
                         "1-URGENT", "5-LOW")


def q_lineitem_spearman(spark, sf_dir):
    """Per-returnflag Spearman rank correlation of quantity vs price
    (operators/stats.py:spearman_rho): tie-corrected via doubled
    average ranks (integers), emitted as SIGNED rho^2 in exact ppm —
    the sqrt never happens; ranks from group-partitioned windows."""
    from cubes_spark.operators.stats import spearman_rho

    li = _table(spark, sf_dir, "lineitem")
    return spearman_rho(li, ["l_returnflag"], "l_quantity",
                        "l_extendedprice")


def q_events_chisq(spark, sf_dir):
    """Chi-square contingency of event type x hour-of-day
    (operators/stats.py:chi_square_independence): per-cell
    contribution (O*N - R*C)^2 div (R*C*N) in exact ppm, structural
    zeros included from the margin cross-product — the facts are
    scanned once."""
    from cubes_spark.operators.stats import chi_square_independence

    ev = _table(spark, sf_dir, "events")
    prepared = ev.select(F.col("event_type"),
                         F.hour("ts").alias("hour"))
    return chi_square_independence(prepared, "event_type", "hour")


def q_events_rolling_median(spark, sf_dir):
    """Exact 7-row rolling median of event values per user
    (operators/stats.py:rolling_median): sorted bounded ROWS frame,
    lower median at ceil(n/2) — state is O(7) per row regardless of
    history length; oracle replays list_sort(list() OVER w)[idx]."""
    from cubes_spark.operators.stats import rolling_median

    ev = _table(spark, sf_dir, "events")
    return rolling_median(ev, "user_id", "ts", "value", 7,
                          order_cols=["ts", "event_id"])


def q_orders_winsorize(spark, sf_dir):
    """Per-priority winsorized sum at exact P5/P95 order statistics
    (operators/stats.py:winsorized_stats): percentile_disc ranks in
    pure integer arithmetic (ceil via negated truncating div), clamp
    + re-sum in cents; group-partitioned rank windows only."""
    from cubes_spark.operators.stats import winsorized_stats

    od = _table(spark, sf_dir, "orders")
    return winsorized_stats(od, ["o_orderpriority"], "o_totalprice")


def q_orders_interarrival(spark, sf_dir):
    """Per-customer order inter-arrival gaps in exact microseconds
    (operators/stats.py:interarrival_stats): lag under per-key order,
    min/max/sum/truncated mean; customers with one order drop out."""
    from cubes_spark.operators.stats import interarrival_stats

    od = _table(spark, sf_dir, "orders")
    return interarrival_stats(od, "o_custkey", "o_orderdate")


def q_events_mode(spark, sf_dir):
    """Per-user modal event type with deterministic tiebreak
    (operators/stats.py:group_mode): highest count then smallest
    value via one min(struct(-cnt, v)) — two algebraic aggregations,
    no window."""
    from cubes_spark.operators.stats import group_mode

    ev = _table(spark, sf_dir, "events")
    return group_mode(ev, ["user_id"], "event_type")


def q_orders_emd(spark, sf_dir):
    """Two-sample Wasserstein-1 distance between URGENT and LOW
    order totals (operators/stats.py:emd_two_sample): W1*na*nb =
    sum over distinct values of |cuma*nb - cumb*na| * gap-to-next —
    all integers from the same bucketed prefix sum as KS (the
    cross-bucket successor is a broadcast lookup, never a global
    window); one truncating div to millicents at the end."""
    from cubes_spark.operators.stats import emd_two_sample

    od = _table(spark, sf_dir, "orders")
    return emd_two_sample(od, "o_orderpriority", "o_totalprice",
                          "1-URGENT", "5-LOW")


def q_doc_postings(spark, sf_dir):
    """Inverted-index build (llm/text.py:inverted_index): per term
    df/cf plus the top-10 'doc:tf' posting list in total (tf desc,
    doc asc) order, emitted as a string both engines aggregate
    identically; the per-term window runs on the vocabulary grain
    after a min_df prune, never on the corpus."""
    from cubes_spark.llm.text import inverted_index

    docs = _table(spark, sf_dir, "documents")
    return inverted_index(docs, "text", "doc_id", min_df=5,
                          postings_k=10)


def q_events_drawdown(spark, sf_dir):
    """Per-user maximum drawdown of the running net balance
    (operators/stats.py:max_drawdown; errors debit as in
    events_balance): running sum + running peak from two stacked
    windows over ONE per-key sort, worst (peak - cum) picked by an
    algebraic min(struct) — exact cents, no iteration."""
    from cubes_spark.operators.stats import max_drawdown

    ev = _table(spark, sf_dir, "events").withColumn(
        "__signed__",
        F.col("value")
        * F.when(F.col("event_type") == "error", -1).otherwise(1))
    return max_drawdown(ev, "user_id", "ts", "__signed__",
                        tiebreak_col="event_id")


def q_events_km(spark, sf_dir):
    """Kaplan-Meier survival of time-to-first-purchase per user
    (operators/stats.py:kaplan_meier): duration = days from first
    event to first purchase (death) or last event (censored); the
    product-limit estimate is the truncated-integer recurrence
    S <- (S*(n-d)) div n over the bounded DURATION grain, replayed
    exactly by the oracle's recursive CTE."""
    from cubes_spark.operators.stats import kaplan_meier

    ev = _table(spark, sf_dir, "events")
    per_user = (ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(F.when(F.col("event_type") == "purchase",
                     F.col("ts"))).alias("death_ts"),
        F.max("ts").alias("last_ts")))
    dur = per_user.select(
        F.datediff(F.to_date(F.coalesce("death_ts", "last_ts")),
                   F.to_date("first_ts")).alias("dur"),
        F.col("death_ts").isNotNull().cast("int").alias("ev"))
    return kaplan_meier(dur, "dur", "ev")


def q_doc_textrank(spark, sf_dir):
    """TextRank keywords (llm/text.py:textrank_keywords; Mihalcea &
    Tarau 2004): adjacent content-token pairs as undirected
    multi-edges, ranked by the same integer fixed-point PageRank as
    doc_pagerank (2 iterations unrolled in the oracle); global
    top-20 via TakeOrdered."""
    from cubes_spark.llm.text import textrank_keywords

    docs = _table(spark, sf_dir, "documents")
    return textrank_keywords(docs, "text", "doc_id", iterations=2,
                             top_k=20)


def q_orders_mwu(spark, sf_dir):
    """Mann-Whitney U / probability-of-superiority between URGENT
    and LOW order totals (operators/stats.py:mann_whitney_u):
    doubled tie-averaged ranks from the SAME bucketed cumulative
    frame as KS/EMD — no per-row rank ever materializes; AUC as one
    truncating div."""
    from cubes_spark.operators.stats import mann_whitney_u

    od = _table(spark, sf_dir, "orders")
    return mann_whitney_u(od, "o_orderpriority", "o_totalprice",
                          "1-URGENT", "5-LOW")


def q_doc_langid_eval(spark, sf_dir):
    """Per-class precision/recall/F1 of the stopword language-ID
    heuristic against the stored lang label (operators/stats.py:
    classifier_eval over llm/text.py:language_id): tp/support/
    predicted on the label-pair grain, F1 = 2tp div (support +
    predicted) in exact ppm — the training-pipeline eval harness."""
    from cubes_spark.llm.text import language_id
    from cubes_spark.operators.stats import classifier_eval

    docs = _table(spark, sf_dir, "documents")
    pred = language_id(docs, "text")
    return classifier_eval(pred, "lang", "lang_pred")


def q_doc_kappa(spark, sf_dir):
    """Cohen's kappa agreement between the stored lang label and the
    language-ID prediction (operators/stats.py:cohen_kappa):
    (A*N - sum R*C) / (N^2 - sum R*C) as an exact integer ratio in
    ppm — chance-corrected, label-grain arithmetic only."""
    from cubes_spark.llm.text import language_id
    from cubes_spark.operators.stats import cohen_kappa

    docs = _table(spark, sf_dir, "documents")
    pred = language_id(docs, "text")
    return cohen_kappa(pred, "lang", "lang_pred")


def q_doc_vocab_growth(spark, sf_dir):
    """Per-source vocabulary statistics (llm/text.py:vocab_growth;
    the Heaps-law lexical-richness signal): tokens, types, hapax
    count and type-token/hapax ratios in exact ppm — one shuffle to
    the (source, token) grain, one algebraic aggregation."""
    from cubes_spark.llm.text import vocab_growth

    docs = _table(spark, sf_dir, "documents")
    return vocab_growth(docs, "text", "source")


def q_doc_source_hhi(spark, sf_dir):
    """Herfindahl source concentration per language
    (llm/text.py:source_concentration): HHI = (10^6 * sum c^2) div
    N^2 exact ppm — the monopoly smell of a training mixture."""
    from cubes_spark.llm.text import source_concentration

    docs = _table(spark, sf_dir, "documents")
    return source_concentration(docs, "lang", "source")


def q_events_concurrency(spark, sf_dir):
    """Sweep-line peak concurrency of 30-minute activity intervals
    (operators/asof.py:peak_concurrency): +1/-1 deltas per distinct
    boundary, the global running sum distributed as a two-phase
    time-bucketed prefix sum (bounded driver collect, bucket-local
    windows), earliest-attaining boundary on ties."""
    from cubes_spark.operators.asof import peak_concurrency

    ev = _table(spark, sf_dir, "events")
    return peak_concurrency(ev, "ts", duration_seconds=1800)


def q_orders_skyline(spark, sf_dir):
    """2-D Pareto skyline of orders maximizing (total price, order
    recency) (operators/olap.py:skyline_2d; Borzsonyi et al. 2001):
    distinct-x grain + distributed suffix max over deterministic
    value buckets — a point survives iff its max-y strictly exceeds
    every higher-x max-y; never a global sort."""
    from cubes_spark.operators.olap import skyline_2d

    od = _table(spark, sf_dir, "orders")
    prep = od.select(
        F.col("o_totalprice"),
        F.datediff(F.to_date("o_orderdate"),
                   F.lit("1970-01-01").cast("date"))
        .cast("double").alias("recency_day"))
    return skyline_2d(prep, "o_totalprice", "recency_day")


def q_events_runs(spark, sf_dir):
    """Wald-Wolfowitz runs test per user (operators/stats.py:
    runs_test): above/below-own-median sign sequence under
    deterministic order, observed runs vs the 2ab/n + 1 randomness
    benchmark in exact ppm; ties at the median dropped."""
    from cubes_spark.operators.stats import runs_test

    ev = _table(spark, sf_dir, "events")
    return runs_test(ev, "user_id", "ts", "value",
                     tiebreak_col="event_id")


def q_orders_lastdigit(spark, sf_dir):
    """Last-digit uniformity audit of order totals in cents
    (operators/stats.py:chi_square_gof_uniform): chi-square
    goodness-of-fit vs uniform over 10 digits, per-digit truncated
    (10*O - N)^2 div (10*N) contributions, absent digits generated
    from a spine — the fraud-screen companion to orders_benford."""
    from cubes_spark.operators.stats import chi_square_gof_uniform

    od = _table(spark, sf_dir, "orders")
    prep = od.select(
        (F.round(F.col("o_totalprice") * 100).cast("long") % 10)
        .alias("digit"))
    return chi_square_gof_uniform(prep, "digit", 10)


def q_events_logrank(spark, sf_dir):
    """Two-group log-rank test (operators/stats.py:logrank_test) on
    time-to-first-purchase, segmented by even/odd user id: observed
    group-A deaths vs the hypergeometric expectation and variance as
    sums of per-time truncated-micro terms over the bounded duration
    grain — the 'do these survival curves differ' companion to
    events_km."""
    from cubes_spark.operators.stats import logrank_test

    ev = _table(spark, sf_dir, "events")
    per_user = (ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(F.when(F.col("event_type") == "purchase",
                     F.col("ts"))).alias("death_ts"),
        F.max("ts").alias("last_ts")))
    dur = per_user.select(
        F.datediff(F.to_date(F.coalesce("death_ts", "last_ts")),
                   F.to_date("first_ts")).alias("dur"),
        F.col("death_ts").isNotNull().cast("int").alias("ev"),
        F.when(F.col("user_id") % 2 == 0, "even")
        .otherwise("odd").alias("segment"))
    return logrank_test(dur, "dur", "ev", "segment", "even")


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary (operators/tpch.py): sargable date
    filter to the scan, one map-side-combinable aggregation, money
    in exact integer units (disc_price 1e-4 $, charge 1e-6 $) so the
    sums are bit-exact at any parallelism."""
    from cubes_spark.operators.tpch import q1_pricing_summary

    return q1_pricing_summary(_table(spark, sf_dir, "lineitem"))


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping priority (operators/tpch.py): broadcast
    segment-filtered customer, orders-lineitem shuffle on the order
    key, top-10 by exact integer revenue via TakeOrdered with a full
    deterministic tiebreak."""
    from cubes_spark.operators.tpch import q3_shipping_priority

    return q3_shipping_priority(_table(spark, sf_dir, "customer"),
                                _table(spark, sf_dir, "orders"),
                                _table(spark, sf_dir, "lineitem"))


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 local supplier volume (operators/tpch.py): bounded
    nation x region broadcast, customer/supplier joins AQE-decided
    (they scale with SF), local supply chains via the s_nationkey =
    c_nationkey join condition, nation-grain exact revenue."""
    from cubes_spark.operators.tpch import q5_local_supplier_volume

    return q5_local_supplier_volume(
        _table(spark, sf_dir, "customer"),
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "lineitem"),
        _table(spark, sf_dir, "supplier"),
        _table(spark, sf_dir, "nation"),
        _table(spark, sf_dir, "region"))


def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 volume shipping (operators/tpch.py): bidirectional
    nation-pair trade volume per ship year; the bounded nation lookup
    broadcasts, the scoped customer/supplier joins are AQE-decided;
    one fact shuffle + one 3-key aggregation."""
    from cubes_spark.operators.tpch import q7_volume_shipping

    return q7_volume_shipping(_table(spark, sf_dir, "customer"),
                              _table(spark, sf_dir, "orders"),
                              _table(spark, sf_dir, "lineitem"),
                              _table(spark, sf_dir, "supplier"),
                              _table(spark, sf_dir, "nation"))


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 returned items (operators/tpch.py): top-20
    customers by returned revenue in one quarter; bounded nation
    broadcast, AQE-decided customer join, deterministic TakeOrdered."""
    from cubes_spark.operators.tpch import q10_returned_items

    return q10_returned_items(_table(spark, sf_dir, "customer"),
                              _table(spark, sf_dir, "orders"),
                              _table(spark, sf_dir, "lineitem"),
                              _table(spark, sf_dir, "nation"))


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 large-volume customers (operators/tpch.py): the
    aggregate-then-semi-join pattern — qualifying order keys from
    one order-grain reduction, only survivors rejoin customer
    (AQE-decided)."""
    from cubes_spark.operators.tpch import q18_large_volume_customers

    return q18_large_volume_customers(
        _table(spark, sf_dir, "customer"),
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "lineitem"))


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 customer distribution (operators/tpch.py): LEFT
    OUTER join so zero-order customers appear, then two stacked
    aggregations (per-customer count -> histogram of counts)."""
    from cubes_spark.operators.tpch import q13_customer_distribution

    return q13_customer_distribution(_table(spark, sf_dir, "customer"),
                                     _table(spark, sf_dir, "orders"))


def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 global sales opportunity (operators/tpch.py):
    scalar-subquery average (exact cent div, computed once) +
    left_anti join for well-funded customers who never placed an
    URGENT order (every customer in the synthetic star has SOME
    order, so the anti-join is scoped to make the result
    non-vacuous)."""
    from cubes_spark.operators.tpch import q22_global_sales_opportunity

    od = _table(spark, sf_dir, "orders")
    return q22_global_sales_opportunity(
        _table(spark, sf_dir, "customer"),
        od.filter(F.col("o_orderpriority") == "1-URGENT"))


def q_doc_rrf(spark, sf_dir):
    """Reciprocal-rank fusion of BM25 and a document-length prior
    (llm/text.py:rrf_fuse; Cormack et al. 2009): each top-20 list
    contributes the exact integer 10^6 div (60 + rank); fusion runs
    on list-sized data only — the hybrid-retrieval combiner."""
    from pyspark.sql.window import Window as W

    from cubes_spark.llm import bm25_search
    from cubes_spark.llm.text import rrf_fuse

    docs = _table(spark, sf_dir, "documents")
    bm = bm25_search(docs, _BM25_TERMS, top_k=20) \
        .select("doc_id", "rank")
    top_len = (docs.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
               .limit(20))
    w = W.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    ln = top_len.withColumn("rank",
                            F.row_number().over(w).cast("long")) \
        .select("doc_id", "rank")
    return rrf_fuse([bm, ln], "doc_id", "rank", k=60, top_k=10)


def q_doc_score_auc(spark, sf_dir):
    """ROC-AUC of a ranking signal against binary labels
    (operators/stats.py:mann_whitney_u — AUC IS the tie-averaged
    Mann-Whitney probability of superiority): how well document
    length separates English from non-English docs, in exact ppm.
    The classifier-eval companion for continuous scores."""
    from cubes_spark.operators.stats import mann_whitney_u

    docs = _table(spark, sf_dir, "documents")
    prep = docs.select(
        F.when(F.col("lang") == "en", "pos").otherwise("neg")
        .alias("label"),
        F.col("n_chars").cast("double").alias("score"))
    return mann_whitney_u(prep, "label", "score", "pos", "neg")


def q_orders_theilsen(spark, sf_dir):
    """Theil-Sen robust trend per priority (operators/stats.py:
    theil_sen_slope): median of all pairwise monthly-bucket slopes
    in exact micro-cents/day — the quadratic is over the CALENDAR
    grain (84 months -> ~3.5k pairs/group at any fact count), the
    median an exact order statistic of quantized integer slopes."""
    from cubes_spark.operators.stats import theil_sen_slope

    od = _table(spark, sf_dir, "orders")
    return theil_sen_slope(od, ["o_orderpriority"], "o_orderdate",
                           "o_totalprice", bucket="month")


def q_events_cuped(spark, sf_dir):
    """CUPED-adjusted A/B effect (operators/stats.py:
    cuped_adjusted_diff; Deng et al. WSDM 2013): even/odd users as
    treatment/control, first-half-of-month value as the pre-period
    covariate, second half as the outcome; theta from pooled integer
    moment sums, every reported number a defined truncating-div
    chain both engines replay."""
    from cubes_spark.operators.stats import cuped_adjusted_diff

    ev = _table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    prep = ev.select(
        F.col("user_id"),
        F.when(F.col("user_id") % 2 == 0, "treat")
        .otherwise("control").alias("grp"),
        F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)
        .alias("pre_value"),
        F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)
        .alias("post_value"))
    return cuped_adjusted_diff(prep, "user_id", "grp", "treat",
                               "pre_value", "post_value")


def q_orders_mannkendall(spark, sf_dir):
    """Mann-Kendall monotone-trend test per priority
    (operators/stats.py:mann_kendall): S = sum of pairwise signs
    over monthly buckets (calendar-bounded pairs), tie-corrected
    Var(S) emitted as the exact 18x integer numerator."""
    from cubes_spark.operators.stats import mann_kendall

    od = _table(spark, sf_dir, "orders")
    return mann_kendall(od, ["o_orderpriority"], "o_orderdate",
                        "o_totalprice", bucket="month")


def q_events_stream_quantiles(spark, sf_dir):
    """Streaming windowed quantile histogram: per-day fixed-width
    bucket counts accumulate INCREMENTALLY over the watermarked
    stream (state = bucket counters per open window, independent of
    row count); after replay the batch side reads the quantiles off
    the merged counts with the identical integer walk as
    orders_quantiles (functions/sketches.py:
    quantiles_from_bucket_counts) — streaming == batch == oracle for
    a quantile sketch."""
    from cubes_spark.functions.sketches import (
        quantiles_from_bucket_counts,
    )
    from cubes_spark.streaming import read_parquet_stream, \
        replay_to_memory

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_parquet_stream(spark, f"{sf_dir}/events.parquet")
    buck = (stream.withWatermark("ts", "2 hours")
            .groupBy(F.window(F.col("ts"), "1 day").alias("__w__"),
                     F.expr("CAST(round(value * 100) AS BIGINT)"
                            " div 100").alias("bucket"))
            .count())
    res = replay_to_memory(buck, "q_events_stream_quantiles")
    hist = res.select(F.col("__w__.start").alias("window_start"),
                      "bucket",
                      F.col("count").cast("long").alias("__n__"))
    return quantiles_from_bucket_counts(
        hist, ["window_start"], [2500, 5000, 9900], 100)


def q_events_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per month (operators/olap.py:
    stickiness_ratio): (10^6 * sum of daily actives) div (days *
    monthly actives) — exact ppm engagement ratio from two
    distinct-reductions and one month-grain join."""
    from cubes_spark.operators.olap import stickiness_ratio

    ev = _table(spark, sf_dir, "events")
    return stickiness_ratio(ev, "user_id", "ts")


def q_orders_lorenz(spark, sf_dir):
    """Lorenz-curve decile points of customer spend (operators/
    olap.py:lorenz_curve): customers ranked ascending by exact cent
    totals on the WEIGHTED two-phase cumulative histogram — decile
    boundary ranks are percentile_disc ceils, shares exact ppm, and
    no global entity sort exists in the plan."""
    from cubes_spark.operators.olap import lorenz_curve

    od = _table(spark, sf_dir, "orders")
    return lorenz_curve(od, "o_custkey", "o_totalprice")


def q_doc_distinctive(spark, sf_dir):
    """Per-source distinctive vocabulary (llm/text.py:
    distinctive_terms): top-5 over-represented tokens by exact
    truncated chi-square contribution (O*N - R*C > 0 cells only,
    min_count-pruned) — the corpus-drift smell test."""
    from cubes_spark.llm.text import distinctive_terms

    docs = _table(spark, sf_dir, "documents")
    return distinctive_terms(docs, "text", "source", top_k=5,
                             min_count=10)


def q_doc_heaps(spark, sf_dir):
    """Vocabulary saturation curve (llm/text.py:heaps_curve):
    distinct types at nested deterministic hash-fraction samples —
    one (token -> min bucket) reduction + a 10-row cumulative sum;
    'is more data still buying vocabulary'."""
    from cubes_spark.llm.text import heaps_curve

    docs = _table(spark, sf_dir, "documents")
    return heaps_curve(docs, "text", "doc_id", fractions=10)


def q_doc_confusion(spark, sf_dir):
    """Language-ID confusion matrix: raw (truth, predicted) counts
    — the companion to doc_langid_eval's per-class metrics; one
    label-pair-grain aggregation."""
    from cubes_spark.llm.text import language_id

    docs = _table(spark, sf_dir, "documents")
    pred = language_id(docs, "text")
    return (pred.groupBy(F.col("lang").alias("truth"),
                         F.col("lang_pred").alias("predicted"))
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


def q_events_type_overlap(spark, sf_dir):
    """Exact pairwise audience overlap between event types:
    |users(a) AND users(b)|, union and Jaccard in exact ppm over the
    distinct (type, user) grain — the exact ground truth the KMV
    sketch entry (orders_kmv) estimates; |types|^2 pair join on the
    type-grain audience counts plus one intersection aggregation."""
    ev = _table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sizes = (tu.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n")))
    pairs = (tu.alias("a").join(
        tu.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") < F.col("b.event_type")))
        .groupBy(F.col("a.event_type").alias("type_a"),
                 F.col("b.event_type").alias("type_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both")))
    sa = sizes.select(F.col("event_type").alias("type_a"),
                      F.col("n").alias("__na__"))
    sb = sizes.select(F.col("event_type").alias("type_b"),
                      F.col("n").alias("__nb__"))
    return (pairs.join(F.broadcast(sa), "type_a")
            .join(F.broadcast(sb), "type_b")
            .select("type_a", "type_b",
                    F.col("__na__").cast("long").alias("n_a"),
                    F.col("__nb__").cast("long").alias("n_b"),
                    "n_both",
                    (F.col("__na__") + F.col("__nb__")
                     - F.col("n_both")).cast("long")
                    .alias("n_union"),
                    F.expr("CAST((1000000 * n_both) div"
                           " (__na__ + __nb__ - n_both) AS BIGINT)")
                    .alias("jaccard_ppm")))


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecast revenue (operators/tpch.py): pure filter +
    single aggregation — every predicate (date range, integer
    discount band, quantity cap) reaches the parquet scan; the
    float 'between 0.05-0.01' trap made exact via integer percent
    points."""
    from cubes_spark.operators.tpch import q6_forecast_revenue

    return q6_forecast_revenue(_table(spark, sf_dir, "lineitem"))


def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 market share (operators/tpch.py): target-nation
    supplier share of one part type in one region per order year —
    two conditional sums in ONE aggregation, share exact ppm;
    bounded part/nation sides broadcast, scaling joins AQE-decided."""
    from cubes_spark.operators.tpch import q8_market_share

    return q8_market_share(_table(spark, sf_dir, "customer"),
                           _table(spark, sf_dir, "orders"),
                           _table(spark, sf_dir, "lineitem"),
                           _table(spark, sf_dir, "supplier"),
                           _table(spark, sf_dir, "nation"),
                           _table(spark, sf_dir, "region"),
                           _table(spark, sf_dir, "part"))


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 promo effect (operators/tpch.py): promo vs total
    revenue for one ship month in the same aggregation, share as one
    truncating div to ppm; part broadcast into the filtered scan."""
    from cubes_spark.operators.tpch import q14_promo_effect

    return q14_promo_effect(_table(spark, sf_dir, "lineitem"),
                            _table(spark, sf_dir, "part"))


def q_events_mase(spark, sf_dir):
    """Seasonal-naive forecast skill per event type (operators/
    olap.py:forecast_mase): |y_t - y_(t-7)| vs |y_t - y_(t-1)| over
    the daily sum series, ratio in exact ppm — below 10^6 the weekly
    pattern beats a random walk; calendar-grain windows only."""
    from cubes_spark.operators.olap import forecast_mase

    ev = _table(spark, sf_dir, "events")
    return forecast_mase(ev, ["event_type"], "ts", "value",
                         bucket="day", season=7)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: snowflake drilldown (region x month) with a cell filter
    at sf0.001."""
    browser = _browser(spark, "/root/testdata/sf0.001")
    return browser.aggregation_dataframe(
        cell="date:1995",
        drilldown=["customer_geo:region", "date@ym:month"],
        aggregates=["price_sum", "quantity_sum", "fact_count"],
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # The driver correctness gate verifies the FIRST 50 entries in
    # iteration order, so coverage ROTATES across rounds.  ROUND-9
    # WINDOW: the 48 round-9 additions lead (never driver-checked),
    # then the stalest prior entries fill to 50 (rotation mechanized
    # by tools/rotate_window.py from CORRECTNESS_r0*.json).
    # tools/check_correctness.py sweeps ALL 262 entries locally every
    # round regardless (dtype-strict).
    return {
        # ---- DRIVER WINDOW (first 50; rotated by tools/rotate_window.py) ----
        "orders_ks": q_orders_ks,
        "orders_emd": q_orders_emd,
        "doc_postings": q_doc_postings,
        "events_drawdown": q_events_drawdown,
        "events_km": q_events_km,
        "doc_textrank": q_doc_textrank,
        "orders_mwu": q_orders_mwu,
        "doc_langid_eval": q_doc_langid_eval,
        "doc_kappa": q_doc_kappa,
        "doc_vocab_growth": q_doc_vocab_growth,
        "doc_source_hhi": q_doc_source_hhi,
        "events_concurrency": q_events_concurrency,
        "orders_skyline": q_orders_skyline,
        "events_runs": q_events_runs,
        "orders_lastdigit": q_orders_lastdigit,
        "events_logrank": q_events_logrank,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "tpch_q7": q_tpch_q7,
        "tpch_q10": q_tpch_q10,
        "tpch_q18": q_tpch_q18,
        "tpch_q13": q_tpch_q13,
        "tpch_q22": q_tpch_q22,
        "events_mase": q_events_mase,
        "doc_rrf": q_doc_rrf,
        "doc_score_auc": q_doc_score_auc,
        "orders_theilsen": q_orders_theilsen,
        "events_cuped": q_events_cuped,
        "orders_mannkendall": q_orders_mannkendall,
        "events_stream_quantiles": q_events_stream_quantiles,
        "events_stickiness": q_events_stickiness,
        "orders_lorenz": q_orders_lorenz,
        "doc_distinctive": q_doc_distinctive,
        "doc_heaps": q_doc_heaps,
        "doc_confusion": q_doc_confusion,
        "events_type_overlap": q_events_type_overlap,
        "tpch_q6": q_tpch_q6,
        "tpch_q8": q_tpch_q8,
        "tpch_q14": q_tpch_q14,
        "lineitem_spearman": q_lineitem_spearman,
        "events_chisq": q_events_chisq,
        "events_rolling_median": q_events_rolling_median,
        "orders_winsorize": q_orders_winsorize,
        "orders_interarrival": q_orders_interarrival,
        "events_mode": q_events_mode,
        "orders_ols": q_orders_ols,
        "events_json_stats": q_events_json_stats,
        "events_markov": q_events_markov,
        "lineitem_hilbert": q_lineitem_hilbert,
        "doc_hits": q_doc_hits,
        "events_balance": q_events_balance,
        "events_holt": q_events_holt,
        "events_bitmap": q_events_bitmap,
        "doc_rake": q_doc_rake,
        "events_semiadd": q_events_semiadd,
        "events_acf": q_events_acf,
        "doc_freq_tokens": q_doc_freq_tokens,
        "events_burstiness": q_events_burstiness,
        "orders_benford": q_orders_benford,
        "part_ra": q_part_ra,
        "orders_streaks": q_orders_streaks,
        "orders_mad": q_orders_mad,
        "events_attribution": q_events_attribution,
        "calc_ewma": q_calc_ewma,
        "rfm_customers": q_rfm_customers,
        "events_seqmatch": q_events_seqmatch,
        "orders_gini": q_orders_gini,
        "part_kcore": q_part_kcore,
        "doc_pmi": q_doc_pmi,
        "events_cusum": q_events_cusum,
        "lineitem_iqr": q_lineitem_iqr,
        "events_winfunnel": q_events_winfunnel,
        "doc_diversity": q_doc_diversity,
        "source_overlap": q_source_overlap,
        "doc_readability": q_doc_readability,
        "orders_abc": q_orders_abc,
        "events_seasonality": q_events_seasonality,
        "slicer_http_agg": q_slicer_http_agg,
        "lineitem_hll": q_lineitem_hll,
        "basket_pairs": q_basket_pairs,
        "multiformat_store": q_multiformat_store,
        "doc_cdc_dedup": q_doc_cdc_dedup,
        "orders_quantiles": q_orders_quantiles,
        "part_triangles": q_part_triangles,
        "events_stream_hll": q_events_stream_hll,
        "orders_kmv": q_orders_kmv,
        "orders_psample": q_orders_psample,
        "lineitem_zorder": q_lineitem_zorder,
        "cuboid_greedy": q_cuboid_greedy,
        "part_links": q_part_links,
        "dq_orders": q_dq_orders,
        # -- stalest last-driver-green entries, ascending --
        "facts_page": q_facts_page,
        "fact_list": q_fact_list,
        "calc_wma": q_calc_wma,
        "calc_sms": q_calc_sms,
        "calc_smstd": q_calc_smstd,
        "calc_smvar": q_calc_smvar,
        "calc_smrsd": q_calc_smrsd,
        "rollup_ym": q_rollup_ym,
        "cube_flags": q_cube_flags,
        "grouping_sets": q_grouping_sets,
        "doc_common_ngrams": q_doc_common_ngrams,
        "doc_quality_filter": q_doc_quality_filter,
        "doc_text_stats": q_doc_text_stats,
        "doc_bpe_tokens": q_doc_bpe_tokens,
        "doc_langid": q_doc_langid,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_exact_dup": q_doc_exact_dup,
        "doc_jaccard": q_doc_jaccard,
        "emb_topk": q_emb_topk,
        "emb_near_dup": q_emb_near_dup,
        "emb_ivf": q_emb_ivf,
        "agg_summary": q_agg_summary,
        "agg_registry_stats": q_agg_registry_stats,
        "cell_count_total": q_cell_count_total,
        "fact_by_key": q_fact_by_key,
        "join_master_brand": q_join_master_brand,
        "join_detail_brand": q_join_detail_brand,
        "join_compound_dqty": q_join_compound_dqty,
        "agg_null_filter": q_agg_null_filter,
        "calc_order_norm": q_calc_order_norm,
        "members_locale": q_members_locale,
        "schema_inspect": q_schema_inspect,
        "denorm_sink": q_denorm_sink,
        "cuboid_enum": q_cuboid_enum,
        "emb_ann_recall": q_emb_ann_recall,
        "emb_ivf_recall": q_emb_ivf_recall,
        "emb_neardup_recall": q_emb_neardup_recall,
        "emb_projection": q_emb_projection,
        "report_combo": q_report_combo,
        "cell_details": q_cell_details,
        "agg_natural_order": q_agg_natural_order,
        "csv_format": q_csv_format,
        # ---- beyond the window (driver-green more recently; full local sweep covers all) ----
        "auth_restricted": q_auth_restricted,
        "json_lines_format": q_json_lines_format,
        "events_browse": q_events_browse,
        "agg_quantiles": q_agg_quantiles,
        "agg_approx_distinct": q_agg_approx_distinct,
        "doc_repetition": q_doc_repetition,
        "doc_pii": q_doc_pii,
        "salted_join": q_salted_join,
        "namespace_agg": q_namespace_agg,
        "agg_count_nonempty": q_agg_count_nonempty,
        "doc_audio_decode": q_doc_audio_decode,
        "preagg_refresh": q_preagg_refresh,
        "events_hourly": q_events_hourly,
        "events_sliding": q_events_sliding,
        "events_type_stats": q_events_type_stats,
        "events_stream_hourly": q_events_stream_hourly,
        "doc_minhash": q_doc_minhash,
        "doc_simhash": q_doc_simhash,
        "events_sessions_native": q_events_sessions_native,
        "doc_dup_clusters": q_doc_dup_clusters,
        "doc_gif_decode": q_doc_gif_decode,
        "doc_bmp_decode": q_doc_bmp_decode,
        "doc_pixel_decode": q_doc_pixel_decode,
        "xlsx_roundtrip": q_xlsx_roundtrip,
        "events_stream_dedup": q_events_stream_dedup,
        "events_sessions": q_events_sessions,
        "doc_winnow": q_doc_winnow,
        "doc_multimodal": q_doc_multimodal,
        "doc_chunks": q_doc_chunks,
        "doc_split": q_doc_split,
        "doc_warc_extract": q_doc_warc_extract,
        "doc_html_text": q_doc_html_text,
        "doc_substring_dup": q_doc_substring_dup,
        "doc_span_docs": q_doc_span_docs,
        "doc_decontam": q_doc_decontam,
        "doc_pack": q_doc_pack,
        "doc_tar_shards": q_doc_tar_shards,
        "doc_bmp_rle": q_doc_bmp_rle,
        "doc_adpcm_decode": q_doc_adpcm_decode,
        "doc_jpeg_progressive": q_doc_jpeg_progressive,
        "doc_quality_cube": q_doc_quality_cube,
        "doc_bpe_encode": q_doc_bpe_encode,
        "doc_bpe_vocab": q_doc_bpe_vocab,
        "doc_image_dedup": q_doc_image_dedup,
        "doc_audio_dedup": q_doc_audio_dedup,
        "doc_warc_pipeline": q_doc_warc_pipeline,
        "events_sessions_batch": q_events_sessions_batch,
        "events_funnel": q_events_funnel,
        "events_cohorts": q_events_cohorts,
        "doc_pagerank": q_doc_pagerank,
        "doc_normalize": q_doc_normalize,
        "docs_stream_quality": q_docs_stream_quality,
        "doc_webdataset_export": q_doc_webdataset_export,
        "doc_mixture": q_doc_mixture,
        "doc_incremental_dedup": q_doc_incremental_dedup,
        "doc_inflate": q_doc_inflate,
        "doc_jsonl": q_doc_jsonl,
        "doc_sample": q_doc_sample,
        "doc_stratified": q_doc_stratified,
        "emb_kmeans": q_emb_kmeans,
        "emb_semdedup": q_emb_semdedup,
        "doc_jpeg_roundtrip": q_doc_jpeg_roundtrip,
        "doc_video_frames": q_doc_video_frames,
        "doc_mkv_meta": q_doc_mkv_meta,
        "doc_image_resize": q_doc_image_resize,
        "doc_audio_resample": q_doc_audio_resample,
        "doc_g711_decode": q_doc_g711_decode,
        "doc_video_pipeline": q_doc_video_pipeline,
        "doc_pipeline": q_doc_pipeline,
        "doc_trigram_lm": q_doc_trigram_lm,
        "doc_lang_quality": q_doc_lang_quality,
        "agg_expression_case": q_agg_expression_case,
        "agg_year": q_agg_year,
        "agg_point_cut": q_agg_point_cut,
        "members": q_members,
        "crosstab": q_crosstab,
        "preagg_year": q_preagg_year,
        "calc_sma": q_calc_sma,
        "doc_line_dedup": q_doc_line_dedup,
        "doc_shuffle_shards": q_doc_shuffle_shards,
        "doc_domain_cap": q_doc_domain_cap,
        "emb_semdedup_greedy": q_emb_semdedup_greedy,
        "doc_tfidf": q_doc_tfidf,
        "doc_embed": q_doc_embed,
        "doc_quality_model": q_doc_quality_model,
        "bucketed_join": q_bucketed_join,
        "events_asof": q_events_asof,
        "events_stream_join": q_events_stream_join,
        "doc_dsir": q_doc_dsir,
        "drill_across_flag": q_drill_across,
        "doc_bm25": q_doc_bm25,
        "doc_dsir_sample": q_doc_dsir_sample,
        "emb_pq": q_emb_pq,
        "emb_pq_recall": q_emb_pq_recall,
        "topk_per_region": q_topk_per_region,
        "events_gap_fill": q_events_gap_fill,
        "compact_roundtrip": q_compact_roundtrip,
        "fuzzy_names": q_fuzzy_names,
        "events_countmin": q_events_countmin,
        "events_bloom": q_events_bloom,
        "events_stream_hh": q_events_stream_hh,
        "parent_child": q_parent_child,
        "sql_view": q_sql_view,
        "events_scd2": q_events_scd2,
        "calc_rsum": q_calc_rsum,
        "calc_ptot": q_calc_ptot,
        "calc_pctchange": q_calc_pctchange,
        "events_paths": q_events_paths,
        "profile_orders": q_profile_orders,
        "events_anomaly": q_events_anomaly,
        "doc_communities": q_doc_communities,
        "events_twap": q_events_twap,
        "doc_ssjoin": q_doc_ssjoin,
        "agg_snowflake": q_agg_snowflake,
        "agg_roleplay": q_agg_roleplay,
        "emb_ann": q_emb_ann,
        "agg_set_cut": q_agg_set_cut,
        "agg_invert_cut": q_agg_invert_cut,
        "agg_range_cut": q_agg_range_cut,
        "agg_half_open_range": q_agg_half_open_range,
        "agg_expression": q_agg_expression,
        "agg_expression_fns": q_agg_expression_fns,
        "agg_order_page": q_agg_order_page,
        "agg_minmax": q_agg_minmax,
        "agg_avg_var": q_agg_avg_var,
        "agg_split": q_agg_split,
        "agg_relative_time": q_agg_relative_time,
        "topk_customers": q_topk_customers,
    }


# -- oracle SQL -------------------------------------------------------------

_DEC_QTY = "CAST(l_quantity AS DECIMAL(20,2))"
_DEC_PRICE = "CAST(l_extendedprice AS DECIMAL(20,2))"
_DEC_DISC = "CAST(l_discount AS DECIMAL(6,2))"
_DEC_TAX = "CAST(l_tax AS DECIMAL(6,2))"

#: md5-derived 60-bit portable hash (see cubes_spark.llm.text.hash64)
_H64 = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

#: normalized text + whitespace tokens, DuckDB side
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_TOKENS = ("CASE WHEN trim(text) = '' THEN [] "
           "ELSE string_split_regex(trim(text), '\\s+') END")

_STOP_EN = "'the','and','of','to','in','is','that','it','was','for'"
_STOP_DE = "'der','die','das','und','ist','von','mit','den','nicht','ein'"
_STOP_FR = "'le','la','les','et','de','un','une','est','que','pour'"
_STOP_ES = "'el','la','los','las','de','que','y','en','un','es'"

#: SQL-side punctuation class: same as cubes_spark.llm.text.PUNCT_CLASS
#: with the apostrophe doubled for the single-quoted SQL literal.
_PUNCT_RE = r"[.,;:!?''\"()\[\]{}<>/@#$%^&*_+=~`|\\-]"


def _text_stats_sql() -> str:
    """Shared per-document stats CTE body (mirrors llm.text.text_stats)."""
    return f"""
    SELECT doc_id, lang, source, text,
        length(text) AS n_chars_c,
        len({_TOKENS}) AS n_tokens,
        length(regexp_replace(text, '\\s', '', 'g')) AS n_nospace,
        length(text) - length(regexp_replace(text, '{_PUNCT_RE}', '', 'g'))
            AS n_punct,
        length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
            AS n_digit,
        length(text) - length(regexp_replace(text, '\\s', '', 'g'))
            AS n_space_inv,
        list_sum(list_transform({_TOKENS},
            t -> CASE WHEN lower(t) IN ({_STOP_EN}) THEN 1 ELSE 0 END))
            AS n_stop
    FROM documents
    """


_TEXT_STATS_DERIVED = """
    SELECT doc_id, n_chars_c, n_tokens,
        round(CASE WHEN n_tokens > 0
              THEN CAST(n_nospace AS DOUBLE)/n_tokens ELSE 0 END, 4)
            AS avg_token_len,
        round(CASE WHEN n_chars_c > 0
              THEN CAST(n_punct AS DOUBLE)/n_chars_c ELSE 0 END, 4)
            AS punct_ratio,
        round(CASE WHEN n_chars_c > 0
              THEN CAST(n_digit AS DOUBLE)/n_chars_c ELSE 0 END, 4)
            AS digit_ratio,
        round(CASE WHEN n_chars_c > 0
              THEN CAST(n_chars_c - n_nospace AS DOUBLE)/n_chars_c
              ELSE 0 END, 4) AS space_ratio,
        round(CASE WHEN n_tokens > 0
              THEN CAST(COALESCE(n_stop,0) AS DOUBLE)/n_tokens
              ELSE 0 END, 4) AS stopword_ratio_en,
        round(CASE WHEN n_tokens = 0 THEN 0.0 ELSE
            least(CAST(n_tokens AS DOUBLE)/100.0, 1.0) * 0.3
          + least((CASE WHEN n_tokens > 0
                   THEN CAST(COALESCE(n_stop,0) AS DOUBLE)/n_tokens
                   ELSE 0 END) * 5.0, 1.0) * 0.4
          + (1.0 - least((CASE WHEN n_chars_c > 0
                          THEN CAST(n_punct AS DOUBLE)/n_chars_c
                          ELSE 0 END) * 4.0, 1.0)) * 0.2
          + (1.0 - least((CASE WHEN n_chars_c > 0
                          THEN CAST(n_digit AS DOUBLE)/n_chars_c
                          ELSE 0 END) * 4.0, 1.0)) * 0.1 END, 4)
            AS quality_score
    FROM base
"""


def _minhash_cte() -> str:
    """Signatures + banded candidate pairs, mirroring llm.dedup:
    one 32-bit md5-derived hash per shingle, then universal-hash mixing
    ``(a_i * h + b_i) mod P`` per signature component."""
    from cubes_spark.llm.dedup import MINHASH_P, minhash_params

    norm = _NORM
    a, b = minhash_params(16)
    h32 = "CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT)"
    components = ", ".join(
        f"list_min(list_transform(hs, h -> ({a[i]} * h + {b[i]}) "
        f"% {MINHASH_P}))"
        for i in range(16)
    )
    return f"""
    WITH sh AS (
        SELECT doc_id,
            list_distinct(list_transform(
                generate_series(1, greatest(length({norm}) - 4, 1)),
                i -> substr({norm}, i, 5))) AS shingles
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
            list_transform(shingles, s -> {h32} % {MINHASH_P}) AS hs
        FROM sh
    ),
    sig AS (
        SELECT doc_id, [{components}] AS sig
        FROM hashed
    ),
    banded AS (
        SELECT doc_id, sig, b.band_id,
            md5(concat(CAST(b.band_id AS VARCHAR), ',',
                array_to_string(sig[b.band_id*4 + 1 : b.band_id*4 + 4],
                                ','))) AS band_hash
        FROM sig, (SELECT unnest(generate_series(0, 3)) AS band_id) b
    ),
    pairs AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
            l.sig AS sig_a, r.sig AS sig_b
        FROM banded l JOIN banded r
            ON l.band_id = r.band_id AND l.band_hash = r.band_hash
            AND l.doc_id < r.doc_id
    )
    """


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["agg_year"] = f"""
        SELECT CAST(year(l_shipdate) AS BIGINT) AS "date.year",
            CAST(SUM({_DEC_QTY}) AS DOUBLE) AS quantity_sum,
            CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS price_sum,
            COUNT(*) AS fact_count
        FROM lineitem GROUP BY 1"""

    sql["slicer_http_agg"] = f"""
        SELECT CAST(year(l_shipdate) AS BIGINT) AS "date.year",
            CAST(SUM({_DEC_QTY}) AS DOUBLE) AS quantity_sum,
            CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS price_sum,
            COUNT(*) AS fact_count
        FROM lineitem GROUP BY 1"""

    sql["doc_cdc_dedup"] = """
        WITH docs AS MATERIALIZED (
            SELECT doc_id, text, length(text) AS L FROM documents
        ),
        pos AS (
            SELECT doc_id, text,
                unnest(CASE WHEN L >= 8 THEN range(8, L + 1)
                       ELSE [] END) AS p
            FROM docs
        ),
        bnd AS (
            SELECT doc_id, p FROM pos
            WHERE CAST(concat('0x', substr(md5(concat('cdc:',
                substr(text, p - 7, 8))), 1, 15)) AS BIGINT) % 32 = 0
        ),
        bounds AS MATERIALIZED (
            SELECT d.doc_id, d.text,
                list_sort(list_distinct([0]
                    || COALESCE(list(b.p)
                        FILTER (WHERE b.p IS NOT NULL), [])
                    || [d.L])) AS bs
            FROM docs d LEFT JOIN bnd b ON d.doc_id = b.doc_id
            GROUP BY d.doc_id, d.text, d.L
        ),
        idx AS (
            SELECT doc_id, text, bs,
                unnest(generate_series(1, len(bs) - 1)) AS i
            FROM bounds
        ),
        chunks AS MATERIALIZED (
            SELECT doc_id,
                CAST(concat('0x', substr(md5(concat('cdch:',
                    substr(text, bs[i] + 1, bs[i + 1] - bs[i]))),
                    1, 15)) AS BIGINT) AS chunk_hash
            FROM idx
        ),
        counts AS (
            SELECT chunk_hash, count(DISTINCT doc_id) AS nd
            FROM chunks GROUP BY 1
        )
        SELECT c.doc_id,
            CAST(count(*) AS BIGINT) AS n_chunks,
            CAST(SUM(CASE WHEN k.nd > 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_dup_chunks,
            (10000 * CAST(SUM(CASE WHEN k.nd > 1 THEN 1 ELSE 0 END)
                          AS BIGINT))
                // CAST(count(*) AS BIGINT) AS dup_chunk_bp
        FROM chunks c JOIN counts k USING (chunk_hash)
        GROUP BY 1"""

    sql["orders_quantiles"] = """
        WITH vals AS (
            SELECT o_orderpriority AS pri,
                CAST(round(o_totalprice * 100) AS BIGINT) // 100000 AS bucket
            FROM orders
        ),
        hist AS MATERIALIZED (
            SELECT pri, bucket, CAST(count(*) AS BIGINT) AS n
            FROM vals GROUP BY 1, 2
        ),
        cum AS (
            SELECT pri, bucket, n,
                CAST(SUM(n) OVER (PARTITION BY pri ORDER BY bucket)
                     AS BIGINT) AS cum_count
            FROM hist
        ),
        tot AS (SELECT pri, CAST(SUM(n) AS BIGINT) AS total
                FROM hist GROUP BY 1),
        qs AS (SELECT unnest([2500, 5000, 9000, 9900]) AS q_bp),
        hit AS (
            SELECT c.pri, q.q_bp, c.bucket, c.cum_count, t.total
            FROM cum c JOIN tot t ON c.pri = t.pri CROSS JOIN qs q
            WHERE c.cum_count * 10000 >= q.q_bp * t.total
        )
        SELECT pri AS o_orderpriority,
            CAST(q_bp AS BIGINT) AS q_bp,
            CAST(min(bucket) AS BIGINT) AS bucket,
            CAST(min(bucket) * 100000 AS BIGINT) AS est_lo,
            CAST((min(bucket) + 1) * 100000 - 1 AS BIGINT) AS est_hi,
            CAST(min_by(cum_count, bucket) AS BIGINT) AS cum_count,
            CAST(min(total) AS BIGINT) AS total
        FROM hit GROUP BY 1, 2"""

    sql["part_triangles"] = """
        WITH baskets AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS b, l_partkey AS i
            FROM lineitem
        ),
        edges AS MATERIALIZED (
            SELECT l.i AS a, r.i AS b
            FROM baskets l JOIN baskets r ON l.b = r.b AND l.i < r.i
            GROUP BY 1, 2 HAVING count(*) >= 2
        ),
        tris AS MATERIALIZED (
            SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
            FROM edges e1
            JOIN edges e2 ON e2.a = e1.b
            JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        nodes AS (
            SELECT n1 AS node FROM tris
            UNION ALL SELECT n2 FROM tris
            UNION ALL SELECT n3 FROM tris
        )
        SELECT CAST(node AS BIGINT) AS node,
            CAST(count(*) AS BIGINT) AS n_triangles
        FROM nodes GROUP BY 1"""

    # seasonality: integer cross-multiplied slot-vs-overall mean.
    sql["events_seasonality"] = """
        WITH b AS (
            SELECT event_type,
                CAST(hour(ts) AS BIGINT) AS slot,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(round(value * 100) AS BIGINT))
                     AS BIGINT) AS sum_cents
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, slot, n_rows, sum_cents,
            CAST((1000000 * CAST(sum_cents AS HUGEINT)
                  * sum(n_rows) OVER g)
                 // (CAST(sum(sum_cents) OVER g AS HUGEINT) * n_rows)
                 AS BIGINT) AS index_ppm
        FROM b
        WINDOW g AS (PARTITION BY event_type)"""

    # ABC: share_from_top(v) = S - wcum(v) + v*c(v) at the value
    # grain (ties share a class), HUGEINT arithmetic.
    sql["orders_abc"] = """
        WITH m AS MATERIALIZED (
            SELECT o_custkey,
                sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
            FROM orders GROUP BY 1
        ),
        h AS (SELECT x AS v, count(*) AS c FROM m GROUP BY 1),
        ch AS (
            SELECT v, c,
                sum(CAST(v AS HUGEINT) * c) OVER (ORDER BY v) AS wcum
            FROM h
        ),
        tot AS (SELECT max(wcum) AS s FROM ch),
        shares AS (
            SELECT v,
                CAST((10000 * (tot.s - wcum + CAST(v AS HUGEINT) * c))
                     // tot.s AS BIGINT) AS share_from_top_bp
            FROM ch, tot
        )
        SELECT m.o_custkey, CAST(m.x AS BIGINT) AS total_cents,
            sh.share_from_top_bp,
            CASE WHEN sh.share_from_top_bp <= 8000 THEN 'A'
                 WHEN sh.share_from_top_bp <= 9500 THEN 'B'
                 ELSE 'C' END AS abc_class
        FROM m JOIN shares sh ON m.x = sh.v"""

    # readability: same regex counts; // floors == div truncation for
    # the all-positive operands.
    sql["doc_readability"] = r"""
        WITH base AS (
            SELECT doc_id,
                CASE WHEN trim(text) = '' THEN []
                    ELSE string_split_regex(trim(text), '\s+') END AS t,
                greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                    AS n_sentences
            FROM documents
        ),
        agg AS (
            SELECT doc_id,
                CAST(len(t) AS BIGINT) AS n_words,
                CAST(n_sentences AS BIGINT) AS n_sentences,
                CAST(list_sum(list_transform(t, w ->
                    greatest(len(regexp_extract_all(w,
                        '[aeiouyAEIOUY]+')), 1))) AS BIGINT)
                    AS n_syllables
            FROM base WHERE len(t) > 0
        )
        SELECT doc_id, n_words, n_sentences, n_syllables,
            CAST(206835 - (1015 * n_words) // n_sentences
                 - (84600 * n_syllables) // n_words AS BIGINT)
                AS score_milli
        FROM agg"""

    # Gini–Simpson diversity: all-integer (n² − Σc²)/n² in HUGEINT.
    sql["doc_diversity"] = r"""
        WITH toks AS (
            SELECT doc_id, unnest(
                CASE WHEN trim(text) = '' THEN []
                ELSE string_split_regex(trim(text), '\s+') END) AS w
            FROM documents
        ),
        per AS (
            SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2
        ),
        agg AS (
            SELECT doc_id,
                CAST(sum(c) AS BIGINT) AS n_tokens,
                CAST(count(*) AS BIGINT) AS n_distinct,
                sum(CAST(c AS HUGEINT) * c) AS s2
            FROM per GROUP BY 1
        )
        SELECT doc_id, n_tokens, n_distinct,
            CAST((1000000 * (CAST(n_tokens AS HUGEINT) * n_tokens
                             - s2))
                 // (CAST(n_tokens AS HUGEINT) * n_tokens)
                 AS BIGINT) AS diversity_ppm
        FROM agg"""

    # source overlap: distinct (source, 5-shingle) grain, pairwise
    # intersection by shingle equi-join, union via inclusion-exclusion.
    sql["source_overlap"] = f"""
        WITH sh AS MATERIALIZED (
            SELECT DISTINCT source AS g, s FROM (
                SELECT source, unnest(list_distinct(list_transform(
                    generate_series(1,
                        greatest(length({_NORM}) - 4, 1)),
                    i -> substr({_NORM}, i, 5)))) AS s
                FROM documents)
        ),
        sizes AS (SELECT g, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
            SELECT a.g AS ga, b.g AS gb, count(*) AS n_common
            FROM sh a JOIN sh b ON a.s = b.s AND a.g < b.g
            GROUP BY 1, 2
        )
        SELECT ga AS source_a, gb AS source_b,
            CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
            CAST(n_common AS BIGINT) AS n_common,
            CAST((10000 * n_common) // (sa.n + sb.n - n_common)
                 AS BIGINT) AS jaccard_bp
        FROM inter
        JOIN sizes sa ON ga = sa.g
        JOIN sizes sb ON gb = sb.g"""

    # IQR: rank-based quartiles per group, fences in doubled cents.
    sql["lineitem_iqr"] = """
        WITH base AS MATERIALIZED (
            SELECT l_returnflag AS g,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS v
            FROM lineitem
        ),
        ranked AS (
            SELECT g, v,
                row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
                count(*) OVER (PARTITION BY g) AS n
            FROM base
        ),
        q AS (
            SELECT g, CAST(max(n) AS BIGINT) AS n_rows,
                min(CASE WHEN rn >= (n + 3) // 4 THEN v END)
                    AS q1_cents,
                min(CASE WHEN rn >= (3 * n + 3) // 4 THEN v END)
                    AS q3_cents
            FROM ranked GROUP BY g
        )
        SELECT q.g AS l_returnflag, q.n_rows, q.q1_cents, q.q3_cents,
            CAST(sum(CASE WHEN
                2 * b.v < 2 * q.q1_cents - 3 * (q.q3_cents - q.q1_cents)
                OR 2 * b.v > 2 * q.q3_cents + 3 * (q.q3_cents - q.q1_cents)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM base b JOIN q ON b.g = q.g
        GROUP BY 1, 2, 3, 4"""

    # windowFunnel, earliest-chain: first step-1 time, first LATER
    # step-2 time, ...; every link's window measured from t1.
    sql["events_winfunnel"] = """
        WITH ev AS MATERIALIZED (
            SELECT user_id AS k, ts AS t,
                CASE event_type WHEN 'signup' THEN 0
                    WHEN 'view' THEN 1 WHEN 'purchase' THEN 2 END AS s
            FROM events
            WHERE event_type IN ('signup', 'view', 'purchase')
        ),
        s0 AS (SELECT k, min(t) AS t0 FROM ev WHERE s = 0 GROUP BY k),
        s1 AS (
            SELECT e.k, min(e.t) AS tv FROM ev e
            JOIN s0 ON e.k = s0.k
            WHERE e.s = 1 AND e.t > s0.t0 GROUP BY e.k
        ),
        s2 AS (
            SELECT e.k, min(e.t) AS tp FROM ev e
            JOIN s1 ON e.k = s1.k
            WHERE e.s = 2 AND e.t > s1.tv GROUP BY e.k
        )
        SELECT s0.k AS user_id, s0.t0 AS t1,
            CAST(CASE WHEN s1.tv IS NOT NULL AND
                    date_diff('microsecond', s0.t0, s1.tv)
                        <= 86400000000
                 THEN CASE WHEN s2.tp IS NOT NULL AND
                         date_diff('microsecond', s0.t0, s2.tp)
                             <= 86400000000
                      THEN 3 ELSE 2 END
                 ELSE 1 END AS BIGINT) AS steps_reached
        FROM s0
        LEFT JOIN s1 ON s0.k = s1.k
        LEFT JOIN s2 ON s0.k = s2.k"""

    # CUSUM: scaled integer statistic s_i = n*P_i - i*T in HUGEINT;
    # argmax |s| with earliest-bucket tiebreak.
    sql["events_cusum"] = """
        WITH b AS MATERIALIZED (
            SELECT event_type, date_trunc('hour', ts) AS bt,
                sum(CAST(round(value * 100) AS BIGINT)) AS x
            FROM events GROUP BY 1, 2
        ),
        s AS (
            SELECT event_type, bt,
                CAST(count(*) OVER g AS HUGEINT)
                    * CAST(sum(x) OVER o AS HUGEINT)
                - CAST(row_number() OVER (PARTITION BY event_type
                                          ORDER BY bt) AS HUGEINT)
                    * CAST(sum(x) OVER g AS HUGEINT) AS s,
                count(*) OVER g AS n
            FROM b
            WINDOW o AS (PARTITION BY event_type ORDER BY bt
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW),
                   g AS (PARTITION BY event_type)
        )
        SELECT event_type, bt AS cp_ts,
            CAST(s AS BIGINT) AS cp_stat,
            CAST(n AS BIGINT) AS n_buckets
        FROM (
            SELECT *, row_number() OVER (PARTITION BY event_type
                ORDER BY abs(s) DESC, bt) AS rn
            FROM s
        ) WHERE rn = 1"""

    # PMI collocations: same whitespace tokenizer as token_array,
    # bigrams via 1-based list indexing, HUGEINT lift replay.
    sql["doc_pmi"] = r"""
        WITH toks AS MATERIALIZED (
            SELECT CASE WHEN trim(text) = '' THEN []
                   ELSE string_split_regex(trim(text), '\s+') END AS t
            FROM documents
        ),
        uni AS MATERIALIZED (
            SELECT u AS w, count(*) AS c
            FROM (SELECT unnest(t) AS u FROM toks) GROUP BY 1
        ),
        n AS (SELECT CAST(sum(c) AS HUGEINT) AS nn FROM uni),
        big AS (
            SELECT t[i] AS wa, t[i + 1] AS wb
            FROM (SELECT t, unnest(generate_series(1, len(t) - 1))
                      AS i
                  FROM toks WHERE len(t) >= 2)
        ),
        pairs AS (
            SELECT wa, wb, count(*) AS p FROM big
            GROUP BY 1, 2 HAVING count(*) >= 5
        )
        SELECT p.wa AS word_a, p.wb AS word_b,
            CAST(p.p AS BIGINT) AS n_pair,
            CAST(a.c AS BIGINT) AS n_a,
            CAST(b.c AS BIGINT) AS n_b,
            CAST((1000000 * CAST(p.p AS HUGEINT) * n.nn)
                 // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT)
                AS lift_ppm
        FROM pairs p
        JOIN uni a ON p.wa = a.w
        JOIN uni b ON p.wb = b.w, n"""

    # k-core: unroll the 3 synchronous peel rounds — degree count over
    # the surviving doubled edge list, drop-all-below-k, re-induce.
    kcore_parts = ["""baskets AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS b, l_partkey AS i
            FROM lineitem
        ),
        e AS MATERIALIZED (
            SELECT l.i AS a, r.i AS b
            FROM baskets l JOIN baskets r ON l.b = r.b AND l.i < r.i
            GROUP BY 1, 2 HAVING count(*) >= 2
        ),
        u0 AS MATERIALIZED (
            SELECT a AS s, b AS d FROM e
            UNION SELECT b, a FROM e
        )"""]
    for _r in range(1, 4):
        kcore_parts.append(f"""kk{_r} AS MATERIALIZED (
            SELECT s FROM u{_r - 1} GROUP BY s HAVING count(*) >= 3
        ),
        u{_r} AS MATERIALIZED (
            SELECT u.s, u.d FROM u{_r - 1} u
            JOIN kk{_r} x ON u.s = x.s
            JOIN kk{_r} y ON u.d = y.s
        )""")
    sql["part_kcore"] = (
        "WITH " + ",\n        ".join(kcore_parts)
        + """
        SELECT CAST(s AS BIGINT) AS node,
            CAST(count(*) AS BIGINT) AS degree
        FROM u3 GROUP BY 1""")

    sql["events_stream_hll"] = """
        WITH h AS MATERIALIZED (
            SELECT date_trunc('day', ts) AS d,
                CAST(concat('0x', substr(md5(concat('hll:',
                    CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT)
                    AS h
            FROM events
        ),
        ranks AS (
            SELECT d, CAST(h % 32 AS INT) AS bucket,
                CASE WHEN (h // 32) % 1099511627776 = 0 THEN 41
                     ELSE 41 - length(bin(
                        (h // 32) % 1099511627776)) END AS r
            FROM h
        ),
        regs AS MATERIALIZED (
            SELECT d, bucket, MAX(r) AS register
            FROM ranks GROUP BY 1, 2
        ),
        spine AS (
            SELECT f.d, b.bucket
            FROM (SELECT DISTINCT d FROM regs) f
            CROSS JOIN (SELECT unnest(generate_series(0, 31))
                        AS bucket) b
        ),
        sums AS (
            SELECT s.d,
                CAST(SUM(CAST(power(2.0,
                    41 - COALESCE(r.register, 0)) AS BIGINT))
                    AS BIGINT) AS s
            FROM spine s LEFT JOIN regs r
                ON s.d = r.d AND s.bucket = r.bucket
            GROUP BY 1
        ),
        est AS (
            SELECT d,
                CAST((6978 * (2251799813685248 // s)) // 10000
                     AS BIGINT) AS hll_est
            FROM sums
        ),
        exact AS (
            SELECT date_trunc('day', ts) AS d,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
            FROM events GROUP BY 1
        )
        SELECT e.d AS window_start, e.n_exact, est.hll_est,
            abs(est.hll_est - e.n_exact) * 2 <= e.n_exact AS hll_ok
        FROM exact e JOIN est ON e.d = est.d"""

    sql["lineitem_hll"] = """
        WITH h AS MATERIALIZED (
            SELECT l_returnflag AS flag,
                CAST(concat('0x', substr(md5(concat('hll:',
                    CAST(l_orderkey AS VARCHAR))), 1, 15)) AS BIGINT)
                    AS h
            FROM lineitem
        ),
        ranks AS (
            SELECT flag, CAST(h % 256 AS INT) AS bucket,
                CASE WHEN (h // 256) % 1099511627776 = 0 THEN 41
                     ELSE 41 - length(bin(
                        (h // 256) % 1099511627776)) END AS r
            FROM h
        ),
        regs AS MATERIALIZED (
            SELECT flag, bucket, MAX(r) AS register
            FROM ranks GROUP BY 1, 2
        ),
        spine AS (
            SELECT f.flag, b.bucket
            FROM (SELECT DISTINCT flag FROM regs) f
            CROSS JOIN (SELECT unnest(generate_series(0, 255))
                        AS bucket) b
        ),
        sums AS (
            SELECT s.flag,
                CAST(SUM(CAST(power(2.0,
                    41 - COALESCE(r.register, 0)) AS BIGINT))
                    AS BIGINT) AS s
            FROM spine s LEFT JOIN regs r
                ON s.flag = r.flag AND s.bucket = r.bucket
            GROUP BY 1
        ),
        est AS (
            SELECT flag,
                CAST((7183 * (144115188075855872 // s)) // 10000
                     AS BIGINT) AS hll_est
            FROM sums
        ),
        exact AS (
            SELECT l_returnflag AS flag,
                CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact
            FROM lineitem GROUP BY 1
        )
        SELECT e.flag AS l_returnflag, e.n_exact, est.hll_est,
            abs(est.hll_est - e.n_exact) * 4 <= e.n_exact AS hll_ok
        FROM exact e JOIN est ON e.flag = est.flag"""

    sql["orders_kmv"] = """
        WITH h AS MATERIALIZED (
            SELECT DISTINCT o_orderpriority AS g,
                CAST(concat('0x', substr(md5(concat('kmv:',
                    CAST(o_custkey AS VARCHAR))), 1, 15)) AS BIGINT)
                    AS h
            FROM orders
        ),
        r AS (
            SELECT g, h,
                row_number() OVER (PARTITION BY g ORDER BY h) AS rn
            FROM h
        ),
        kmv AS MATERIALIZED (
            SELECT g, list(h ORDER BY h) AS hs
            FROM r WHERE rn <= 256 GROUP BY 1
        ),
        pairs AS MATERIALIZED (
            SELECT a.g AS ga, b.g AS gb, a.hs AS ka, b.hs AS kb,
                list_sort(list_distinct(a.hs || b.hs))[1:256] AS merged
            FROM kmv a JOIN kmv b ON a.g < b.g
        ),
        calc AS MATERIALIZED (
            SELECT ga, gb, CAST(len(merged) AS BIGINT) AS m,
                CAST(len(list_filter(merged,
                    x -> list_contains(ka, x)
                         AND list_contains(kb, x))) AS BIGINT) AS c,
                CASE WHEN len(merged) < 256
                     THEN CAST(len(merged) AS BIGINT)
                     ELSE CAST((CAST(255 AS HUGEINT) *
                        CAST(1152921504606846976 AS HUGEINT))
                        // CAST(merged[256] AS HUGEINT) AS BIGINT)
                END AS u
            FROM pairs
        ),
        d AS MATERIALIZED (
            SELECT DISTINCT o_orderpriority AS g, o_custkey AS c
            FROM orders
        ),
        counts AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
        ),
        inter AS (
            SELECT a.g AS ga, b.g AS gb,
                CAST(count(*) AS BIGINT) AS n_inter
            FROM d a JOIN d b ON a.c = b.c AND a.g < b.g
            GROUP BY 1, 2
        )
        SELECT x.ga AS group_a, x.gb AS group_b,
            x.u AS union_est,
            CAST((CAST(x.c AS HUGEINT) * CAST(x.u AS HUGEINT))
                 // CAST(x.m AS HUGEINT) AS BIGINT) AS inter_est,
            (10000 * x.c) // x.m AS jaccard_bp,
            ca.n + cb.n - i.n_inter AS n_union,
            i.n_inter,
            abs(x.u - (ca.n + cb.n - i.n_inter)) * 4
                <= ca.n + cb.n - i.n_inter AS union_ok,
            abs(CAST((CAST(x.c AS HUGEINT) * CAST(x.u AS HUGEINT))
                     // CAST(x.m AS HUGEINT) AS BIGINT) - i.n_inter)
                * 4 <= i.n_inter AS inter_ok
        FROM calc x
        JOIN inter i ON x.ga = i.ga AND x.gb = i.gb
        JOIN counts ca ON ca.g = x.ga
        JOIN counts cb ON cb.g = x.gb"""

    sql["orders_psample"] = """
        WITH w AS MATERIALIZED (
            SELECT o_orderpriority AS g, o_orderkey AS id,
                CAST(round(o_totalprice * 100) AS BIGINT) AS weight,
                CAST(concat('0x', substr(md5(concat('ps:',
                    CAST(o_orderkey AS VARCHAR))), 1, 15)) AS BIGINT)
                    + 1 AS u
            FROM orders
        ),
        p AS MATERIALIZED (
            SELECT g, id, weight,
                CAST(least((CAST(weight AS HUGEINT) *
                    CAST(1152921504606846976 AS HUGEINT))
                    // CAST(u AS HUGEINT),
                    CAST(4611686018427387904 AS HUGEINT))
                    AS BIGINT) AS priority
            FROM w
        ),
        r AS MATERIALIZED (
            SELECT g, id, weight, priority,
                row_number() OVER (PARTITION BY g
                    ORDER BY priority DESC, id ASC) AS rn
            FROM p
        ),
        tau AS (SELECT g, priority AS tau FROM r WHERE rn = 257),
        est AS (
            SELECT r.g,
                CAST(SUM(greatest(r.weight, COALESCE(t.tau, 0)))
                     AS BIGINT) AS est_sum,
                CAST(count(*) AS BIGINT) AS n_sampled
            FROM r LEFT JOIN tau t ON r.g = t.g
            WHERE r.rn <= 256 GROUP BY 1
        ),
        exact AS (
            SELECT o_orderpriority AS g,
                CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS exact_sum
            FROM orders GROUP BY 1
        )
        SELECT e.g AS o_orderpriority, e.est_sum, e.n_sampled,
            x.exact_sum,
            abs(e.est_sum - x.exact_sum) * 4 <= x.exact_sum AS ps_ok
        FROM est e JOIN exact x ON e.g = x.g"""

    sql["lineitem_zorder"] = """
        WITH stats AS MATERIALIZED (
            SELECT CAST(min(l_partkey) AS BIGINT) AS mn_l_partkey,
                CAST(max(l_partkey) AS BIGINT) AS mx_l_partkey,
                CAST(min(l_suppkey) AS BIGINT) AS mn_l_suppkey,
                CAST(max(l_suppkey) AS BIGINT) AS mx_l_suppkey
            FROM lineitem
        ),
        scaled AS (
            SELECT l_partkey, l_suppkey,
                (((CAST(l_partkey AS BIGINT) - mn_l_partkey) * 65535) // greatest(mx_l_partkey - mn_l_partkey, 1)) AS s0,
                (((CAST(l_suppkey AS BIGINT) - mn_l_suppkey) * 65535) // greatest(mx_l_suppkey - mn_l_suppkey, 1)) AS s1
            FROM lineitem CROSS JOIN stats
        ),
        z AS (
            SELECT l_partkey, l_suppkey,
                (((s0 >> 0) & 1) << 0) | (((s1 >> 0) & 1) << 1) | (((s0 >> 1) & 1) << 2) | (((s1 >> 1) & 1) << 3) | (((s0 >> 2) & 1) << 4) | (((s1 >> 2) & 1) << 5) | (((s0 >> 3) & 1) << 6) | (((s1 >> 3) & 1) << 7) | (((s0 >> 4) & 1) << 8) | (((s1 >> 4) & 1) << 9) | (((s0 >> 5) & 1) << 10) | (((s1 >> 5) & 1) << 11) | (((s0 >> 6) & 1) << 12) | (((s1 >> 6) & 1) << 13) | (((s0 >> 7) & 1) << 14) | (((s1 >> 7) & 1) << 15) | (((s0 >> 8) & 1) << 16) | (((s1 >> 8) & 1) << 17) | (((s0 >> 9) & 1) << 18) | (((s1 >> 9) & 1) << 19) | (((s0 >> 10) & 1) << 20) | (((s1 >> 10) & 1) << 21) | (((s0 >> 11) & 1) << 22) | (((s1 >> 11) & 1) << 23) | (((s0 >> 12) & 1) << 24) | (((s1 >> 12) & 1) << 25) | (((s0 >> 13) & 1) << 26) | (((s1 >> 13) & 1) << 27) | (((s0 >> 14) & 1) << 28) | (((s1 >> 14) & 1) << 29) | (((s0 >> 15) & 1) << 30) | (((s1 >> 15) & 1) << 31) AS z
            FROM scaled
        )
        SELECT z // 16777216 AS z_bucket,
            CAST(count(*) AS BIGINT) AS n,
            min(l_partkey) AS min_part, max(l_partkey) AS max_part,
            min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
        FROM z GROUP BY 1"""

    sql["cuboid_greedy"] = """
        WITH proj AS (
            SELECT o_orderpriority AS pri, o_orderstatus AS st,
                year(o_orderdate) AS yr
            FROM orders
        ),
        cube_rows AS MATERIALIZED (
            SELECT GROUPING_ID(pri, st, yr) AS gid
            FROM proj GROUP BY CUBE(pri, st, yr)
        ),
        sizes AS MATERIALIZED (
            SELECT CAST(gid AS BIGINT) AS grouping_id,
                CAST(3 - bit_count(gid) AS INT) AS n_dims,
                CAST(count(*) AS BIGINT) AS size
            FROM cube_rows GROUP BY 1, 2
        ),
        base AS (SELECT size AS base_size FROM sizes
                 WHERE grouping_id = 0),
        ben AS (
            SELECT s.grouping_id, s.n_dims, s.size,
                CASE WHEN s.grouping_id = 0 THEN 0
                     ELSE CAST((1 << s.n_dims) AS BIGINT)
                          * (b.base_size - s.size) END AS benefit_r1
            FROM sizes s CROSS JOIN base b
        )
        SELECT grouping_id, n_dims, size, benefit_r1,
            grouping_id != 0 AND row_number() OVER (
                ORDER BY benefit_r1 DESC, size ASC, grouping_id ASC)
                = 1 AS picked_first
        FROM ben"""

    sql["part_links"] = """
        WITH baskets AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS b, l_partkey AS i
            FROM lineitem
        ),
        edges AS MATERIALIZED (
            SELECT l.i AS a, r.i AS b
            FROM baskets l JOIN baskets r ON l.b = r.b AND l.i < r.i
            GROUP BY 1, 2 HAVING count(*) >= 2
        ),
        adj AS MATERIALIZED (
            SELECT a AS w, b AS n FROM edges
            UNION ALL SELECT b, a FROM edges
        ),
        deg AS MATERIALIZED (
            SELECT n, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY 1
        ),
        common AS MATERIALIZED (
            SELECT p1.n AS na, p2.n AS nb,
                CAST(count(*) AS BIGINT) AS n_common
            FROM adj p1 JOIN adj p2
                ON p1.w = p2.w AND p1.n < p2.n
            GROUP BY 1, 2 HAVING count(*) >= 2
        ),
        cand AS (
            SELECT c.* FROM common c
            LEFT JOIN edges e ON e.a = c.na AND e.b = c.nb
            WHERE e.a IS NULL
        )
        SELECT CAST(c.na AS BIGINT) AS node_a,
            CAST(c.nb AS BIGINT) AS node_b,
            c.n_common,
            da.d + db.d - c.n_common AS n_union,
            (10000 * c.n_common) // (da.d + db.d - c.n_common)
                AS jaccard_bp
        FROM cand c
        JOIN deg da ON da.n = c.na
        JOIN deg db ON db.n = c.nb"""

    sql["dq_orders"] = """
        WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows
                   FROM orders),
        rows_checks AS (
            SELECT 'not_null:o_orderkey' AS rule,
                'not_null' AS "check", n.n_rows,
                (SELECT CAST(count(*) AS BIGINT) FROM orders
                 WHERE o_orderkey IS NULL) AS n_violations
            FROM n
            UNION ALL
            SELECT 'in_range:o_totalprice', 'in_range', n.n_rows,
                (SELECT CAST(count(*) AS BIGINT) FROM orders
                 WHERE o_totalprice < 0 OR o_totalprice > 200000
                    OR o_totalprice IS NULL)
            FROM n
            UNION ALL
            SELECT 'accepted_values:o_orderpriority',
                'accepted_values', n.n_rows,
                (SELECT CAST(count(*) AS BIGINT) FROM orders
                 WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
                    '3-MEDIUM', '4-NOT SPECIFIED')
                    OR o_orderpriority IS NULL)
            FROM n
            UNION ALL
            SELECT 'matches:o_orderstatus', 'matches', n.n_rows,
                (SELECT CAST(count(*) AS BIGINT) FROM orders
                 WHERE NOT regexp_matches(o_orderstatus, '^[OF]$')
                    OR o_orderstatus IS NULL)
            FROM n
            UNION ALL
            SELECT 'big_ticket', 'expression', n.n_rows,
                (SELECT CAST(count(*) AS BIGINT) FROM orders
                 WHERE NOT COALESCE(o_totalprice >= 5000, FALSE))
            FROM n
            UNION ALL
            SELECT 'unique:o_orderkey', 'unique', n.n_rows,
                (SELECT CAST(count(*) - count(DISTINCT o_orderkey)
                    AS BIGINT) FROM orders)
            FROM n
            UNION ALL
            SELECT 'repeat_customers', 'unique', n.n_rows,
                (SELECT CAST(count(*) - count(DISTINCT o_custkey)
                    AS BIGINT) FROM orders)
            FROM n
            UNION ALL
            SELECT 'foreign_key:o_custkey', 'foreign_key', n.n_rows,
                (SELECT CAST(count(*) AS BIGINT) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
            FROM n
        )
        SELECT rule, "check", n_rows, n_violations,
            n_violations = 0 AS passed
        FROM rows_checks"""

    sql["basket_pairs"] = """
        WITH baskets AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS b, l_partkey AS i
            FROM lineitem
        ),
        tot AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n
                FROM baskets),
        sup AS MATERIALIZED (
            SELECT i, CAST(count(*) AS BIGINT) AS n
            FROM baskets GROUP BY 1
        ),
        pairs AS (
            SELECT l.i AS item_a, r.i AS item_b,
                CAST(count(*) AS BIGINT) AS n_ab
            FROM baskets l JOIN baskets r
                ON l.b = r.b AND l.i < r.i
            GROUP BY 1, 2 HAVING count(*) >= 2
        )
        SELECT CAST(p.item_a AS BIGINT) AS item_a,
            CAST(p.item_b AS BIGINT) AS item_b,
            p.n_ab, sa.n AS n_a, sb.n AS n_b,
            (10000 * p.n_ab * t.n) // (sa.n * sb.n) AS lift_bp
        FROM pairs p
        JOIN sup sa ON p.item_a = sa.i
        JOIN sup sb ON p.item_b = sb.i
        CROSS JOIN tot t"""

    # Gini from the cumulative value histogram: a distinct value v
    # (count c, cumulative cum) occupies ranks cum-c+1..cum, whose
    # total is c*(2*cum-c+1)//2; G = (2*Σv*ranks - (n+1)*Σx)/(n*Σx)
    # in HUGEINT (Spark side: decimal(38,0)).
    sql["orders_gini"] = """
        WITH m AS (
            SELECT o_custkey,
                sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
            FROM orders GROUP BY 1
        ),
        h AS (SELECT x AS v, count(*) AS c FROM m GROUP BY 1),
        ch AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM h),
        agg AS (
            SELECT CAST(sum(c) AS HUGEINT) AS n,
                sum(CAST(v AS HUGEINT) * c) AS s,
                sum(CAST(v AS HUGEINT)
                    * ((c * (2 * cum - c + 1)) // 2)) AS sr
            FROM ch
        )
        SELECT CAST(n AS BIGINT) AS n_keys,
            CAST(s AS BIGINT) AS total_cents,
            CAST((10000 * (2 * sr - (n + 1) * s)) // (n * s)
                 AS BIGINT) AS gini_bp
        FROM agg"""

    # sequence match: string_agg in (ts, event_id) order replays
    # array_sort(collect_list(struct)); RE2 and Java regex agree on
    # non-overlapping counts and leftmost match for anchor-free
    # patterns; first occurrence OF the leftmost matched text IS the
    # match position (an earlier occurrence would itself have matched).
    sql["lineitem_hilbert"] = _guarded_oracle(
        _hilbert_oracle, "lineitem_hilbert")
    sql["doc_hits"] = _guarded_oracle(_hits_oracle, "doc_hits")

    # Clamped running balance: the zero-floor closed form
    # B_i = S_i - min(0, runmin(S)); clamp rows are the prefix sum's
    # new strict minima below zero; final row by (ts, event_id) DESC.
    sql["events_balance"] = """
        WITH d AS (
            SELECT user_id, ts, event_id,
                CAST(round(value * 100) AS BIGINT)
                * (CASE WHEN event_type = 'error' THEN -1 ELSE 1 END)
                    AS dlt
            FROM events
        ),
        s AS (
            SELECT user_id, ts, event_id,
                sum(dlt) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sm
            FROM d
        ),
        b AS (
            SELECT user_id, ts, event_id,
                sm - least(0, min(sm) OVER w_run) AS balance,
                sm < least(0, COALESCE(min(sm) OVER w_prev, 0))
                    AS clamped,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC)
                    AS rn
            FROM s
            WINDOW w_run AS (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW),
                   w_prev AS (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING)
        )
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
            CAST(max(CASE WHEN rn = 1 THEN balance END) AS BIGINT)
                AS final_balance,
            CAST(sum(CASE WHEN clamped THEN 1 ELSE 0 END) AS BIGINT)
                AS n_clamps
        FROM b GROUP BY user_id"""

    # Holt smoothing: the same fixed-point walk as a recursive CTE
    # carrying (l, b) per group; >> floors on both engines.
    sql["events_holt"] = """
        WITH RECURSIVE b AS MATERIALIZED (
            SELECT event_type AS g, date_trunc('day', ts) AS d,
                CAST(sum(CAST(round(value * 100) AS BIGINT))
                     AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        lists AS (
            SELECT g, list(y ORDER BY d) AS ys,
                count(*) AS n
            FROM b GROUP BY g HAVING count(*) >= 2
        ),
        walk AS (
            SELECT g, n, ys, 2 AS t,
                CAST(ys[1] AS BIGINT) AS l,
                CAST(ys[2] - ys[1] AS BIGINT) AS bt
            FROM lists
            UNION ALL
            SELECT g, n, ys, t + 1,
                (ys[t + 1] + l + bt) >> 1,
                (((ys[t + 1] + l + bt) >> 1) - l + bt) >> 1
            FROM walk WHERE t < n
        )
        SELECT g AS event_type, CAST(n AS BIGINT) AS n_buckets,
            l AS level_cents, bt AS trend_cents,
            CAST(l + 1 * bt AS BIGINT) AS forecast_cents
        FROM walk WHERE t = n"""

    # Bitmap rollup is exact, so the oracle is plain count(distinct)
    # at both grains — equality proves the merged bitmaps lose
    # nothing.
    sql["events_bitmap"] = """
        SELECT event_type,
            CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
        FROM events WHERE user_id IS NOT NULL GROUP BY 1
        UNION ALL
        SELECT '(all)',
            CAST(count(DISTINCT user_id) AS BIGINT)
        FROM events WHERE user_id IS NOT NULL"""

    # RAKE: replay tokenization, the stopword/punctuation delimiting,
    # the gaps-and-islands phrase assembly and the integer
    # degree/frequency scores end-to-end.  Island constants differ by
    # a fixed 1 (0- vs 1-based positions) — only within-doc equality
    # matters.
    sql["doc_rake"] = r"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id,
                CASE WHEN trim(lower(text)) = '' THEN []
                     ELSE string_split_regex(trim(lower(text)),
                                             '\s+') END AS t
            FROM documents
        ),
        words AS MATERIALIZED (
            SELECT doc_id, p, w FROM (
                SELECT doc_id, i AS p, t[i] AS w
                FROM (SELECT doc_id, t,
                          unnest(generate_series(1, len(t))) AS i
                      FROM toks)
            )
            WHERE w <> ''
              AND w NOT IN ('the','and','of','to','in','is','that',
                            'it','was','for')
              AND NOT regexp_matches(w, '[^a-z0-9]')
        ),
        phr AS MATERIALIZED (
            SELECT doc_id, isl, list(w ORDER BY p) AS ws,
                count(*) AS plen
            FROM (SELECT doc_id, p, w,
                      p - row_number() OVER (PARTITION BY doc_id
                                             ORDER BY p) AS isl
                  FROM words)
            GROUP BY 1, 2 HAVING count(*) <= 4
        ),
        occw AS MATERIALIZED (
            SELECT doc_id, isl, plen, unnest(ws) AS w FROM phr
        ),
        wstats AS MATERIALIZED (
            SELECT w,
                CAST((1000000 * CAST(sum(plen) AS HUGEINT))
                     // count(*) AS BIGINT) AS score
            FROM occw GROUP BY 1
        ),
        occ AS (
            SELECT o.doc_id, o.isl,
                CAST(sum(s.score) AS BIGINT) AS s
            FROM occw o JOIN wstats s ON o.w = s.w
            GROUP BY 1, 2
        )
        SELECT array_to_string(p.ws, ' ') AS phrase,
            CAST(max(p.plen) AS BIGINT) AS n_words,
            CAST(count(*) AS BIGINT) AS n_occurrences,
            CAST(max(o.s) AS BIGINT) AS score_ppm
        FROM phr p
        JOIN occ o ON p.doc_id = o.doc_id AND p.isl = o.isl
        GROUP BY 1 HAVING count(*) >= 2"""

    # Semi-additive LastNonEmpty: the oracle picks each user's last
    # event per month with a row_number window — (ts, event_id) is
    # unique, so it equals Spark's algebraic max(struct) pick.
    sql["events_semiadd"] = """
        WITH v AS (
            SELECT event_type, date_trunc('month', ts) AS bucket,
                CAST(round(value * 100) AS BIGINT) AS v,
                row_number() OVER (
                    PARTITION BY event_type, user_id,
                        date_trunc('month', ts)
                    ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        SELECT event_type, bucket,
            CAST(count(*) AS BIGINT) AS n_entities,
            CAST(sum(v) AS BIGINT) AS last_sum_cents
        FROM v WHERE rn = 1 GROUP BY 1, 2"""

    # ACF: n-scaled integer deviations, lag windows over the bucket
    # series, sign * truncating-div ppm (// on positive operands).
    sql["events_acf"] = """
        WITH b AS MATERIALIZED (
            SELECT event_type AS g, date_trunc('day', ts) AS d,
                CAST(sum(CAST(round(value * 100) AS BIGINT))
                     AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        s AS (SELECT g, count(*) AS n, sum(y) AS tot
              FROM b GROUP BY 1),
        l AS (
            SELECT b.g, b.d, s.n,
                CAST(s.n AS HUGEINT) * y - CAST(s.tot AS HUGEINT)
                    AS dv
            FROM b JOIN s USING (g)
        ),
        lg AS (
            SELECT g, n, dv,
                lag(dv, 1) OVER w AS p1, lag(dv, 2) OVER w AS p2,
                lag(dv, 3) OVER w AS p3, lag(dv, 4) OVER w AS p4,
                lag(dv, 5) OVER w AS p5, lag(dv, 6) OVER w AS p6,
                lag(dv, 7) OVER w AS p7
            FROM l
            WINDOW w AS (PARTITION BY g ORDER BY d)
        ),
        pg AS (
            SELECT g, max(n) AS n, sum(dv * dv) AS den,
                sum(dv * p1) AS n1, sum(dv * p2) AS n2,
                sum(dv * p3) AS n3, sum(dv * p4) AS n4,
                sum(dv * p5) AS n5, sum(dv * p6) AS n6,
                sum(dv * p7) AS n7
            FROM lg GROUP BY 1
        ),
        e AS (
            SELECT g, n, den,
                unnest(generate_series(1, 7)) AS k,
                unnest([n1, n2, n3, n4, n5, n6, n7]) AS num
            FROM pg WHERE den > 0
        )
        SELECT g AS event_type, CAST(k AS BIGINT) AS lag,
            CAST(n AS BIGINT) AS n_buckets,
            CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                 * ((1000000 * abs(num)) // den) AS BIGINT)
                AS acf_ppm
        FROM e WHERE n >= k + 2"""

    # Frequent tokens: the sketch is only a pruning device — the
    # exact answer is plain GROUP BY + HAVING on the share.
    sql["doc_freq_tokens"] = r"""
        WITH t AS MATERIALIZED (
            SELECT unnest(CASE WHEN trim(lower(text)) = '' THEN []
                ELSE string_split_regex(trim(lower(text)), '\s+')
                END) AS v
            FROM documents
        ),
        tt AS MATERIALIZED (SELECT v FROM t WHERE v <> ''),
        n AS (SELECT count(*) AS tot FROM tt),
        c AS (SELECT v, count(*) AS cnt FROM tt GROUP BY 1)
        SELECT v AS value, CAST(cnt AS BIGINT) AS n,
            CAST((1000000 * cnt) // tot AS BIGINT) AS share_ppm
        FROM c, n WHERE (1000000 * cnt) // tot >= 5000"""

    # Burstiness: the gap multiset of a sorted timestamp multiset is
    # tie-order invariant, so window order by ts alone is safe.
    sql["events_burstiness"] = """
        WITH g AS (
            SELECT user_id,
                epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts) AS gp
            FROM events
        ),
        a AS (
            SELECT user_id, count(*) AS n, sum(gp) AS s,
                sum(CAST(gp AS HUGEINT) * gp) AS q
            FROM g WHERE gp IS NOT NULL GROUP BY 1
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
            CAST(s // n AS BIGINT) AS mean_gap_us,
            CAST((1000000 * (n * q - CAST(s AS HUGEINT) * s))
                 // (CAST(n AS HUGEINT) * s) AS BIGINT) AS fano_ppm
        FROM a WHERE n >= 2 AND s > 0"""

    # Benford: both engines compare against the same nine pre-rounded
    # log10(1+1/d) ppm constants.
    _benford_case = ("CASE digit " + " ".join(
        f"WHEN {d} THEN {p}" for d, p in
        ((1, 301030), (2, 176091), (3, 124939), (4, 96910),
         (5, 79181), (6, 66947), (7, 57992), (8, 51153),
         (9, 45757))) + " END")
    sql["orders_benford"] = f"""
        WITH b AS MATERIALIZED (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
            FROM orders
            WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
        ),
        d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1)
                          AS BIGINT) AS digit FROM b),
        n AS (SELECT count(*) AS tot FROM d),
        cnt AS (SELECT digit, count(*) AS nn FROM d GROUP BY 1),
        e AS (
            SELECT digit, nn, (1000000 * nn) // tot AS obs_ppm,
                {_benford_case} AS exp_ppm
            FROM cnt, n
        )
        SELECT digit, CAST(nn AS BIGINT) AS n,
            CAST(obs_ppm AS BIGINT) AS obs_ppm,
            CAST(exp_ppm AS BIGINT) AS exp_ppm,
            CAST(((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm))
                 // exp_ppm AS BIGINT) AS dev_ppm
        FROM e"""

    # Resource-allocation: part_links' graph CTEs, scored as
    # sum(1e6 // deg(center)) in the wedge aggregation.
    sql["part_ra"] = """
        WITH baskets AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS b, l_partkey AS i
            FROM lineitem
        ),
        edges AS MATERIALIZED (
            SELECT l.i AS a, r.i AS b
            FROM baskets l JOIN baskets r ON l.b = r.b AND l.i < r.i
            GROUP BY 1, 2 HAVING count(*) >= 2
        ),
        adj AS MATERIALIZED (
            SELECT a AS w, b AS n FROM edges
            UNION ALL SELECT b, a FROM edges
        ),
        deg AS MATERIALIZED (
            SELECT n, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY 1
        ),
        common AS MATERIALIZED (
            SELECT p1.n AS na, p2.n AS nb,
                CAST(count(*) AS BIGINT) AS n_common,
                CAST(sum(1000000 // dw.d) AS BIGINT) AS ra_ppm
            FROM adj p1
            JOIN adj p2 ON p1.w = p2.w AND p1.n < p2.n
            JOIN deg dw ON dw.n = p1.w
            GROUP BY 1, 2 HAVING count(*) >= 2
        )
        SELECT CAST(c.na AS BIGINT) AS node_a,
            CAST(c.nb AS BIGINT) AS node_b,
            c.n_common, c.ra_ppm
        FROM common c
        LEFT JOIN edges e ON e.a = c.na AND e.b = c.nb
        WHERE e.a IS NULL"""

    # Markov transitions: lead() under (ts, event_id) order, integer
    # ppm probabilities — per-state totals from a window over the
    # (from, to) grain.
    sql["events_markov"] = """
        WITH p AS (
            SELECT event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS to_type
            FROM events
        ),
        c AS (
            SELECT from_type, to_type, count(*) AS n
            FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
            CAST((1000000 * CAST(n AS HUGEINT))
                 // sum(n) OVER (PARTITION BY from_type)
                 AS BIGINT) AS prob_ppm
        FROM c"""

    # Gaps-and-islands: month_index - row_number island constant,
    # longest run per customer, earliest-start tiebreak.
    sql["orders_streaks"] = """
        WITH m AS (
            SELECT DISTINCT o_custkey AS k,
                CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                     AS BIGINT) AS mi
            FROM orders
        ),
        runs AS (
            SELECT k, count(*) AS len, min(mi) AS strt
            FROM (SELECT k, mi,
                      mi - row_number() OVER (PARTITION BY k
                                              ORDER BY mi) AS isl
                  FROM m)
            GROUP BY k, isl
        ),
        best AS (
            SELECT k, sum(len) OVER (PARTITION BY k) AS n_active,
                len, strt,
                row_number() OVER (PARTITION BY k
                                   ORDER BY len DESC, strt) AS rn
            FROM runs
        )
        SELECT k AS o_custkey,
            CAST(n_active AS BIGINT) AS n_active_months,
            CAST(len AS BIGINT) AS longest_streak,
            CAST(strt // 12 AS BIGINT) AS streak_start_year,
            CAST(strt % 12 + 1 AS BIGINT) AS streak_start_month
        FROM best WHERE rn = 1"""

    # MAD: both medians are the smallest value whose 1-based rank
    # reaches (n+1) div 2 — percentile_disc, group-partitioned.
    sql["orders_mad"] = """
        WITH b AS MATERIALIZED (
            SELECT o_orderpriority AS g,
                CAST(round(o_totalprice * 100) AS BIGINT) AS v
            FROM orders
        ),
        r1 AS (
            SELECT g, v,
                row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
                count(*) OVER (PARTITION BY g) AS n
            FROM b
        ),
        med AS (
            SELECT g, max(n) AS n_rows,
                min(CASE WHEN rn >= (n + 1) // 2 THEN v END)
                    AS median_cents
            FROM r1 GROUP BY g
        ),
        r2 AS (
            SELECT d.g, d.dv,
                row_number() OVER (PARTITION BY d.g ORDER BY d.dv) AS rn,
                count(*) OVER (PARTITION BY d.g) AS n
            FROM (SELECT b.g, abs(b.v - med.median_cents) AS dv
                  FROM b JOIN med ON b.g = med.g) d
        ),
        mad AS (
            SELECT g,
                min(CASE WHEN rn >= (n + 1) // 2 THEN dv END)
                    AS mad_cents
            FROM r2 GROUP BY g
        )
        SELECT med.g AS o_orderpriority,
            CAST(med.n_rows AS BIGINT) AS n_rows,
            CAST(med.median_cents AS BIGINT) AS median_cents,
            CAST(mad.mad_cents AS BIGINT) AS mad_cents
        FROM med JOIN mad ON med.g = mad.g"""

    # Last-touch attribution: last-ignore-nulls over a frame ending
    # 1 row before the conversion under (ts, event_id) order; both
    # carried columns are null on the same rows so they pick the
    # same touch row; 24h gap compared in exact microseconds.
    sql["events_attribution"] = """
        WITH t AS (
            SELECT event_type, ts,
                last_value(CASE WHEN event_type IN
                    ('view', 'click', 'signup') THEN event_type END
                    IGNORE NULLS) OVER w AS lt,
                last_value(CASE WHEN event_type IN
                    ('view', 'click', 'signup') THEN ts END
                    IGNORE NULLS) OVER w AS lts
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING)
        )
        SELECT COALESCE(CASE WHEN lts IS NOT NULL
                AND date_diff('microsecond', lts, ts)
                    <= CAST(86400 AS BIGINT) * 1000000
                THEN lt END, '(none)') AS channel,
            CAST(count(*) AS BIGINT) AS n_conversions
        FROM t WHERE event_type = 'purchase'
        GROUP BY 1"""

    sql["events_seqmatch"] = """
        WITH coded AS (
            SELECT user_id, ts, event_id,
                CASE event_type
                    WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                    WHEN 'error' THEN 'e' END AS c
            FROM events
        ),
        seq AS (
            SELECT user_id,
                string_agg(c, '' ORDER BY ts, event_id) AS s
            FROM coded WHERE c IS NOT NULL GROUP BY user_id
        )
        SELECT user_id,
            CAST(length(s) AS BIGINT) AS seq_len,
            CAST(len(regexp_extract_all(s, 'vc*p')) AS BIGINT)
                AS n_matches,
            CAST(CASE WHEN regexp_matches(s, 'vc*p')
                 THEN strpos(s, regexp_extract(s, 'vc*p'))
                 ELSE 0 END AS BIGINT) AS first_match_pos
        FROM seq"""

    # RFM: boundaries are exact order statistics — smallest v with
    # #(x <= v) >= ceil(i*n/4) — replayed with a cumulative histogram;
    # bin = 1 + #(boundaries < value), recency reversed (5 - bin).
    def _rfm_bounds(metric):
        return f"""(
            SELECT min(CASE WHEN cum >= (1*nn + 3) // 4 THEN v END) AS b1,
                   min(CASE WHEN cum >= (2*nn + 3) // 4 THEN v END) AS b2,
                   min(CASE WHEN cum >= (3*nn + 3) // 4 THEN v END) AS b3
            FROM (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, nn
                  FROM (SELECT {metric} AS v, count(*) AS cnt
                        FROM m GROUP BY 1), n))"""

    sql["rfm_customers"] = f"""
        WITH m AS MATERIALIZED (
            SELECT o_custkey,
                CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                               DATE '1998-12-31') AS BIGINT)
                    AS recency_days,
                CAST(count(*) AS BIGINT) AS frequency,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS monetary_cents
            FROM orders GROUP BY 1
        ),
        n AS (SELECT count(*) AS nn FROM m),
        rb AS {_rfm_bounds('recency_days')},
        fb AS {_rfm_bounds('frequency')},
        mb AS {_rfm_bounds('monetary_cents')},
        scored AS (
            SELECT m.o_custkey, m.recency_days, m.frequency,
                m.monetary_cents,
                CAST(5 - (1
                    + CASE WHEN m.recency_days > rb.b1 THEN 1 ELSE 0 END
                    + CASE WHEN m.recency_days > rb.b2 THEN 1 ELSE 0 END
                    + CASE WHEN m.recency_days > rb.b3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS r_score,
                CAST(1
                    + CASE WHEN m.frequency > fb.b1 THEN 1 ELSE 0 END
                    + CASE WHEN m.frequency > fb.b2 THEN 1 ELSE 0 END
                    + CASE WHEN m.frequency > fb.b3 THEN 1 ELSE 0 END
                    AS BIGINT) AS f_score,
                CAST(1
                    + CASE WHEN m.monetary_cents > mb.b1 THEN 1 ELSE 0 END
                    + CASE WHEN m.monetary_cents > mb.b2 THEN 1 ELSE 0 END
                    + CASE WHEN m.monetary_cents > mb.b3 THEN 1 ELSE 0 END
                    AS BIGINT) AS m_score
            FROM m, rb, fb, mb
        )
        SELECT *, CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
            AS segment
        FROM scored"""

    sql["multiformat_store"] = """
        SELECT r.r_name,
            CAST(count(*) AS BIGINT) AS n_nations,
            CAST(SUM(CAST(n.n_nationkey AS BIGINT)) AS BIGINT)
                AS key_sum
        FROM nation n JOIN region r
            ON n.n_regionkey = r.r_regionkey
        GROUP BY 1"""

    sql["agg_point_cut"] = f"""
        SELECT CAST(year(l_shipdate) AS BIGINT) AS "date.year",
            CAST(month(l_shipdate) AS BIGINT) AS "date.month",
            CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS price_sum,
            COUNT(*) AS fact_count
        FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 1, 2"""

    # matroska metadata: track layout closed-form in doc_id
    sql["doc_mkv_meta"] = """
        SELECT doc_id,
            CAST((1 + doc_id % 4) * 100000 AS BIGINT)
                AS timestamp_scale,
            CAST(1 AS BIGINT) AS n_video,
            CAST(1 + doc_id % 2 AS BIGINT) AS n_audio,
            CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
                AS n_subtitle,
            'V_VP9' || repeat(',A_OPUS', CAST(1 + doc_id % 2 AS INT))
                || CASE WHEN doc_id % 3 = 0 THEN ',S_TEXT/UTF8'
                   ELSE '' END AS codec_ids
        FROM documents"""

    # video frame sampling: every 2nd frame kept; per-frame byte sums
    sql["doc_video_frames"] = """
        WITH f AS (
            SELECT doc_id, u.f AS frame_id,
                3 + doc_id % 3 AS w, 2 + doc_id % 2 AS h
            FROM documents,
                UNNEST(range(CAST(2 + doc_id % 3 AS INT))) AS u(f)
            WHERE u.f % 2 = 0)
        SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
            CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
            CAST(w * h * 3 AS BIGINT) AS n_samples,
            CAST(list_sum(list_transform(range(CAST(h AS INT)),
                y -> list_sum(list_transform(range(CAST(w AS INT)),
                    x -> list_sum(list_transform([0, 1, 2],
                        c -> (doc_id * 7 + frame_id * 19 + x * 5
                              + y * 11 + c * 3) % 256))))))
                 AS BIGINT) AS sample_sum
        FROM f"""

    # video pipeline: nearest 2x2 resize of every 2nd decoded frame;
    # image pixel ((X*w)//2, (Y*h)//2) is FILE row h-1-(Y*h)//2 of the
    # bottom-up DIB
    sql["doc_video_pipeline"] = """
        WITH f AS (
            SELECT doc_id, u.f AS frame_id,
                3 + doc_id % 3 AS w, 2 + doc_id % 2 AS h
            FROM documents,
                UNNEST(range(CAST(2 + doc_id % 3 AS INT))) AS u(f)
            WHERE u.f % 2 = 0)
        SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
            CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
            CAST(2 AS BIGINT) AS out_width,
            CAST(2 AS BIGINT) AS out_height,
            CAST(12 AS BIGINT) AS n_samples,
            CAST(list_sum(list_transform([0, 1],
                y -> list_sum(list_transform([0, 1],
                    x -> list_sum(list_transform([0, 1, 2],
                        c -> (doc_id * 7 + frame_id * 19
                              + ((x * w) // 2) * 5
                              + (h - 1 - (y * h) // 2) * 11
                              + c * 3) % 256))))))
                 AS BIGINT) AS sample_sum
        FROM f"""

    # JPEG roundtrip: flat (DC-only) images reconstruct exactly
    sql["doc_jpeg_roundtrip"] = """
        SELECT doc_id,
            CAST(8 + (doc_id % 3) * 8 AS BIGINT) AS width,
            CAST(8 + (doc_id % 2) * 8 AS BIGINT) AS height,
            CAST((8 + (doc_id % 3) * 8) * (8 + (doc_id % 2) * 8)
                 AS BIGINT) AS n_samples,
            CAST((doc_id * 37) % 256
                 * (8 + (doc_id % 3) * 8) * (8 + (doc_id % 2) * 8)
                 AS BIGINT) AS sample_sum
        FROM documents"""

    # chunking: same step/limit arithmetic, md5 per chunk
    sql["doc_chunks"] = """
        SELECT doc_id, k AS chunk_id,
            CAST(length(substr(text, CAST(k * 224 + 1 AS INT), 256))
                 AS BIGINT) AS chunk_len,
            md5(substr(text, CAST(k * 224 + 1 AS INT), 256))
                AS chunk_hash
        FROM documents,
            UNNEST(range(CAST(greatest(1,
                (greatest(length(text) - 32, 0) + 223) // 224)
                AS BIGINT))) AS u(k)"""

    # deterministic split: the same md5-derived hash mod 1000
    sql["doc_split"] = """
        SELECT lang,
            CASE WHEN CAST(concat('0x', substr(md5(concat('split:',
                    CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                    % 1000 < 100
                 THEN 'val' ELSE 'train' END AS split,
            COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1, 2"""

    # exact substring dedup: the same 8-token spans + portable hash
    _span_cte = f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS t FROM documents),
        spans AS (
            SELECT doc_id,
                array_to_string(
                    t[CAST(u.i + 1 AS INT) : CAST(u.i + 8 AS INT)],
                    ' ') AS span
            FROM toks,
                UNNEST(range(CAST(greatest(len(t) - 7, 0) AS BIGINT)))
                    AS u(i)),
        hashed AS (
            SELECT doc_id,
                {_H64.format(x='span')} AS span_hash
            FROM spans)
    """
    sql["doc_substring_dup"] = _span_cte + """
        SELECT span_hash,
            COUNT(DISTINCT doc_id) AS n_docs,
            COUNT(*) AS n_occurrences,
            MIN(doc_id) AS canonical_id
        FROM hashed GROUP BY 1
        HAVING COUNT(DISTINCT doc_id) >= 2"""

    sql["doc_span_docs"] = _span_cte + """
        , dup AS (
            SELECT span_hash FROM hashed
            GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2)
        SELECT doc_id,
            CAST(SUM(CASE WHEN span_hash IN (SELECT span_hash FROM dup)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
            COUNT(*) AS n_spans
        FROM hashed GROUP BY 1"""

    # decontamination: distinct grams per doc vs the benchmark slice;
    # threshold compare in exact integer arithmetic (0.2 == 2000 bp)
    sql["doc_decontam"] = _span_cte + """
        , distinct_grams AS (
            SELECT DISTINCT doc_id, span_hash FROM hashed),
        bench AS (
            SELECT DISTINCT span_hash FROM distinct_grams
            WHERE doc_id % 25 = 0)
        SELECT doc_id,
            COUNT(*) AS n_grams,
            CAST(SUM(CASE WHEN span_hash IN (SELECT span_hash FROM bench)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
            CAST(CASE WHEN SUM(CASE WHEN span_hash IN
                        (SELECT span_hash FROM bench) THEN 1 ELSE 0 END)
                      * 10000 >= 2000 * COUNT(*)
                 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
        FROM distinct_grams GROUP BY 1"""

    # sequence packing: exclusive prefix sum in doc_id order, integer
    # bin arithmetic (identical to the two-phase Spark result)
    sql["doc_pack"] = f"""
        WITH toks AS (
            SELECT doc_id, len({_TOKENS}) AS n FROM documents),
        placed AS (
            SELECT doc_id, n,
                CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS s
            FROM toks),
        bins AS (
            SELECT doc_id, n, s, u.b AS bin_id
            FROM placed,
                UNNEST(range(s // 512, (s + n - 1) // 512 + 1)) AS u(b)
            WHERE n > 0)
        SELECT CAST(bin_id AS BIGINT) AS bin_id, doc_id,
            CAST(greatest(s, bin_id * 512) - bin_id * 512 AS BIGINT)
                AS offset_in_bin,
            CAST(least(s + n, (bin_id + 1) * 512)
                 - greatest(s, bin_id * 512) AS BIGINT) AS tokens_in_bin,
            CAST(n AS BIGINT) AS n_tokens
        FROM bins"""

    # RLE8 BMPs: sums recomputed from the closed form (row-order
    # invariant; absolute-mode literals + runs)
    sql["doc_bmp_rle"] = """
        SELECT doc_id,
            CAST(4 + doc_id % 3 AS BIGINT) AS width,
            CAST(2 + doc_id % 2 AS BIGINT) AS height,
            CAST((4 + doc_id % 3) * (2 + doc_id % 2) AS BIGINT)
                AS n_samples,
            CAST((doc_id % 200) + ((doc_id + 1) % 200)
                 + ((doc_id + 2) % 200)
                 + (1 + doc_id % 3) * ((doc_id + 3) % 200)
                 + list_sum(list_transform(
                       range(1, CAST(2 + doc_id % 2 AS INT)),
                       y -> (4 + doc_id % 3)
                            * ((doc_id + y * 13) % 200)))
                 AS BIGINT) AS sample_sum
        FROM documents"""

    # IMA ADPCM: inputs keyed by doc_id % 8; the 8 reference-decoded
    # sums are inlined as literals (independent spec implementation)
    _adpcm_rows = []
    for _r in range(8):
        _data = bytes((_j * 37 + _r * 11) % 256 for _j in range(8))
        _samples = _ima_decode_reference(_data, _r * 100 - 300, _r * 3)
        _adpcm_rows.append(f"({_r}, {sum(_samples)})")
    sql["doc_adpcm_decode"] = f"""
        SELECT d.doc_id, CAST(1 AS BIGINT) AS n_channels,
            CAST(8000 AS BIGINT) AS sample_rate,
            CAST(17 AS BIGINT) AS n_samples,
            CAST(v.s AS BIGINT) AS sample_sum
        FROM documents d
        JOIN (VALUES {", ".join(_adpcm_rows)}) v(r, s)
            ON d.doc_id % 8 = v.r"""

    # progressive JPEG roundtrip: per-block-flat -> exact closed form
    sql["doc_jpeg_progressive"] = """
        SELECT doc_id,
            CAST((2 + doc_id % 2) * 8 AS BIGINT) AS width,
            CAST((1 + doc_id % 3) * 8 AS BIGINT) AS height,
            CAST((2 + doc_id % 2) * (1 + doc_id % 3) * 64 AS BIGINT)
                AS n_samples,
            CAST(64 * list_sum(list_transform(
                     range(CAST(2 + doc_id % 2 AS INT)),
                     bx -> list_sum(list_transform(
                         range(CAST(1 + doc_id % 3 AS INT)),
                         by -> (doc_id * 31 + bx * 17 + by * 29)
                               % 256))))
                 AS BIGINT) AS sample_sum
        FROM documents"""

    # curation cube: same bucket CASE + token count, plain GROUP BY
    sql["doc_quality_cube"] = f"""
        SELECT lang AS "lang.lang",
            CASE WHEN n_chars < 250 THEN 'short'
                 WHEN n_chars < 350 THEN 'medium' ELSE 'long' END
                AS "len_bucket.len_bucket",
            COUNT(*) AS doc_count,
            CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
            CAST(SUM(len({_TOKENS})) AS BIGINT) AS tokens_sum
        FROM documents
        WHERE source IN ('src1', 'src2', 'src3', 'src4', 'src5')
        GROUP BY 1, 2"""

    # zlib shards inflated for real; byte-exact closed form
    sql["doc_inflate"] = """
        SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
            md5(text) AS payload_md5
        FROM documents"""

    # JSON-lines round-trip: field values closed-form from the source
    sql["doc_jsonl"] = """
        SELECT doc_id, CAST(0 AS BIGINT) AS line_no,
            doc_id AS rec_id, lang AS rec_lang, md5(text) AS text_md5
        FROM documents
        UNION ALL
        SELECT doc_id, CAST(1 AS BIGINT), doc_id + 1000000, 'und',
            md5(substr(text, 1, 100))
        FROM documents"""

    # streaming quality rollup == batch quality rollup (bounded replay)
    sql["docs_stream_quality"] = f"""
        WITH base AS ({_text_stats_sql()}),
        d AS ({_TEXT_STATS_DERIVED})
        SELECT doc.lang,
            CAST(CASE WHEN d.quality_score >= 0.5 THEN 1 ELSE 0 END
                 AS BIGINT) AS passed,
            COUNT(*) AS n_docs,
            CAST(SUM(doc.n_chars) AS BIGINT) AS total_chars
        FROM d JOIN documents doc USING (doc_id)
        GROUP BY 1, 2"""

    # mixture sampling: identical per-stratum hash predicate
    sql["doc_mixture"] = """
        SELECT lang, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE CAST(concat('0x', substr(md5(concat('mixture:',
                CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 1000
              < CASE lang WHEN 'en' THEN 800 WHEN 'de' THEN 500
                          WHEN 'fr' THEN 300 ELSE 100 END
        GROUP BY 1"""

    # incremental dedup: same normalized-content anti-join
    sql["doc_incremental_dedup"] = r"""
        SELECT lang, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents f
        WHERE f.doc_id % 4 <> 0
          AND md5(regexp_replace(lower(trim(f.text)), '\s+', ' ', 'g'))
              NOT IN (
                SELECT md5(regexp_replace(lower(trim(r.text)),
                                          '\s+', ' ', 'g'))
                FROM documents r WHERE r.doc_id % 4 = 0)
        GROUP BY 1"""

    # hash-Bernoulli sample: identical portable-hash predicate
    sql["doc_sample"] = """
        SELECT lang, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE CAST(concat('0x', substr(md5(concat('sample:',
                CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
              % 1000 < 250
        GROUP BY 1"""

    # stratified sample: identical rank-by-portable-hash selection

    # C4-style line dedup: same 20-token lines, same integral
    # first-occurrence window, reassembly via ordered string_agg
    sql["doc_line_dedup"] = f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS t FROM documents),
        nl AS (
            SELECT doc_id, t,
                greatest(1, (len(t) + 19) // 20) AS n
            FROM toks),
        lines AS (
            SELECT doc_id, CAST(u.i AS BIGINT) AS line_idx,
                array_to_string(
                    list_slice(t, CAST(u.i * 20 + 1 AS BIGINT),
                               CAST(u.i * 20 + 20 AS BIGINT)),
                    ' ') AS line_text
            FROM nl, UNNEST(range(CAST(n AS BIGINT))) AS u(i)),
        with_doc AS (
            SELECT doc_id, line_idx, line_text,
                MIN(doc_id) OVER (PARTITION BY line_text) AS min_doc
            FROM lines),
        kept AS (
            SELECT doc_id, line_idx, line_text,
                doc_id = min_doc AND line_idx = MIN(
                    CASE WHEN doc_id = min_doc THEN line_idx END)
                    OVER (PARTITION BY line_text) AS keep
            FROM with_doc)
        SELECT doc_id,
            CAST(COUNT(*) AS BIGINT) AS n_lines,
            CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                AS n_lines_kept,
            COALESCE(string_agg(line_text, ' ' ORDER BY line_idx)
                     FILTER (WHERE keep), '') AS cleaned_text
        FROM kept GROUP BY doc_id"""

    # deterministic shuffle: same md5 hash, same shard mod, same rank
    sql["doc_shuffle_shards"] = """
        WITH h AS (
            SELECT doc_id,
                CAST(concat('0x', substr(md5(concat('shuffle:',
                    CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                    AS hv
            FROM documents)
        SELECT doc_id, CAST(hv % 8 AS BIGINT) AS shard,
            CAST(row_number() OVER (PARTITION BY hv % 8
                ORDER BY hv ASC, doc_id ASC) AS BIGINT) AS position
        FROM h"""


    # TF-IDF: same tf / df / smoothed-idf doubles, same rank window
    sql["doc_tfidf"] = f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKENS}) AS term FROM documents),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks GROUP BY doc_id, term),
        docfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, term, tf,
            round(CAST(tf AS DOUBLE)
                  * ln((n.n_docs + 1) / CAST(df + 1 AS DOUBLE)), 6)
                AS score,
            CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT t.doc_id, t.term, t.tf, d.df,
                row_number() OVER (PARTITION BY t.doc_id
                    ORDER BY CAST(t.tf AS DOUBLE)
                        * ln(((SELECT n_docs FROM n) + 1)
                             / CAST(d.df + 1 AS DOUBLE)) DESC,
                        t.term ASC) AS rank
            FROM tf t JOIN docfreq d USING (term)
        ) ranked, n
        WHERE rank <= 5"""


    # feature hashing: same two md5 hashes, same fold, same rounding
    sql["doc_embed"] = f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS t FROM documents),
        contribs AS (
            SELECT doc_id,
                list_transform(t, x -> struct_pack(
                    c := CAST(concat('0x', substr(md5(concat('feat:',
                        x)), 1, 15)) AS BIGINT) % 16,
                    s := CASE WHEN CAST(concat('0x',
                        substr(md5(concat('feat#:', x)), 1, 8))
                        AS BIGINT) % 2 = 0
                        THEN 1.0 ELSE -1.0 END)) AS cs
            FROM toks),
        rawv AS (
            SELECT doc_id,
                list_transform(range(16), d ->
                    list_sum(list_transform(cs, e ->
                        CASE WHEN e.c = d THEN e.s ELSE 0.0 END)))
                    AS raw
            FROM contribs),
        unitv AS (
            SELECT doc_id,
                sqrt(list_sum(list_transform(raw, x -> x * x)))
                    AS nrm,
                raw
            FROM rawv)
        SELECT doc_id,
            round(CASE WHEN nrm > 0
                  THEN raw[CAST(doc_id % 16 AS INT) + 1] / nrm
                  ELSE raw[CAST(doc_id % 16 AS INT) + 1] END, 6)
                AS probe_component,
            CAST(len(list_filter(
                CASE WHEN nrm > 0
                     THEN list_transform(raw, x -> x / nrm)
                     ELSE raw END,
                x -> x != 0.0)) AS BIGINT) AS n_nonzero
        FROM unitv"""

    sql["doc_domain_cap"] = """
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
        QUALIFY row_number() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id ASC) <= 10"""

    sql["doc_stratified"] = """
        SELECT doc_id, lang FROM documents
        QUALIFY row_number() OVER (PARTITION BY lang
            ORDER BY CAST(concat('0x', substr(md5(concat('strata:',
                CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) ASC,
                doc_id ASC) <= 25"""

    # export->ingest round trip: closed-form member expectations
    sql["doc_webdataset_export"] = """
        SELECT doc_id // 50 AS shard_id,
            CAST(doc_id AS VARCHAR) || '.cls' AS name,
            CAST(strlen(lang) AS BIGINT) AS size,
            md5(lang) AS payload_md5
        FROM documents
        UNION ALL
        SELECT doc_id // 50,
            CAST(doc_id AS VARCHAR) || '.txt',
            CAST(strlen(text) AS BIGINT), md5(text)
        FROM documents"""

    # tar shards parsed for real; closed-form member expectations
    sql["doc_tar_shards"] = """
        SELECT doc_id, CAST(0 AS BIGINT) AS member_idx,
            'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS name,
            CAST(strlen(text) AS BIGINT) AS size,
            md5(text) AS payload_md5
        FROM documents
        UNION ALL
        SELECT doc_id, CAST(1 AS BIGINT),
            'doc_' || CAST(doc_id AS VARCHAR) || '.cls',
            CAST(strlen(lang) AS BIGINT), md5(lang)
        FROM documents"""

    # composed web pipeline: stats of the closed-form expected text
    sql["doc_warc_pipeline"] = r"""
        WITH t AS (
            SELECT doc_id,
                trim(regexp_replace(
                    'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || source
                        || ' ' || text,
                    '\s+', ' ', 'g')) AS expected
            FROM documents)
        SELECT doc_id,
            CAST(length(expected) AS BIGINT) AS text_len,
            CAST(len(CASE WHEN trim(expected) = '' THEN []
                ELSE string_split_regex(trim(expected), '\s+') END)
                AS BIGINT) AS n_tokens,
            md5(expected) AS text_md5
        FROM t"""

    # WARC shards parsed for real; closed-form record expectations
    sql["doc_warc_extract"] = """
        SELECT doc_id, CAST(2 AS BIGINT) AS n_records,
            'http://example.com/doc/' || CAST(doc_id AS VARCHAR)
                AS target_uri,
            CAST(200 AS BIGINT) AS http_status,
            'text/plain; charset=utf-8' AS content_type,
            CAST(strlen(text) AS BIGINT) AS body_len,
            md5(text) AS body_md5
        FROM documents"""

    # HTML strip inverts the in-plan escape: closed-form expected text
    sql["doc_html_text"] = r"""
        WITH t AS (
            SELECT doc_id,
                trim(regexp_replace(
                    'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || source
                        || ' ' || text || ' next',
                    '\s+', ' ', 'g')) AS expected
            FROM documents)
        SELECT doc_id,
            CAST(length(expected) AS BIGINT) AS text_len,
            md5(expected) AS text_md5,
            CAST(1 AS BIGINT) AS n_links,
            'https://example.com/doc/' || CAST(doc_id + 1 AS VARCHAR)
                AS first_link
        FROM t"""

    # XLSX round-trip: values recovered from the parsed workbook grid
    sql["xlsx_roundtrip"] = f"""
        SELECT l_returnflag AS "returnflag.returnflag",
            COUNT(*) AS fact_count,
            CAST(SUM({_DEC_QTY}) AS DOUBLE) AS quantity_sum
        FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 1"""

    # namespaced cube == root cube on the same store
    sql["namespace_agg"] = f"""
        SELECT l_returnflag AS "returnflag.returnflag",
            CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS price_sum,
            COUNT(*) AS fact_count
        FROM lineitem GROUP BY 1"""

    sql["agg_set_cut"] = f"""
        SELECT l_returnflag AS "returnflag.returnflag",
            CAST(SUM({_DEC_QTY}) AS DOUBLE) AS quantity_sum,
            COUNT(*) AS fact_count
        FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1"""

    sql["agg_invert_cut"] = f"""
        SELECT l_returnflag AS "returnflag.returnflag",
            l_linestatus AS "linestatus.linestatus",
            CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS price_sum,
            COUNT(*) AS fact_count
        FROM lineitem WHERE NOT (l_returnflag IN ('A', 'R'))
        GROUP BY 1, 2"""

    sql["agg_range_cut"] = """
        SELECT CAST(year(l_shipdate) AS BIGINT) AS "date.year",
            CAST(month(l_shipdate) AS BIGINT) AS "date.month",
            COUNT(*) AS fact_count
        FROM lineitem
        WHERE (year(l_shipdate) > 1995 OR
               (year(l_shipdate) = 1995 AND month(l_shipdate) >= 3))
          AND (year(l_shipdate) < 1996 OR
               (year(l_shipdate) = 1996 AND month(l_shipdate) <= 8))
        GROUP BY 1, 2"""

    sql["agg_half_open_range"] = """
        SELECT CAST(year(l_shipdate) AS BIGINT) AS "date.year",
            COUNT(*) AS fact_count
        FROM lineitem
        WHERE (year(l_shipdate) > 2000 OR
               (year(l_shipdate) = 2000 AND month(l_shipdate) >= 6))
        GROUP BY 1"""

    sql["agg_snowflake"] = f"""
        SELECT r.r_regionkey AS "customer_geo.region_key",
            r.r_name AS "customer_geo.region_name",
            CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS price_sum,
            COUNT(*) AS fact_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2"""

    sql["agg_roleplay"] = """
        SELECT cn.n_nationkey AS "customer_geo.nation_key",
            cn.n_name AS "customer_geo.nation_name",
            sr.r_regionkey AS "supplier_geo.region_key",
            sr.r_name AS "supplier_geo.region_name",
            COUNT(*) AS fact_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN region sr ON sn.n_regionkey = sr.r_regionkey
        GROUP BY 1, 2, 3, 4"""

    sql["agg_expression"] = f"""
        SELECT l_returnflag AS "returnflag.returnflag",
            CAST(SUM({_DEC_PRICE} * (1 - {_DEC_DISC})) AS DOUBLE)
                AS discounted_price_sum,
            CAST(SUM({_DEC_PRICE} * (1 - {_DEC_DISC}) * (1 + {_DEC_TAX}))
                AS DOUBLE) AS charge_sum
        FROM lineitem GROUP BY 1"""

    sql["agg_order_page"] = f"""
        SELECT * FROM (
            SELECT CAST(year(l_shipdate) AS BIGINT) AS "date.year",
                CAST(month(l_shipdate) AS BIGINT) AS "date.month",
                CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS price_sum
            FROM lineitem GROUP BY 1, 2
        ) ORDER BY price_sum DESC, "date.year", "date.month"
        LIMIT 5 OFFSET 5"""

    sql["agg_minmax"] = f"""
        SELECT l_returnflag AS "returnflag.returnflag",
            CAST(MIN({_DEC_PRICE}) AS DOUBLE) AS price_min,
            CAST(MAX({_DEC_PRICE}) AS DOUBLE) AS price_max,
            COUNT(DISTINCT l_partkey) AS part_count_distinct
        FROM lineitem GROUP BY 1"""

    sql["agg_avg_var"] = f"""
        SELECT l_returnflag AS "returnflag.returnflag",
            CAST(SUM({_DEC_QTY}) AS DOUBLE) / COUNT(l_quantity)
                AS quantity_avg,
            (CAST(SUM({_DEC_QTY} * {_DEC_QTY}) AS DOUBLE)
             - CAST(SUM({_DEC_QTY}) AS DOUBLE)
               * CAST(SUM({_DEC_QTY}) AS DOUBLE)
               / CAST(COUNT(l_quantity) AS DOUBLE))
            / (CAST(COUNT(l_quantity) AS DOUBLE) - 1.0) AS quantity_var,
            sqrt((CAST(SUM({_DEC_QTY} * {_DEC_QTY}) AS DOUBLE)
             - CAST(SUM({_DEC_QTY}) AS DOUBLE)
               * CAST(SUM({_DEC_QTY}) AS DOUBLE)
               / CAST(COUNT(l_quantity) AS DOUBLE))
            / (CAST(COUNT(l_quantity) AS DOUBLE) - 1.0)) AS quantity_std
        FROM lineitem GROUP BY 1"""

    sql["agg_split"] = f"""
        SELECT l_returnflag AS "returnflag.returnflag",
            year(l_shipdate) = 1995 AS __within_split__,
            CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS price_sum,
            COUNT(*) AS fact_count
        FROM lineitem GROUP BY 1, 2"""

    sql["agg_relative_time"] = f"""
        SELECT CAST(year(l_shipdate) AS BIGINT) AS "date.year",
            CAST(month(l_shipdate) AS BIGINT) AS "date.month",
            CAST(day(l_shipdate) AS BIGINT) AS "date.day",
            CAST(SUM({_DEC_QTY}) AS DOUBLE) AS quantity_sum,
            COUNT(*) AS fact_count
        FROM lineitem
        WHERE year(l_shipdate) = 1996 AND month(l_shipdate) = 5
        GROUP BY 1, 2, 3"""

    sql["topk_customers"] = f"""
        SELECT * FROM (
            SELECT r.r_regionkey AS "customer_geo.region_key",
                r.r_name AS "customer_geo.region_name",
                n.n_nationkey AS "customer_geo.nation_key",
                n.n_name AS "customer_geo.nation_name",
                c.c_custkey AS "customer_geo.customer_key",
                c.c_name AS "customer_geo.customer_name",
                c.c_mktsegment AS "customer_geo.mktsegment",
                CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS price_sum
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2, 3, 4, 5, 6, 7
        ) ORDER BY price_sum DESC,
            "customer_geo.region_key", "customer_geo.nation_key",
            "customer_geo.customer_key"
        LIMIT 5"""

    sql["members"] = """
        SELECT DISTINCT r.r_regionkey AS "customer_geo.region_key",
            r.r_name AS "customer_geo.region_name",
            n.n_nationkey AS "customer_geo.nation_key",
            n.n_name AS "customer_geo.nation_name"
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_regionkey = 2"""

    sql["facts_page"] = f"""
        SELECT l_orderkey AS fact_key,
            CAST(l_linenumber AS BIGINT) AS linenumber,
            CAST({_DEC_QTY} AS DOUBLE) AS quantity,
            CAST({_DEC_PRICE} AS DOUBLE) AS extendedprice,
            l_returnflag AS "returnflag.returnflag"
        FROM lineitem
        WHERE year(l_shipdate) = 1995 AND month(l_shipdate) = 1
        ORDER BY 1, 2 LIMIT 50"""

    sql["fact_list"] = f"""
        SELECT l_orderkey AS fact_key,
            CAST(l_linenumber AS BIGINT) AS linenumber,
            CAST({_DEC_QTY} AS DOUBLE) AS quantity,
            l_returnflag AS "returnflag.returnflag"
        FROM lineitem
        WHERE l_orderkey IN (1, 2, 3, 5, 8, 13, 21, 34)"""

    ym_base = f"""
            SELECT CAST(year(l_shipdate) AS BIGINT) AS "date.year",
                CAST(month(l_shipdate) AS BIGINT) AS "date.month",
                CAST(SUM({_DEC_PRICE}) AS DECIMAL(18,2)) AS dec_price_sum
            FROM lineitem GROUP BY 1, 2"""
    ym_win = 'ORDER BY "date.year", "date.month" ROWS BETWEEN 2 PRECEDING AND CURRENT ROW'

    sql["calc_pctchange"] = f"""
        SELECT "date.year", "date.month",
            CAST(dec_price_sum AS DOUBLE) AS price_sum,
            CASE WHEN lag(dec_price_sum) OVER (
                     ORDER BY "date.year", "date.month") IS NOT NULL
                  AND lag(dec_price_sum) OVER (
                     ORDER BY "date.year", "date.month") <> 0
            THEN round((CAST(dec_price_sum AS DOUBLE)
                        - CAST(lag(dec_price_sum) OVER (
                              ORDER BY "date.year", "date.month")
                          AS DOUBLE))
                       / CAST(lag(dec_price_sum) OVER (
                             ORDER BY "date.year", "date.month")
                         AS DOUBLE), 4) END AS price_pct_change
        FROM ({ym_base})"""

    sql["calc_rsum"] = f"""
        SELECT "date.year", "date.month",
            CAST(dec_price_sum AS DOUBLE) AS price_sum,
            CAST(SUM(dec_price_sum) OVER (
                ORDER BY "date.year", "date.month"
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS price_rsum
        FROM ({ym_base})"""

    sql["calc_ptot"] = f"""
        WITH rym AS (
            SELECT r.r_regionkey AS "customer_geo.region_key",
                r.r_name AS "customer_geo.region_name",
                CAST(year(l.l_shipdate) AS BIGINT) AS "date.year",
                CAST(month(l.l_shipdate) AS BIGINT) AS "date.month",
                CAST(SUM({_DEC_PRICE}) AS DECIMAL(18,2))
                    AS dec_price_sum
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2, 3, 4
        )
        SELECT "customer_geo.region_key", "customer_geo.region_name",
            "date.year", "date.month",
            CAST(dec_price_sum AS DOUBLE) AS price_sum,
            round(CAST(dec_price_sum AS DOUBLE)
                  / CAST(SUM(dec_price_sum) OVER (
                        PARTITION BY "customer_geo.region_key")
                    AS DOUBLE), 4) AS price_ptot
        FROM rym"""

    sql["calc_sma"] = f"""
        SELECT "date.year", "date.month",
            CAST(dec_price_sum AS DOUBLE) AS price_sum,
            round(CAST(SUM(dec_price_sum) OVER w AS DOUBLE)
                  / COUNT(*) OVER w, 2) AS price_sma
        FROM ({ym_base}) WINDOW w AS ({ym_win})"""

    sql["calc_sms"] = f"""
        SELECT "date.year", "date.month",
            CAST(dec_price_sum AS DOUBLE) AS price_sum,
            CAST(SUM(dec_price_sum) OVER w AS DOUBLE) AS price_sms
        FROM ({ym_base}) WINDOW w AS ({ym_win})"""

    sql["calc_wma"] = f"""
        SELECT "date.year", "date.month",
            CAST(dec_price_sum AS DOUBLE) AS price_sum,
            round(
                CAST(list_sum(list_transform(
                    list_zip(vals, generate_series(1, len(vals))),
                    p -> p[1] * p[2])) AS DOUBLE)
                / (CAST(len(vals) * (len(vals) + 1) AS DOUBLE) / 2.0),
                4) AS price_wma
        FROM (
            SELECT "date.year", "date.month", dec_price_sum,
                list(CAST(dec_price_sum AS DOUBLE)) OVER w AS vals
            FROM ({ym_base}) WINDOW w AS ({ym_win})
        )"""

    # EWMA alpha=1/2: weight of vals[i] (oldest->newest, 1-based) is
    # 2^(i-1), normalizer 2^n - 1 — powers of two are exact doubles,
    # so this replays Spark's _ewma_column bit-for-bit.
    sql["calc_ewma"] = f"""
        SELECT "date.year", "date.month",
            CAST(dec_price_sum AS DOUBLE) AS price_sum,
            round(
                CAST(list_sum(list_transform(
                    list_zip(vals, generate_series(1, len(vals))),
                    p -> p[1] * pow(2.0, p[2] - 1))) AS DOUBLE)
                / (pow(2.0, len(vals)) - 1.0),
                4) AS price_ewma
        FROM (
            SELECT "date.year", "date.month", dec_price_sum,
                list(CAST(dec_price_sum AS DOUBLE)) OVER w AS vals
            FROM ({ym_base}) WINDOW w AS ({ym_win})
        )"""

    # CAST(decimal AS VARCHAR) then to DOUBLE: DuckDB's direct
    # decimal->double cast double-rounds (int128 to double, then divide
    # by 10^scale); the string parse is correctly rounded, matching
    # Spark's BigDecimal.doubleValue exactly.
    var_expr = """(CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)"""
    calc_var_base = f"""
        SELECT "date.year", "date.month", dec_price_sum,
            SUM(dec_price_sum) OVER w AS s,
            SUM(CAST(dec_price_sum AS DECIMAL(19,2))
                * CAST(dec_price_sum AS DECIMAL(19,2))) OVER w AS s2,
            COUNT(*) OVER w AS n
        FROM ({ym_base}) WINDOW w AS ({ym_win})"""

    # Exact replica of Spark's F.round(double, 2) — BigDecimal on the
    # shortest decimal string, HALF_UP, parsed back.  DuckDB's native
    # round(double, 2) computes x*100 first, whose float error misrounds
    # values of this magnitude (~1e12) near .xx5 boundaries.
    smvar_raw = f"CASE WHEN n < 2 THEN 0.0 ELSE {var_expr} END"
    sql["calc_smvar"] = f"""
        SELECT "date.year", "date.month",
            CAST(dec_price_sum AS DOUBLE) AS price_sum,
            CAST(CAST(CAST(CAST(({smvar_raw}) AS VARCHAR)
                 AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS price_smvar
        FROM ({calc_var_base})"""

    sql["calc_smstd"] = f"""
        SELECT "date.year", "date.month",
            CAST(dec_price_sum AS DOUBLE) AS price_sum,
            round(CASE WHEN n < 2 THEN 0.0
                  ELSE sqrt({var_expr}) END, 2) AS price_smstd
        FROM ({calc_var_base})"""

    sql["calc_smrsd"] = f"""
        SELECT "date.year", "date.month",
            CAST(dec_price_sum AS DOUBLE) AS price_sum,
            CASE WHEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) > 0
                 THEN round((CASE WHEN n < 2 THEN 0.0
                             ELSE sqrt({var_expr}) END)
                      / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 4)
                 ELSE 0.0 END AS price_smrsd
        FROM ({calc_var_base})"""

    sql["rollup_ym"] = f"""
        SELECT CAST(GROUPING(year) * 2 + GROUPING(month) AS BIGINT)
                AS grouping_id,
            year, month,
            CAST(SUM(dec_qty) AS DOUBLE) AS quantity_sum
        FROM (
            SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
                CAST(month(l_shipdate) AS BIGINT) AS month,
                SUM({_DEC_QTY}) AS dec_qty
            FROM lineitem GROUP BY 1, 2
        ) GROUP BY ROLLUP (year, month)"""

    sql["cube_flags"] = """
        SELECT CAST(GROUPING(returnflag) * 2 + GROUPING(linestatus)
                AS BIGINT) AS grouping_id,
            returnflag, linestatus,
            COUNT(*) AS fact_count
        FROM (
            SELECT l_returnflag AS returnflag, l_linestatus AS linestatus
            FROM lineitem
        ) GROUP BY CUBE (returnflag, linestatus)"""

    sql["preagg_year"] = f"""
        SELECT CAST(year(l_shipdate) AS BIGINT) AS "date.year",
            CAST(SUM({_DEC_QTY}) AS DOUBLE) AS quantity_sum,
            CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS price_sum,
            COUNT(*) AS fact_count
        FROM lineitem GROUP BY 1"""

    sql["grouping_sets"] = f"""
        SELECT returnflag, linestatus,
            CAST(SUM(dec_qty) AS DOUBLE) AS quantity_sum
        FROM (
            SELECT l_returnflag AS returnflag,
                l_linestatus AS linestatus,
                SUM({_DEC_QTY}) AS dec_qty
            FROM lineitem GROUP BY 1, 2
        ) GROUP BY GROUPING SETS ((returnflag), (linestatus))"""

    sql["events_sliding"] = """
        SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR * h.o
                AS window_start,
            event_type,
            COUNT(*) AS n_events,
            CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum
        FROM events, (SELECT unnest([0, 1]) AS o) h
        GROUP BY 1, 2"""

    sql["doc_common_ngrams"] = f"""
        SELECT shingle, COUNT(*) AS doc_freq
        FROM (
            SELECT doc_id,
                unnest(list_distinct(list_transform(
                    generate_series(1, greatest(length({_NORM}) - 4, 1)),
                    i -> substr({_NORM}, i, 5)))) AS shingle
            FROM documents
        )
        GROUP BY 1 ORDER BY doc_freq DESC, shingle ASC LIMIT 20"""

    sql["doc_quality_filter"] = f"""
        WITH base AS ({_text_stats_sql()}),
        derived AS ({_TEXT_STATS_DERIVED})
        SELECT b.doc_id, b.lang, d.n_tokens, d.quality_score
        FROM base b JOIN derived d ON b.doc_id = d.doc_id
        WHERE d.quality_score >= 0.5"""

    sql["crosstab"] = """
        SELECT l_returnflag AS returnflag,
            COUNT(*) FILTER (WHERE l_linestatus = 'F') AS "F",
            COUNT(*) FILTER (WHERE l_linestatus = 'O') AS "O"
        FROM lineitem GROUP BY 1"""

    sql["events_hourly"] = """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
            COUNT(*) AS n_events,
            CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum,
            COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2"""

    sql["events_stream_hourly"] = """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
            COUNT(*) AS n_events,
            CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum
        FROM events GROUP BY 1, 2"""

    sql["events_type_stats"] = """
        SELECT event_type,
            COUNT(*) AS n_events,
            CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum,
            MIN(value) AS value_min,
            MAX(value) AS value_max,
            COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1"""

    sql["doc_text_stats"] = (
        f"WITH base AS ({_text_stats_sql()}) {_TEXT_STATS_DERIVED}"
    )

    sql["doc_bpe_tokens"] = r"""
        SELECT doc_id,
            CAST(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+')) END
                 AS BIGINT) AS n_ws_tokens,
            CAST(len(regexp_extract_all(text,
                '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+'))
                 AS BIGINT) AS n_bpe_tokens
        FROM documents"""

    sql["doc_lang_quality"] = f"""
        WITH base AS ({_text_stats_sql()}),
        derived AS ({_TEXT_STATS_DERIVED})
        SELECT b.lang, COUNT(*) AS n_docs,
            CAST(SUM(d.n_tokens) AS BIGINT) AS total_tokens,
            -- integer basis points: exact long sum on both engines,
            -- single double division at the end (matches the Spark side
            -- bit-for-bit; see q_doc_lang_quality)
            CAST(SUM(CAST(round(d.quality_score * 10000) AS BIGINT))
                 / 10000.0 AS DOUBLE) AS quality_sum
        FROM base b JOIN derived d ON b.doc_id = d.doc_id
        GROUP BY 1"""

    langid_scores = f"""
        SELECT doc_id,
            list_sum(list_transform({_TOKENS}, t ->
                CASE WHEN lower(t) IN ({_STOP_DE}) THEN 1 ELSE 0 END))
                AS score_de,
            list_sum(list_transform({_TOKENS}, t ->
                CASE WHEN lower(t) IN ({_STOP_EN}) THEN 1 ELSE 0 END))
                AS score_en,
            list_sum(list_transform({_TOKENS}, t ->
                CASE WHEN lower(t) IN ({_STOP_ES}) THEN 1 ELSE 0 END))
                AS score_es,
            list_sum(list_transform({_TOKENS}, t ->
                CASE WHEN lower(t) IN ({_STOP_FR}) THEN 1 ELSE 0 END))
                AS score_fr
        FROM documents"""

    sql["doc_langid"] = f"""
        WITH scores AS ({langid_scores}),
        pred AS (
            SELECT doc_id,
                CASE WHEN greatest(COALESCE(score_de,0), COALESCE(score_en,0),
                                   COALESCE(score_es,0), COALESCE(score_fr,0))
                          = 0 THEN 'und'
                 WHEN COALESCE(score_de,0) >= COALESCE(score_en,0)
                  AND COALESCE(score_de,0) >= COALESCE(score_es,0)
                  AND COALESCE(score_de,0) >= COALESCE(score_fr,0) THEN 'de'
                 WHEN COALESCE(score_en,0) >= COALESCE(score_es,0)
                  AND COALESCE(score_en,0) >= COALESCE(score_fr,0) THEN 'en'
                 WHEN COALESCE(score_es,0) >= COALESCE(score_fr,0) THEN 'es'
                 ELSE 'fr' END AS lang_pred
            FROM scores
        )
        SELECT lang_pred, COUNT(*) AS n_docs FROM pred GROUP BY 1"""

    sql["doc_fingerprint"] = f"""
        SELECT doc_id, {_H64.format(x=_NORM)} AS fingerprint
        FROM documents"""

    sql["doc_exact_dup"] = f"""
        SELECT md5({_NORM}) AS content_hash,
            COUNT(*) AS cluster_size,
            MIN(doc_id) AS canonical_id
        FROM documents GROUP BY 1 HAVING COUNT(*) > 1"""

    sql["doc_minhash"] = f"""
        {_minhash_cte()}
        SELECT id_a, id_b,
            round(CAST(list_sum(list_transform(
                list_zip(sig_a, sig_b),
                p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS DOUBLE)
                / 16.0, 4) AS est_jaccard
        FROM pairs"""

    sql["doc_jaccard"] = f"""
        {_minhash_cte()},
        shingle_sets AS (
            SELECT doc_id,
                list_distinct(list_transform(
                    generate_series(1, greatest(length({_NORM}) - 4, 1)),
                    i -> substr({_NORM}, i, 5))) AS shingles
            FROM documents
        ),
        jac AS (
            SELECT p.id_a, p.id_b,
                round(
                    CAST(len(list_intersect(a.shingles, b.shingles))
                         AS DOUBLE)
                    / len(list_distinct(list_concat(a.shingles, b.shingles))),
                    4) AS jaccard
            FROM pairs p
            JOIN shingle_sets a ON p.id_a = a.doc_id
            JOIN shingle_sets b ON p.id_b = b.doc_id
        )
        SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5"""

    simhash_expr = f"""
        list_sum(list_transform(generate_series(0, 47), b ->
            CASE WHEN list_sum(list_transform(
                CASE WHEN trim(lower(text)) = '' THEN []
                     ELSE string_split_regex(trim(lower(text)), '\\s+') END,
                t -> (({_H64.format(x="t")} >> b) & 1) * 2 - 1)) > 0
            THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))"""

    sql["doc_simhash"] = f"""
        WITH sh AS (
            SELECT doc_id, {simhash_expr} AS simhash FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS distance
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""

    sql["emb_topk"] = _EMB_TOPK_SQL

    sql["emb_near_dup"] = """
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        scored AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, round(cosine, 6) AS cosine
        FROM scored WHERE cosine >= 0.4"""

    # -- formerly pytest-only operators --------------------------------

    sql["agg_summary"] = f"""
        SELECT CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS price_sum,
            CAST(SUM({_DEC_QTY}) AS DOUBLE) AS quantity_sum,
            COUNT(*) AS fact_count
        FROM lineitem WHERE year(l_shipdate) = 1995"""

    # avg / variance / stddev exactly as the decimal-aware registry
    # computes them: exact decimal sums (VARCHAR-routed to double, see
    # calc_smvar note) with one final double formula
    _N = "CAST(COUNT(l_extendedprice) AS DOUBLE)"
    _S1 = f"CAST(CAST(SUM({_DEC_PRICE}) AS VARCHAR) AS DOUBLE)"
    _S2 = (f"CAST(CAST(SUM({_DEC_PRICE} * {_DEC_PRICE})"
           " AS VARCHAR) AS DOUBLE)")
    _PVAR = f"({_S2} - {_S1} * {_S1} / {_N}) / ({_N} - 1.0)"
    sql["agg_registry_stats"] = f"""
        SELECT l_returnflag AS "returnflag.returnflag",
            CAST(CAST(SUM({_DEC_QTY}) AS VARCHAR) AS DOUBLE)
                / CAST(COUNT(l_quantity) AS DOUBLE) AS quantity_avg,
            CAST(CAST(SUM({_DEC_DISC}) AS VARCHAR) AS DOUBLE)
                / CAST(COUNT(l_discount) AS DOUBLE) AS discount_avg,
            sqrt({_PVAR}) AS price_stddev,
            {_PVAR} AS price_variance,
            COUNT(*) AS fact_count
        FROM lineitem GROUP BY 1"""

    sql["cell_count_total"] = """
        SELECT CAST(COUNT(*) AS BIGINT) AS total_cell_count
        FROM (
            SELECT DISTINCT year(l_shipdate), month(l_shipdate)
            FROM lineitem WHERE year(l_shipdate) = 1995
        )"""

    sql["fact_by_key"] = """
        SELECT DISTINCT l.l_orderkey AS fact_key,
            o.o_orderstatus AS "order.status",
            n.n_name AS "customer_geo.nation_name"
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_orderkey = 42"""

    _BIG_PARTS = ("SELECT p_partkey, p_brand, p_retailprice "
                  "FROM part WHERE p_size > 25")

    sql["join_master_brand"] = f"""
        WITH bp AS ({_BIG_PARTS})
        SELECT bp.p_brand AS "bigpart.brand",
            CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,2))) AS DOUBLE)
                AS quantity_sum,
            COUNT(*) AS fact_count
        FROM lineitem l LEFT JOIN bp ON l.l_partkey = bp.p_partkey
        GROUP BY 1"""

    sql["join_detail_brand"] = f"""
        WITH bp AS ({_BIG_PARTS}
            UNION ALL SELECT CAST(-1 AS BIGINT), 'Brand#ZZ', 0.0)
        SELECT bp.p_brand AS "bigpart.brand",
            CAST(SUM(CAST(bp.p_retailprice AS DECIMAL(20,2))) AS DOUBLE)
                AS retailprice_sum,
            COUNT(*) AS fact_count
        FROM lineitem l RIGHT JOIN bp ON l.l_partkey = bp.p_partkey
        GROUP BY 1"""

    sql["join_compound_dqty"] = """
        WITH notes AS (
            SELECT l_orderkey AS o_key, l_linenumber AS l_num,
                l_quantity * 2 AS double_qty
            FROM lineitem
        )
        SELECT l.l_returnflag AS "returnflag.returnflag",
            CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,2))) AS DOUBLE)
                AS quantity_sum,
            CAST(SUM(CAST(n.double_qty AS DECIMAL(20,2))) AS DOUBLE)
                AS dqty_sum
        FROM lineitem l JOIN notes n
            ON l.l_orderkey = n.o_key AND l.l_linenumber = n.l_num
        GROUP BY 1"""

    sql["agg_null_filter"] = f"""
        WITH bp AS ({_BIG_PARTS})
        SELECT bp.p_brand AS "bigpart.brand",
            CAST(SUM(CAST(bp.p_retailprice AS DECIMAL(20,2))) AS DOUBLE)
                AS retailprice_sum,
            CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,2))) AS DOUBLE)
                AS quantity_sum
        FROM lineitem l LEFT JOIN bp ON l.l_partkey = bp.p_partkey
        GROUP BY 1
        HAVING SUM(CAST(bp.p_retailprice AS DECIMAL(20,2))) IS NOT NULL
           AND SUM(CAST(l.l_quantity AS DECIMAL(20,2))) IS NOT NULL"""

    sql["calc_order_norm"] = f"""
        SELECT "date.year", "date.month",
            CAST(dec_price_sum AS DOUBLE) AS price_sum,
            round(CAST(SUM(dec_price_sum) OVER w AS DOUBLE)
                  / COUNT(*) OVER w, 2) AS price_sma
        FROM ({ym_base})
        WINDOW w AS (ORDER BY "date.month" DESC, "date.year"
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"""

    sql["members_locale"] = """
        SELECT DISTINCT r.r_regionkey AS "customer_geo.region_key",
            r.r_name AS "customer_geo.region_name",
            n.n_nationkey AS "customer_geo.nation_key",
            upper(n.n_name) AS "customer_geo.nation_name"
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_regionkey = 2"""

    sql["schema_inspect"] = """
        SELECT table_name, column_name,
            CAST(ordinal_position AS BIGINT) AS ordinal
        FROM information_schema.columns
        WHERE table_name IN ('region', 'nation', 'customer', 'supplier',
                             'part', 'orders', 'lineitem')"""

    sql["denorm_sink"] = f"""
        SELECT l_returnflag AS returnflag,
            CAST(SUM({_DEC_QTY}) AS DOUBLE) AS quantity_sum,
            COUNT(*) AS fact_count
        FROM lineitem GROUP BY 1"""

    sql["cuboid_enum"] = """
        SELECT * FROM (VALUES
            ('cuboid', CAST(1 AS BIGINT), 'date|customer_geo|part'),
            ('cuboid', CAST(2 AS BIGINT), 'date|customer_geo'),
            ('cuboid', CAST(3 AS BIGINT), 'date|part'),
            ('cuboid', CAST(4 AS BIGINT), 'date'),
            ('levels', CAST(1 AS BIGINT), 'year|region'),
            ('levels', CAST(2 AS BIGINT), 'year|region,nation'),
            ('levels', CAST(3 AS BIGINT), 'year|region,nation,customer'),
            ('levels', CAST(4 AS BIGINT), 'year,month|region'),
            ('levels', CAST(5 AS BIGINT), 'year,month|region,nation'),
            ('levels', CAST(6 AS BIGINT),
             'year,month|region,nation,customer'),
            ('levels', CAST(7 AS BIGINT), 'year,month,day|region'),
            ('levels', CAST(8 AS BIGINT), 'year,month,day|region,nation'),
            ('levels', CAST(9 AS BIGINT),
             'year,month,day|region,nation,customer')
        ) AS t(kind, seq, spec)"""

    # closed-form: the engine BUILDS real image bytes from doc_id and
    # parses them back; the oracle derives the answer arithmetically —
    # an independent derivation, so header-parser bugs can't cancel out
    sql["doc_multimodal"] = """
        SELECT doc_id,
            CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS format,
            CAST(100 + doc_id % 900 AS BIGINT) AS width,
            CAST(80 + doc_id % 600 AS BIGINT) AS height
        FROM documents"""

    # pixel decode: payloads are closed-form in doc_id, so the oracle
    # recomputes the expected pixel sums directly — the Spark side must
    # produce identical numbers from ACTUAL decode of the PNG bytes
    sql["doc_pixel_decode"] = """
        WITH px AS (
            SELECT doc_id,
                4 + doc_id % 5 AS w,
                3 + doc_id % 4 AS h,
                list_sum(flatten(list_transform(
                    range(CAST(3 + doc_id % 4 AS INT)), y ->
                        list_transform(range(CAST(4 + doc_id % 5 AS INT)),
                            x -> (doc_id * 7 + x * 13 + y * 31) % 256))))
                    AS ssum
            FROM documents)
        SELECT doc_id,
            CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
            CAST(w * h AS BIGINT) AS n_samples,
            CAST(ssum AS BIGINT) AS sample_sum,
            CAST(CAST(ssum AS DOUBLE) / (w * h) AS DOUBLE) AS sample_mean
        FROM px"""

    # custom stateful sessionization: classic gaps-and-islands replay;
    # value sums are floor(value*1e6) int64 (order-independent), the
    # sequence is the first 8 event types in (ts, event_id) order, and
    # each user's LAST session is dropped (it is still open in
    # GroupState under the append contract)
    sql["doc_pagerank"] = _guarded_oracle(_pagerank_oracle, "doc_pagerank")

    # unicode canonicalization: DuckDB nfc_normalize replays NFC
    sql["doc_normalize"] = """
        SELECT doc_id,
            CAST(length(nfc_normalize(text || ' caf' || 'e'
                 || chr(769))) AS BIGINT) AS n_chars_norm,
            md5(nfc_normalize(text || ' caf' || 'e' || chr(769)))
                AS norm_md5
        FROM documents"""

    # ordered funnel: min-after-min CTE chain, strict > at each hop
    sql["events_funnel"] = """
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN s1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
        SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
            (SELECT COUNT(*) FROM s1) AS n_users
        UNION ALL
        SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        UNION ALL
        SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)"""

    # weekly cohort retention triangle (epoch-week integer buckets)
    sql["events_cohorts"] = """
        WITH tagged AS (
            SELECT user_id,
                CAST(floor(epoch(ts) / 604800) AS BIGINT) AS p
            FROM events),
        first AS (
            SELECT user_id, MIN(p) AS c FROM tagged GROUP BY 1)
        SELECT CAST(c AS BIGINT) AS cohort,
            CAST(p - c AS BIGINT) AS period_offset,
            COUNT(DISTINCT t.user_id) AS n_users
        FROM tagged t JOIN first USING (user_id)
        GROUP BY 1, 2"""

    # batch sessionization: the same islands, EVERY session kept
    sql["events_sessions_batch"] = """
        WITH e AS (
            SELECT event_id, ts, user_id, event_type,
                CAST(floor(value * 1000000) AS BIGINT) AS uval
            FROM events
        ),
        marked AS (
            SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > 1800000000
                THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *, SUM(new_s) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT user_id,
            MIN(ts) AS session_start, MAX(ts) AS session_end,
            COUNT(*) AS n_events,
            CAST(SUM(uval) AS BIGINT) AS value_usum,
            array_to_string(list_slice(
                list(event_type ORDER BY ts, event_id), 1, 8), '>')
                AS event_seq
        FROM sess GROUP BY user_id, sid"""

    sql["events_sessions"] = """
        WITH e AS (
            SELECT event_id, ts, user_id, event_type,
                CAST(floor(value * 1000000) AS BIGINT) AS uval
            FROM events
        ),
        marked AS (
            SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > 1800000000
                THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *, SUM(new_s) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        ),
        agg AS (
            SELECT user_id, sid,
                MIN(ts) AS session_start, MAX(ts) AS session_end,
                COUNT(*) AS n_events,
                CAST(SUM(uval) AS BIGINT) AS value_usum,
                array_to_string(list_slice(
                    list(event_type ORDER BY ts, event_id), 1, 8), '>')
                    AS event_seq
            FROM sess GROUP BY 1, 2
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY session_start DESC) AS rn
            FROM agg
        )
        SELECT user_id, session_start, session_end, n_events,
            value_usum, event_seq
        FROM ranked WHERE rn > 1"""

    sql["events_browse"] = """
        SELECT year(ts) AS "date.year", month(ts) AS "date.month",
            day(ts) AS "date.day", event_type AS "etype.etype",
            CAST(CAST(SUM(CAST(value AS DECIMAL(20,6))) AS VARCHAR)
                 AS DOUBLE) AS value_sum,
            COUNT(*) AS fact_count
        FROM events
        WHERE year(ts) = 2024 AND month(ts) = 1
        GROUP BY 1, 2, 3, 4"""

    # native session_window: same islands, session_end = max ts + gap,
    # ALL sessions included (batch mode has no open-session state)
    sql["events_sessions_native"] = """
        WITH marked AS (
            SELECT user_id, ts, event_id, value,
                CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= 1800000000
                    THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *, SUM(new_s) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT MIN(ts) AS session_start,
            MAX(ts) + INTERVAL 30 MINUTE AS session_end,
            user_id,
            COUNT(*) AS n_events,
            CAST(CAST(SUM(CAST(value AS DECIMAL(20,6))) AS VARCHAR)
                 AS DOUBLE) AS value_sum
        FROM sess GROUP BY user_id, sid"""

    sql["auth_restricted"] = f"""
        SELECT o.o_orderstatus AS "order.status",
            CAST(SUM({_DEC_QTY.replace("l_", "l.l_")}) AS DOUBLE)
                AS quantity_sum,
            COUNT(*) AS fact_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE year(l.l_shipdate) = 1995 AND l.l_returnflag = 'A'
        GROUP BY 1"""

    sql["json_lines_format"] = """
        WITH agg AS (
            SELECT l_returnflag AS flag, COUNT(*) AS n
            FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 1
        )
        SELECT row_number() OVER (ORDER BY flag) - 1 AS line,
            '{"returnflag.returnflag": "' || flag
                || '", "fact_count": ' || CAST(n AS VARCHAR) || '}'
                AS text
        FROM agg"""

    sql["doc_trigram_lm"] = f"""
        WITH norm AS (
            SELECT doc_id, {_NORM} AS t FROM documents
        ),
        tri AS (
            SELECT doc_id,
                unnest(list_transform(
                    generate_series(1, length(t) - 2),
                    i -> substr(t, i, 3))) AS tg
            FROM norm WHERE length(t) >= 3
        ),
        counts AS (SELECT tg, COUNT(*) AS n FROM tri GROUP BY 1),
        total AS (SELECT SUM(n) AS tot FROM counts),
        model AS (
            SELECT tg, n FROM counts ORDER BY n DESC, tg LIMIT 50000
        )
        SELECT t.doc_id,
            CAST(SUM(CAST(round(log2(
                COALESCE(CAST(m.n AS DOUBLE), 0.5)
                / (SELECT CAST(tot AS DOUBLE) FROM total)) * 10000)
                AS BIGINT)) AS BIGINT) AS sum_logq,
            COUNT(*) AS n_trigrams
        FROM tri t LEFT JOIN model m USING (tg)
        GROUP BY 1"""

    sql["doc_pipeline"] = f"""
        WITH base AS ({_text_stats_sql()}),
        derived AS ({_TEXT_STATS_DERIVED}),
        rep AS (
            SELECT doc_id,
                CASE WHEN len({_TOKENS}) >= 2 THEN
                    1.0 - CAST(len(list_distinct(list_transform(
                        generate_series(1, len({_TOKENS}) - 1),
                        i -> array_to_string(({_TOKENS})[i:i+1], ' '))))
                        AS DOUBLE) / (len({_TOKENS}) - 1)
                ELSE 0.0 END AS frac2
            FROM documents
        ),
        canon AS (
            SELECT doc_id,
                MIN(doc_id) OVER (PARTITION BY md5({_NORM}))
                    AS min_id
            FROM documents
        )
        SELECT b.lang, COUNT(*) AS n_kept,
            CAST(SUM(d.n_tokens) AS BIGINT) AS total_tokens
        FROM base b
        JOIN derived d ON b.doc_id = d.doc_id
        JOIN rep r ON b.doc_id = r.doc_id
        JOIN canon c ON b.doc_id = c.doc_id
        WHERE d.quality_score >= 0.5
          AND round(r.frac2, 4) < 0.3
          AND c.doc_id = c.min_id
        GROUP BY 1"""

    sql["doc_repetition"] = """
        WITH toks AS (
            SELECT doc_id,
                CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                     ELSE string_split_regex(trim(text), '\\s+') END
                    AS tk
            FROM documents
        )
        SELECT doc_id,
            round(CASE WHEN len(tk) >= 2 THEN
                1.0 - CAST(len(list_distinct(list_transform(
                    generate_series(1, len(tk) - 1),
                    i -> array_to_string(tk[i:i+1], ' ')))) AS DOUBLE)
                    / (len(tk) - 1)
                ELSE 0.0 END, 4) AS dup_ngram_frac_2,
            round(CASE WHEN len(tk) >= 3 THEN
                1.0 - CAST(len(list_distinct(list_transform(
                    generate_series(1, len(tk) - 2),
                    i -> array_to_string(tk[i:i+2], ' ')))) AS DOUBLE)
                    / (len(tk) - 2)
                ELSE 0.0 END, 4) AS dup_ngram_frac_3
        FROM toks"""

    _EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    _IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    _PHONE = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
    sql["doc_pii"] = f"""
        SELECT doc_id,
            CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS BIGINT)
                AS n_email,
            CAST(len(regexp_extract_all(text, '{_IPV4}')) AS BIGINT)
                AS n_ipv4,
            CAST(len(regexp_extract_all(text, '{_PHONE}')) AS BIGINT)
                AS n_phone,
            md5(regexp_replace(regexp_replace(regexp_replace(text,
                '{_EMAIL}', '[EMAIL]', 'g'),
                '{_IPV4}', '[IPV4]', 'g'),
                '{_PHONE}', '[PHONE]', 'g')) AS redacted_hash
        FROM documents"""

    # winnowing replica: same normalization, same md5-derived gram
    # hashes, same window-min selection; xor is associative so
    # list_reduce equals Spark's 0-seeded fold
    sql["doc_winnow"] = """
        WITH norm AS (
            SELECT doc_id,
                regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
            FROM documents WHERE doc_id % 5 = 0
        ),
        grams AS (
            SELECT doc_id,
                list_transform(
                    generate_series(1, greatest(length(t) - 7, 1)),
                    i -> CAST(concat('0x',
                         substr(md5(substr(t, i, 8)), 1, 15)) AS BIGINT)
                ) AS g
            FROM norm
        ),
        minima AS (
            SELECT doc_id,
                list_distinct(list_transform(
                    generate_series(1, greatest(len(g) - 15, 1)),
                    j -> list_min(g[j:j+15])
                )) AS fps
            FROM grams
        )
        SELECT doc_id,
            CAST(len(fps) AS BIGINT) AS n_fingerprints,
            CAST(list_reduce(fps, (a, b) -> xor(a, b)) AS BIGINT)
                AS fp_xor
        FROM minima"""

    sql["preagg_refresh"] = f"""
        SELECT year(l_shipdate) AS year,
            CAST(SUM({_DEC_QTY}) AS DOUBLE) AS quantity_sum,
            COUNT(*) AS fact_count
        FROM lineitem GROUP BY 1"""

    sql["salted_join"] = f"""
        SELECT p.p_brand AS brand,
            CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,2))) AS DOUBLE)
                AS quantity_sum,
            COUNT(*) AS fact_count
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1"""

    sql["doc_ssjoin"] = f"""
        WITH t AS (
            SELECT doc_id, list_distinct({_TOKENS}) AS s
            FROM documents WHERE doc_id < 300
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(len(list_intersect(a.s, b.s)) AS BIGINT)
                AS inter_size,
            CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
                 AS BIGINT) AS union_size
        FROM t a JOIN t b ON a.doc_id < b.doc_id
        WHERE len(a.s) > 0 AND len(b.s) > 0
          AND len(list_intersect(a.s, b.s)) * 1000000
              >= 950000 * (len(a.s) + len(b.s)
                           - len(list_intersect(a.s, b.s)))"""

    sql["events_twap"] = """
        WITH e AS (
            SELECT user_id, ts, event_id, value,
                date_trunc('day', ts) AS day
            FROM events WHERE user_id < 40
        ),
        timed AS (
            SELECT user_id, day,
                CAST(round(value * 100) AS BIGINT) AS v_cents,
                COALESCE(
                    date_diff('microsecond', ts, lead(ts) OVER w),
                    date_diff('microsecond', ts,
                              day + INTERVAL 24 HOURS)) AS dur_us
            FROM e WINDOW w AS (PARTITION BY user_id, day
                                ORDER BY ts, event_id)
        )
        SELECT user_id, day,
            CAST(SUM(v_cents * dur_us) AS BIGINT)
                AS weighted_cents_us,
            CAST(SUM(dur_us) AS BIGINT) AS held_us,
            CAST(count(*) AS BIGINT) AS n_events
        FROM timed GROUP BY 1, 2"""

    sql["events_anomaly"] = """
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hour,
                CAST(count(*) AS BIGINT) AS n
            FROM events WHERE event_type = 'error' GROUP BY 1
        ),
        stats AS (
            SELECT hour, n,
                avg(CAST(n AS DOUBLE)) OVER w AS mean,
                count(n) OVER w AS nw,
                SUM(CAST(n AS DOUBLE)) OVER w AS s,
                SUM(CAST(n * n AS DOUBLE)) OVER w AS s2
            FROM hourly
            WINDOW w AS (ORDER BY hour
                         ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        ),
        scored AS (
            SELECT hour, n,
                CASE WHEN nw < 2 THEN 0.0
                     ELSE (s2 - s * s / nw) / (nw - 1.0) END AS var,
                mean
            FROM stats
        )
        SELECT hour, n,
            CAST(round(CASE WHEN sqrt(var) > 0
                 THEN (CAST(n AS DOUBLE) - mean) / sqrt(var) END
                 * 10000) AS BIGINT) AS z_q,
            abs(COALESCE(CASE WHEN sqrt(var) > 0
                 THEN (CAST(n AS DOUBLE) - mean) / sqrt(var) END,
                 0.0)) > 3 AS is_anomaly
        FROM scored"""

    sql["events_paths"] = """
        WITH steps AS (
            SELECT event_type,
                lead(event_type, 1) OVER w AS e2,
                lead(event_type, 2) OVER w AS e3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        counted AS (
            SELECT event_type || '>' || e2 || '>' || e3 AS path,
                CAST(count(*) AS BIGINT) AS n_paths
            FROM steps WHERE e3 IS NOT NULL GROUP BY 1
        )
        SELECT path, n_paths,
            CAST(row_number() OVER (ORDER BY n_paths DESC, path)
                 AS BIGINT) AS rank
        FROM counted ORDER BY rank LIMIT 50"""

    sql["profile_orders"] = """
        SELECT 'o_orderkey' AS column, CAST(count(*) AS BIGINT)
                AS n_rows,
            CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_null,
            CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
            CAST(min(o_orderkey) AS VARCHAR) AS min_value,
            CAST(max(o_orderkey) AS VARCHAR) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(count(*) AS BIGINT),
            CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
            CAST(count(DISTINCT o_custkey) AS BIGINT),
            CAST(min(o_custkey) AS VARCHAR),
            CAST(max(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
            CAST(SUM(CASE WHEN o_orderstatus IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT),
            CAST(count(DISTINCT o_orderstatus) AS BIGINT),
            CAST(min(o_orderstatus) AS VARCHAR),
            CAST(max(o_orderstatus) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
            CAST(SUM(CASE WHEN o_totalprice IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT),
            CAST(count(DISTINCT o_totalprice) AS BIGINT),
            CAST(min(o_totalprice) AS VARCHAR),
            CAST(max(o_totalprice) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
            CAST(SUM(CASE WHEN o_orderpriority IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT),
            CAST(count(DISTINCT o_orderpriority) AS BIGINT),
            CAST(min(o_orderpriority) AS VARCHAR),
            CAST(max(o_orderpriority) AS VARCHAR)
        FROM orders"""

    sql["events_scd2"] = """
        WITH e AS (
            SELECT user_id, ts, event_id, event_type FROM events
            WHERE user_id < 30
        ),
        flagged AS (
            SELECT user_id, ts, event_id, event_type,
                CASE WHEN row_number() OVER w = 1
                       OR (lag(event_type) OVER w
                           IS DISTINCT FROM event_type)
                     THEN 1 ELSE 0 END AS chg
            FROM e WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)
        ),
        ver AS (
            SELECT user_id, ts, event_type,
                SUM(chg) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS version
            FROM flagged
        ),
        runs AS (
            SELECT user_id, version, min(ts) AS valid_from,
                min(event_type) AS event_type
            FROM ver GROUP BY 1, 2
        )
        SELECT user_id, event_type, valid_from,
            lead(valid_from) OVER (PARTITION BY user_id
                                   ORDER BY version) AS valid_to,
            lead(valid_from) OVER (PARTITION BY user_id
                                   ORDER BY version) IS NULL
                AS is_current,
            CAST(version AS BIGINT) AS version
        FROM runs"""

    sql["sql_view"] = """
        SELECT year(l_shipdate) AS year,
            CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE)
                AS quantity_sum,
            CAST(COUNT(*) AS BIGINT) AS fact_count
        FROM lineitem GROUP BY 1"""

    sql["parent_child"] = """
        WITH RECURSIVE nodes AS (
            SELECT c_custkey AS id,
                CASE WHEN c_custkey >= 10 THEN c_custkey // 10 END
                    AS parent
            FROM customer
        ),
        anc AS (
            SELECT id, id AS anc, 0 AS depth, parent AS next
            FROM nodes
            UNION ALL
            SELECT a.id, n.id, a.depth + 1, n.parent
            FROM anc a JOIN nodes n ON a.next = n.id
        )
        SELECT id, anc AS root, CAST(depth AS BIGINT) AS depth
        FROM anc WHERE next IS NULL"""

    sql["events_stream_hh"] = f"""
        SELECT date_trunc('day', ts) AS window_start, r.r AS row,
            CAST({_H64.format(x="concat('cm' || r.r || ':', CAST(user_id AS VARCHAR))")} % 64 AS INTEGER)
                AS bucket,
            CAST(count(*) AS BIGINT) AS n
        FROM events CROSS JOIN range(0, 2) r(r)
        GROUP BY 1, 2, 3"""

    _BLOOM_POS = ("CAST(" + _H64.format(
        x="concat('bl' || h.h || ':', CAST(user_id AS VARCHAR))")
        + " % 4096 AS BIGINT)")
    sql["events_bloom"] = f"""
        WITH members AS (
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase' AND value > 90
        ),
        mpos AS (
            SELECT CAST({_BLOOM_POS} // 32 AS INTEGER) AS word,
                CAST(1 AS BIGINT) << CAST({_BLOOM_POS} % 32
                                          AS INTEGER) AS mask
            FROM members CROSS JOIN range(0, 5) h(h)
        ),
        bloom AS (
            SELECT word, bit_or(mask) AS bits FROM mpos GROUP BY 1
        ),
        probes AS (SELECT DISTINCT user_id FROM events),
        ppos AS (
            SELECT user_id,
                CAST({_BLOOM_POS} // 32 AS INTEGER) AS word,
                CAST(1 AS BIGINT) << CAST({_BLOOM_POS} % 32
                                          AS INTEGER) AS mask
            FROM probes CROSS JOIN range(0, 5) h(h)
        ),
        probed AS (
            SELECT p.user_id,
                CAST(SUM(CASE WHEN (COALESCE(b.bits, 0) & p.mask)
                              <> 0 THEN 1 ELSE 0 END) AS BIGINT)
                    = CAST(count(*) AS BIGINT) AS maybe_present
            FROM ppos p LEFT JOIN bloom b ON p.word = b.word
            GROUP BY 1
        )
        SELECT pr.user_id, pr.maybe_present,
            m.user_id IS NOT NULL AS actual,
            pr.maybe_present OR m.user_id IS NULL AS no_false_neg
        FROM probed pr LEFT JOIN members m
            ON pr.user_id = m.user_id"""

    sql["events_countmin"] = f"""
        WITH cells AS (
            SELECT r.r AS row,
                CAST({_H64.format(x="concat('cm' || r.r || ':', CAST(user_id AS VARCHAR))")} % 256 AS INTEGER)
                    AS bucket,
                CAST(count(*) AS BIGINT) AS n
            FROM events CROSS JOIN range(0, 4) r(r)
            GROUP BY 1, 2
        ),
        exact AS (
            SELECT user_id,
                CAST(count(*) AS BIGINT) AS exact_n
            FROM events GROUP BY 1
        ),
        probes AS (
            SELECT e.user_id, e.exact_n, r.r AS row,
                CAST({_H64.format(x="concat('cm' || r.r || ':', CAST(user_id AS VARCHAR))")} % 256 AS INTEGER)
                    AS bucket
            FROM exact e CROSS JOIN range(0, 4) r(r)
        )
        SELECT p.user_id, p.exact_n,
            CAST(min(COALESCE(c.n, 0)) AS BIGINT) AS cm_estimate,
            min(COALESCE(c.n, 0)) >= p.exact_n AS cm_ok
        FROM probes p LEFT JOIN cells c
            ON p.row = c.row AND p.bucket = c.bucket
        GROUP BY 1, 2"""

    sql["fuzzy_names"] = """
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
            CAST(levenshtein(a.c_name, b.c_name) AS BIGINT)
                AS distance
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE a.c_custkey <= 300 AND b.c_custkey <= 300
          AND levenshtein(a.c_name, b.c_name) <= 1"""

    sql["topk_per_region"] = f"""
        SELECT "customer_geo.region_key", "customer_geo.nation_key",
            "customer_geo.customer_key", price_sum,
            CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT r.r_regionkey AS "customer_geo.region_key",
                n.n_nationkey AS "customer_geo.nation_key",
                c.c_custkey AS "customer_geo.customer_key",
                CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS price_sum,
                row_number() OVER (
                    PARTITION BY r.r_regionkey
                    ORDER BY CAST(SUM({_DEC_PRICE}) AS DOUBLE) DESC,
                             c.c_custkey) AS rank
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2, 3
        ) WHERE rank <= 3"""

    sql["events_gap_fill"] = """
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hour,
                CAST(count(*) AS BIGINT) AS n_errors
            FROM events WHERE event_type = 'error' GROUP BY 1
        ),
        bounds AS (SELECT min(hour) AS lo, max(hour) AS hi
                   FROM hourly),
        spine AS (
            SELECT unnest(generate_series(lo, hi,
                                          INTERVAL 1 HOUR)) AS hour
            FROM bounds
        )
        SELECT s.hour,
            CAST(COALESCE(h.n_errors, 0) AS BIGINT) AS n_errors
        FROM spine s LEFT JOIN hourly h ON s.hour = h.hour"""

    sql["compact_roundtrip"] = """
        SELECT event_type,
            CAST(count(*) AS BIGINT) AS n_events,
            CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE)
                AS value_sum,
            CAST(min(event_id) AS BIGINT) AS min_id,
            CAST(max(event_id) AS BIGINT) AS max_id,
            TRUE AS compacted_ok
        FROM events GROUP BY 1"""

    sql["drill_across_flag"] = f"""
        WITH notes AS (
            SELECT l_orderkey AS o_key, l_linenumber AS l_num,
                l_quantity * 2 AS double_qty
            FROM lineitem
        ),
        s AS (
            SELECT l_returnflag AS flag,
                CAST(SUM({_DEC_PRICE}) AS DOUBLE) AS sales_price_sum,
                CAST(COUNT(*) AS BIGINT) AS sales_fact_count
            FROM lineitem GROUP BY 1
        ),
        o AS (
            SELECT l.l_returnflag AS flag,
                CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,2)))
                     AS DOUBLE) AS sales_outer_quantity_sum,
                CAST(SUM(CAST(n.double_qty AS DECIMAL(20,2)))
                     AS DOUBLE) AS sales_outer_dqty_sum
            FROM lineitem l JOIN notes n
                ON l.l_orderkey = n.o_key
               AND l.l_linenumber = n.l_num
            GROUP BY 1
        )
        SELECT COALESCE(s.flag, o.flag) AS "returnflag.returnflag",
            s.sales_price_sum, s.sales_fact_count,
            o.sales_outer_quantity_sum, o.sales_outer_dqty_sum
        FROM s FULL OUTER JOIN o ON s.flag = o.flag"""

    sql["events_stream_join"] = """
        SELECT p.event_id, p.user_id, p.value AS purchase_value,
            c.event_id AS click_id, c.value AS click_value,
            date_diff('microsecond', c.ts, p.ts) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 1800 SECONDS
         AND c.ts <= p.ts"""

    sql["events_asof"] = """
        SELECT p.event_id, p.user_id, p.value AS purchase_value,
            c.event_id AS click_id, c.value AS click_value,
            date_diff('microsecond', c.ts, p.ts) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN LATERAL (
            SELECT e.event_id, e.value, e.ts FROM events e
            WHERE e.event_type = 'click' AND e.user_id = p.user_id
              AND e.ts <= p.ts
              AND date_diff('microsecond', e.ts, p.ts)
                  <= 1800 * 1000000
            ORDER BY e.ts DESC, e.event_id DESC LIMIT 1
        ) c ON TRUE"""

    sql["bucketed_join"] = """
        SELECT o.o_orderkey,
            CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,2))) AS DOUBLE)
                AS quantity_sum,
            CAST(COUNT(*) AS BIGINT) AS line_count,
            MAX(o.o_orderpriority) AS priority
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1 HAVING COUNT(*) >= 6"""

    sql["agg_quantiles"] = """
        SELECT l_returnflag AS returnflag,
            quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS q25,
            quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS q50,
            quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS q75,
            COUNT(*) AS fact_count
        FROM lineitem GROUP BY 1"""

    # the HLL estimate itself is engine-defined; the oracle checks the
    # exact count and asserts the engine's estimate met the error bound
    sql["agg_approx_distinct"] = """
        SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
            TRUE AS within_5pct
        FROM lineitem"""

    sql["agg_expression_fns"] = f"""
        SELECT l_returnflag AS "returnflag.returnflag",
            -- no LEAST: DuckDB promotes LEAST(decimal,..) to DOUBLE
            CAST(SUM(CASE WHEN {_DEC_QTY} < 25 THEN {_DEC_QTY}
                     ELSE CAST(25 AS DECIMAL(20,2)) END
                     + COALESCE({_DEC_DISC}, CAST(0 AS DECIMAL(6,2))))
                AS DOUBLE) AS capped_qty_sum,
            CAST(SUM(CASE WHEN {_DEC_PRICE} > 2000
                 THEN round({_DEC_PRICE} / 1000, 0) ELSE 0 END)
                 AS DOUBLE) AS price_band_sum,
            COUNT(*) AS fact_count
        FROM lineitem GROUP BY 1"""

    sql["agg_count_nonempty"] = """
        SELECT l_returnflag AS "returnflag.returnflag",
            COUNT(nullif(l_discount, 0)) AS discount_nz_count,
            COUNT(*) AS fact_count
        FROM lineitem GROUP BY 1"""

    # streaming dedup: per-type distinct normalized content (the Spark
    # side keeps first arrivals; counts are arrival-order independent)
    sql["events_stream_dedup"] = r"""
        SELECT event_type,
            COUNT(DISTINCT regexp_replace(
                lower(trim(concat_ws('|', event_type, props))),
                '\s+', ' ', 'g')) AS n_unique
        FROM events GROUP BY 1"""

    # BMP decode: sum over stored B,G,R bytes (reorder is sum-invariant)
    sql["doc_bmp_decode"] = """
        WITH px AS (
            SELECT doc_id,
                3 + doc_id % 4 AS w,
                2 + doc_id % 3 AS h,
                list_sum(list_transform(range(CAST(2 + doc_id % 3 AS INT)),
                    y -> list_sum(list_transform(
                        range(CAST(3 + doc_id % 4 AS INT)),
                        x -> list_sum(list_transform([0, 1, 2],
                            c -> (doc_id * 3 + x * 7 + y * 11 + c * 5)
                                 % 256)))))) AS ssum
            FROM documents)
        SELECT doc_id,
            CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
            CAST(w * h * 3 AS BIGINT) AS n_samples,
            CAST(ssum AS BIGINT) AS sample_sum
        FROM px"""

    # nearest resize to 2x2: output pixel (x, y) reads source pixel
    # ((x*w)//2, (y*h)//2) of the same stored-byte closed form
    sql["doc_image_resize"] = """
        WITH px AS (
            SELECT doc_id,
                3 + doc_id % 4 AS w,
                2 + doc_id % 3 AS h,
                list_sum(list_transform([0, 1],
                    y -> list_sum(list_transform([0, 1],
                        x -> list_sum(list_transform([0, 1, 2],
                            c -> (doc_id * 3
                                  + ((x * (3 + doc_id % 4)) // 2) * 7
                                  + ((y * (2 + doc_id % 3)) // 2) * 11
                                  + c * 5) % 256)))))) AS ssum
            FROM documents)
        SELECT doc_id,
            CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
            CAST(2 AS BIGINT) AS out_width,
            CAST(2 AS BIGINT) AS out_height,
            CAST(12 AS BIGINT) AS n_samples,
            CAST(ssum AS BIGINT) AS sample_sum
        FROM px"""

    # GIF decode: grey palette (i,i,i) -> rgb_sum = 3 * index_sum
    sql["doc_gif_decode"] = """
        WITH px AS (
            SELECT doc_id,
                4 + doc_id % 5 AS w,
                3 + doc_id % 3 AS h,
                list_sum(list_transform(
                    range(CAST((4 + doc_id % 5) * (3 + doc_id % 3)
                               AS INT)),
                    i -> (doc_id * 5 + i * 29) % 256)) AS isum
            FROM documents)
        SELECT doc_id,
            CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
            CAST(w * h AS BIGINT) AS n_pixels,
            CAST(isum AS BIGINT) AS index_sum,
            CAST(3 * isum AS BIGINT) AS rgb_sum
        FROM px"""

    # audio decode: same closed-form-oracle pattern as doc_pixel_decode
    sql["doc_audio_decode"] = """
        WITH sm AS (
            SELECT doc_id,
                20 + doc_id % 16 AS n,
                8000 + (doc_id % 4) * 4000 AS rate,
                -- s16 reinterpretation of the stored u16 word:
                -- ((v + 32768) % 65536) - 32768
                list_sum(list_transform(
                    range(CAST(20 + doc_id % 16 AS INT)),
                    i -> (doc_id * 11 + i * 17 + 32768) % 65536 - 32768))
                    AS ssum
            FROM documents)
        SELECT doc_id,
            CAST(1 AS BIGINT) AS n_channels,
            CAST(rate AS BIGINT) AS sample_rate,
            CAST(n AS BIGINT) AS n_samples,
            CAST(ssum AS BIGINT) AS sample_sum,
            CAST(CAST(ssum AS DOUBLE) / n AS DOUBLE) AS sample_mean
        FROM sm"""

    # G.711 µ-law expansion, closed form: c = 255 - v (complement),
    # magnitude = ((c%16)*8 + 132) << ((c//16)%8), signed by bit 0x80
    sql["doc_g711_decode"] = """
        WITH sm AS (
            SELECT doc_id, 24 + doc_id % 8 AS n FROM documents),
        ex AS (
            SELECT doc_id, n,
                list_sum(list_transform(range(CAST(n AS INT)), i ->
                    CASE WHEN (255 - (doc_id * 7 + i * 13) % 256) >= 128
                        THEN 132 - (((255 - (doc_id * 7 + i * 13) % 256)
                                     % 16) * 8 + 132)
                             * (1 << (((255 - (doc_id * 7 + i * 13)
                                        % 256) // 16) % 8))
                        ELSE (((255 - (doc_id * 7 + i * 13) % 256)
                               % 16) * 8 + 132)
                             * (1 << (((255 - (doc_id * 7 + i * 13)
                                        % 256) // 16) % 8)) - 132
                    END)) AS ssum
            FROM sm)
        SELECT doc_id,
            CAST(1 AS BIGINT) AS n_channels,
            CAST(8000 AS BIGINT) AS sample_rate,
            CAST(n AS BIGINT) AS n_samples,
            CAST(ssum AS BIGINT) AS sample_sum
        FROM ex"""

    # nearest resample to 4 kHz: out_n = (n*4000)//rate frames, output
    # frame j reads source sample (j*n)//out_n of the same closed form
    sql["doc_audio_resample"] = """
        WITH sm AS (
            SELECT doc_id,
                20 + doc_id % 16 AS n,
                8000 + (doc_id % 4) * 4000 AS rate
            FROM documents),
        r AS (
            SELECT doc_id, n, rate,
                GREATEST(1, (n * 4000) // rate) AS out_n
            FROM sm)
        SELECT doc_id,
            CAST(rate AS BIGINT) AS sample_rate,
            CAST(4000 AS BIGINT) AS out_rate,
            CAST(out_n AS BIGINT) AS n_frames,
            CAST(out_n AS BIGINT) AS n_samples,
            CAST(list_sum(list_transform(range(CAST(out_n AS INT)),
                j -> (doc_id * 11 + ((j * n) // out_n) * 17 + 32768)
                     % 65536 - 32768)) AS BIGINT) AS sample_sum
        FROM r"""

    sql["agg_expression_case"] = """
        SELECT l_returnflag AS "returnflag.returnflag",
            CAST(SUM(CASE WHEN l_quantity < 10 THEN 1
                     WHEN l_quantity < 30 THEN 2
                     WHEN l_quantity < 45 THEN 3
                     ELSE 4 END) AS BIGINT) AS qty_tier_sum,
            COUNT(*) AS fact_count
        FROM lineitem GROUP BY 1"""

    sql["report_combo"] = """
        SELECT 'byflag' AS kind, l_returnflag AS member,
            COUNT(*) AS n
        FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 2
        UNION ALL
        SELECT 'status', o_orderstatus, 0 FROM (
            SELECT DISTINCT o.o_orderstatus
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE year(l.l_shipdate) = 1995
        )
        UNION ALL
        SELECT 'total', '', COUNT(*)
        FROM lineitem WHERE year(l_shipdate) = 1995"""

    sql["cell_details"] = """
        SELECT CAST(0 AS BIGINT) AS cut, CAST(0 AS BIGINT) AS lvl,
            CAST(r_regionkey AS VARCHAR) AS key, r_name AS label
        FROM region WHERE r_regionkey = 2
        UNION ALL
        SELECT 0, 1, CAST(n_nationkey AS VARCHAR), n_name
        FROM nation WHERE n_nationkey = 7
        UNION ALL
        SELECT 1, 0, '1995', '1995'"""

    sql["agg_natural_order"] = """
        SELECT * FROM (
            SELECT year(l_shipdate) AS "date.year",
                month(l_shipdate) AS "date.month",
                l_returnflag AS "returnflag.returnflag",
                COUNT(*) AS fact_count
            FROM lineitem GROUP BY 1, 2, 3
        ) ORDER BY "date.year", "date.month", "returnflag.returnflag"
        LIMIT 7 OFFSET 14"""

    sql["csv_format"] = f"""
        WITH agg AS (
            SELECT l_returnflag AS flag, COUNT(*) AS n,
                SUM({_DEC_QTY}) AS qs
            FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 1
        )
        SELECT CAST(0 AS BIGINT) AS line,
            'returnflag.returnflag,fact_count,quantity_sum' AS text
        UNION ALL
        SELECT row_number() OVER (ORDER BY flag),
            flag || ',' || CAST(n AS VARCHAR) || ','
                 || CAST(qs AS VARCHAR)
        FROM agg"""

    # emb_ann / emb_ivf: the approximation is DETERMINISTIC (md5-derived
    # hyperplanes; fixed-seed k-means on a fixed sorted sample), so the
    # full approximate result is SQL-expressible — the plane/centroid
    # components are embedded as double literals identical to the ones
    # the Spark plan embeds via F.lit.  list_dot_product's summation
    # order matches Spark's sequential aggregate fold (proven bit-exact
    # by the emb_topk/emb_near_dup rows).
    sql["emb_ann"] = _guarded_oracle(_emb_ann_oracle, "emb_ann")
    sql["doc_dup_clusters"] = _guarded_oracle(_doc_dup_clusters_oracle, "doc_dup_clusters")
    sql["emb_projection"] = _guarded_oracle(_emb_projection_oracle, "emb_projection")
    sql["emb_ann_recall"] = _guarded_oracle(_emb_ann_recall_oracle, "emb_ann_recall")
    sql["emb_ivf_recall"] = _guarded_oracle(_emb_ivf_recall_oracle, "emb_ivf_recall")
    sql["emb_neardup_recall"] = _guarded_oracle(_emb_neardup_recall_oracle, "emb_neardup_recall")
    sql["emb_ivf"] = _guarded_oracle(_emb_ivf_oracle, "emb_ivf")
    sql["emb_kmeans"] = _guarded_oracle(_emb_kmeans_oracle, "emb_kmeans")

    # learned quality model: identical weights retrained from the
    # identical rounded features; logit = same IEEE op order
    def _quality_oracle():
        qw = _quality_weights()
        quality_terms = " + ".join(
        f"({qw[i + 1]!r} * {feat})" for i, feat in enumerate(
                ["len_score", "avg_token_len", "punct_ratio",
                 "digit_ratio", "stopword_ratio_en"]))
        return f"""
        WITH base AS ({_text_stats_sql()}),
        derived AS ({_TEXT_STATS_DERIVED}),
        feats AS ({_QUALITY_FEATURES_SQL})
        SELECT doc_id,
            round({qw[0]!r} + {quality_terms}, 6) AS logit,
            CAST(CASE WHEN {qw[0]!r} + {quality_terms} > 0
                 THEN 1 ELSE 0 END AS BIGINT) AS label
        FROM feats"""

    sql["doc_quality_model"] = _guarded_oracle(
        _quality_oracle, "doc_quality_model")
    sql["doc_dsir"] = _guarded_oracle(_dsir_oracle, "doc_dsir")
    sql["doc_communities"] = _guarded_oracle(
        _lpa_oracle, "doc_communities")
    sql["doc_bm25"] = _guarded_oracle(_bm25_oracle, "doc_bm25")

    def _rrf_oracle() -> str:
        # fuse the bm25 oracle's ranking (as a derived table) with
        # the length-prior top-20; exact 1e6 // (60 + rank) terms
        return f"""
        WITH bm AS ({_bm25_oracle()}),
        ln AS (
            SELECT doc_id, CAST(row_number() OVER (
                ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
            FROM documents
            ORDER BY n_chars DESC, doc_id LIMIT 20),
        u AS (
            SELECT doc_id, 1000000 // (60 + rank) AS c FROM bm
            UNION ALL
            SELECT doc_id, 1000000 // (60 + rank) FROM ln),
        f AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro,
                CAST(count(*) AS BIGINT) AS n_lists
            FROM u GROUP BY 1),
        r AS (
            SELECT doc_id, rrf_micro, n_lists,
                CAST(row_number() OVER (
                    ORDER BY rrf_micro DESC, doc_id) AS BIGINT)
                    AS fused_rank
            FROM f)
        SELECT doc_id, rrf_micro, n_lists, fused_rank
        FROM r WHERE fused_rank <= 10"""

    sql["doc_rrf"] = _guarded_oracle(_rrf_oracle, "doc_rrf")
    sql["doc_dsir_sample"] = _guarded_oracle(
        _dsir_sample_oracle, "doc_dsir_sample")
    sql["emb_pq"] = _guarded_oracle(_pq_oracle, "emb_pq")
    sql["emb_pq_recall"] = _guarded_oracle(
        _emb_pq_recall_oracle, "emb_pq_recall")

    sql["emb_semdedup"] = _guarded_oracle(_emb_semdedup_oracle, "emb_semdedup")
    sql["emb_semdedup_greedy"] = _guarded_oracle(_emb_semdedup_greedy_oracle, "emb_semdedup_greedy")
    sql["doc_bpe_encode"] = _guarded_oracle(_bpe_oracle, "doc_bpe_encode")
    sql["doc_bpe_vocab"] = _guarded_oracle(_bpe_vocab_oracle, "doc_bpe_vocab")
    sql["doc_image_dedup"] = _guarded_oracle(_image_dedup_oracle, "doc_image_dedup")
    sql["doc_audio_dedup"] = _guarded_oracle(_audio_dedup_oracle, "doc_audio_dedup")

    # OLS trend: the five integer moment sums; staged r2 division
    # ((1e6*|num|) // dx * |num|) // dy replays Spark's decimal div.
    sql["orders_ols"] = """
        WITH b AS (
            SELECT o_orderpriority AS g,
                date_diff('day', DATE '1970-01-01',
                          CAST(o_orderdate AS DATE)) AS x,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS HUGEINT) AS y
            FROM orders GROUP BY 1, 2),
        m AS (
            SELECT g, CAST(count(*) AS HUGEINT) AS n,
                sum(CAST(x AS HUGEINT)) AS sx, sum(y) AS sy,
                sum(CAST(x AS HUGEINT) * y) AS sxy,
                sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
                sum(y * y) AS syy
            FROM b GROUP BY 1),
        d AS (
            SELECT g, n, n * sxy - sx * sy AS num,
                n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy
            FROM m)
        SELECT g AS o_orderpriority, CAST(n AS BIGINT) AS n_buckets,
            CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                 * ((1000000 * abs(num)) // dx) AS BIGINT) AS slope_upd,
            CAST(((1000000 * abs(num)) // dx * abs(num)) // dy
                 AS BIGINT) AS r2_ppm
        FROM d WHERE dx > 0 AND dy > 0"""

    # JSON field stats: regexp mirror of from_json('k BIGINT') — the
    # field is numeric in every row; empty match -> NULL (counted).
    sql["events_json_stats"] = r"""
        WITH p AS (
            SELECT event_type,
                CAST(NULLIF(regexp_extract(
                    props, '"k":\s*(-?\d+)', 1), '') AS BIGINT) AS v
            FROM events)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            CAST(count(v) AS BIGINT) AS n_parsed,
            CAST(sum(v) AS BIGINT) AS sum_v,
            CAST(min(v) AS BIGINT) AS min_v,
            CAST(max(v) AS BIGINT) AS max_v
        FROM p GROUP BY 1"""

    # Two-sample KS: cumulative per-value counts, integer
    # cross-product gap, supremum with earliest-value tiebreak.
    sql["orders_ks"] = """
        WITH t AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
                (o_orderpriority = '1-URGENT') AS a
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        h AS (
            SELECT v, sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
            FROM t GROUP BY 1),
        n AS (SELECT CAST(sum(ca) AS HUGEINT) AS na,
                     CAST(sum(cb) AS HUGEINT) AS nb FROM h),
        c AS (
            SELECT v, sum(ca) OVER (ORDER BY v) AS cuma,
                sum(cb) OVER (ORDER BY v) AS cumb
            FROM h),
        g AS (
            SELECT v, abs(CAST(cuma AS HUGEINT) * n.nb
                          - CAST(cumb AS HUGEINT) * n.na) AS gap
            FROM c, n)
        SELECT CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
            CAST((1000000 * g.gap) // (n.na * n.nb) AS BIGINT) AS d_ppm,
            CAST(g.v AS BIGINT) AS at_value_cents
        FROM g, n ORDER BY g.gap DESC, g.v ASC LIMIT 1"""

    # EMD: sum of |cum cross-products| * gap-to-next-value; the
    # oracle's global lead replays the distributed bucket successor.
    sql["orders_emd"] = """
        WITH t AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
                (o_orderpriority = '1-URGENT') AS a
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        h AS (
            SELECT v, sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
            FROM t GROUP BY 1),
        n AS (SELECT CAST(sum(ca) AS HUGEINT) AS na,
                     CAST(sum(cb) AS HUGEINT) AS nb FROM h),
        c AS (
            SELECT v, sum(ca) OVER (ORDER BY v) AS cuma,
                sum(cb) OVER (ORDER BY v) AS cumb,
                COALESCE(lead(v) OVER (ORDER BY v), v) - v AS dv
            FROM h),
        s AS (
            SELECT sum(abs(CAST(cuma AS HUGEINT) * n.nb
                           - CAST(cumb AS HUGEINT) * n.na)
                       * CAST(dv AS HUGEINT)) AS t
            FROM c, n)
        SELECT CAST(n.na AS BIGINT) AS n_a,
            CAST(n.nb AS BIGINT) AS n_b,
            CAST((1000 * s.t) // (n.na * n.nb) AS BIGINT)
                AS emd_millicents
        FROM s, n"""

    # Inverted index: (term, doc) tf grain, df/cf, top-10 postings
    # as a string_agg in total (tf desc, doc asc) order.
    sql["doc_postings"] = r"""
        WITH tok AS (
            SELECT doc_id, unnest(CASE
                WHEN trim(lower(text)) = '' THEN []
                ELSE string_split_regex(trim(lower(text)), '\s+')
                END) AS t
            FROM documents),
        td AS (
            SELECT t AS term, doc_id, count(*) AS tf
            FROM tok WHERE t <> '' GROUP BY 1, 2),
        m AS (
            SELECT term, count(*) AS df, sum(tf) AS cf
            FROM td GROUP BY 1 HAVING count(*) >= 5),
        r AS (
            SELECT term, doc_id, tf, row_number() OVER (
                PARTITION BY term
                ORDER BY tf DESC, doc_id) AS rn
            FROM td),
        p AS (
            SELECT term, string_agg(doc_id || ':' || tf, ','
                ORDER BY tf DESC, doc_id) AS postings
            FROM r WHERE rn <= 10 GROUP BY 1)
        SELECT m.term, CAST(m.df AS BIGINT) AS df,
            CAST(m.cf AS BIGINT) AS cf, p.postings
        FROM m JOIN p ON m.term = p.term"""

    # TPC-H Q1: integer money units (cents / 1e-4 / 1e-6 dollars),
    # truncating-div averages.
    sql["tpch_q1"] = """
        WITH b AS (
            SELECT l_returnflag, l_linestatus,
                CAST(round(l_quantity * 100) AS BIGINT) AS qty,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
                CAST(round(l_discount * 100) AS BIGINT) AS dc,
                CAST(round(l_tax * 100) AS BIGINT) AS tc
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'),
        a AS (
            SELECT l_returnflag, l_linestatus,
                sum(qty) AS sum_qty_cents,
                sum(price) AS sum_base_price_cents,
                sum(CAST(price AS HUGEINT) * (100 - dc)) AS sdp,
                sum(CAST(price AS HUGEINT) * (100 - dc) * (100 + tc))
                    AS sch,
                sum(dc) AS sdc, count(*) AS count_order
            FROM b GROUP BY 1, 2)
        SELECT l_returnflag, l_linestatus,
            CAST(sum_qty_cents AS BIGINT) AS sum_qty_cents,
            CAST(sum_base_price_cents AS BIGINT)
                AS sum_base_price_cents,
            CAST(sdp AS BIGINT) AS sum_disc_price_e4,
            CAST(sch AS BIGINT) AS sum_charge_e6,
            CAST(sum_qty_cents // count_order AS BIGINT)
                AS avg_qty_cents,
            CAST(sum_base_price_cents // count_order AS BIGINT)
                AS avg_price_cents,
            CAST(sdc // count_order AS BIGINT) AS avg_disc_pct,
            CAST(count_order AS BIGINT) AS count_order
        FROM a"""

    # TPC-H Q3: top-10 with full deterministic tiebreak.
    sql["tpch_q3"] = """
        SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
            CAST(sum(CAST(round(l.l_extendedprice * 100) AS HUGEINT)
                     * (100 - CAST(round(l.l_discount * 100)
                                   AS BIGINT))) AS BIGINT)
                AS revenue_e4
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND CAST(o.o_orderdate AS DATE) < DATE '1996-03-15'
          AND CAST(l.l_shipdate AS DATE) > DATE '1996-03-15'
        GROUP BY 1, 2, 3
        ORDER BY revenue_e4 DESC, o.o_orderdate ASC,
            l.l_orderkey ASC
        LIMIT 10"""

    # TPC-H Q5: local supply chains (c_nationkey = s_nationkey).
    sql["tpch_q5"] = """
        SELECT n.n_name,
            CAST(sum(CAST(round(l.l_extendedprice * 100) AS HUGEINT)
                     * (100 - CAST(round(l.l_discount * 100)
                                   AS BIGINT))) AS BIGINT)
                AS revenue_e4,
            CAST(count(*) AS BIGINT) AS n_lineitems
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
            AND s.s_nationkey = c.c_nationkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
        GROUP BY 1"""

    # TPC-H Q7: bidirectional nation pair, ship-year grain.
    sql["tpch_q7"] = """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
            CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT)
                AS l_year,
            CAST(sum(CAST(round(l.l_extendedprice * 100) AS HUGEINT)
                     * (100 - CAST(round(l.l_discount * 100)
                                   AS BIGINT))) AS BIGINT)
                AS revenue_e4
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE sn.n_name IN ('NATION_1', 'NATION_2')
          AND cn.n_name IN ('NATION_1', 'NATION_2')
          AND sn.n_name <> cn.n_name
          AND EXTRACT(year FROM l.l_shipdate) BETWEEN 1996 AND 1997
        GROUP BY 1, 2, 3"""

    # TPC-H Q10: returned revenue per customer, top-20 deterministic.
    sql["tpch_q10"] = """
        SELECT c.c_custkey, c.c_name, n.n_name,
            CAST(sum(CAST(round(l.l_extendedprice * 100) AS HUGEINT)
                     * (100 - CAST(round(l.l_discount * 100)
                                   AS BIGINT))) AS BIGINT)
                AS revenue_e4,
            CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue_e4 DESC, c.c_custkey ASC
        LIMIT 20"""

    # TPC-H Q18: aggregate-then-semi-join on qualifying orders.
    sql["tpch_q18"] = """
        WITH q AS (
            SELECT l_orderkey,
                CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                     AS BIGINT) AS total_qty_cents
            FROM lineitem GROUP BY 1
            HAVING sum(CAST(round(l_quantity * 100) AS BIGINT))
                > 20000)
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
            CAST(o.o_orderdate AS DATE) AS o_orderdate,
            CAST(round(o.o_totalprice * 100) AS BIGINT)
                AS o_totalprice_cents,
            q.total_qty_cents
        FROM q
        JOIN orders o ON q.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey"""

    # TPC-H Q13: left outer + two stacked aggregations.
    sql["tpch_q13"] = """
        WITH pc AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                AND o.o_orderpriority <> '5-LOW'
            GROUP BY 1)
        SELECT CAST(c_count AS BIGINT) AS c_count,
            CAST(count(*) AS BIGINT) AS custdist
        FROM pc GROUP BY 1"""

    # TPC-H Q22: scalar-subquery average + anti-join never-ordered.
    sql["tpch_q22"] = """
        WITH scoped AS (
            SELECT c_custkey,
                substr(CAST(c_custkey AS VARCHAR), 1, 1)
                    AS cntrycode,
                CAST(round(c_acctbal * 100) AS BIGINT) AS bal
            FROM customer
            WHERE substr(CAST(c_custkey AS VARCHAR), 1, 1)
                IN ('1', '2', '3')),
        a AS (SELECT sum(bal) // count(*) AS avg_cents
              FROM scoped WHERE bal > 0),
        rich AS (
            SELECT s.* FROM scoped s, a
            WHERE s.bal > a.avg_cents),
        never AS (
            SELECT r.* FROM rich r
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = r.c_custkey
                  AND o.o_orderpriority = '1-URGENT'))
        SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
            CAST(sum(bal) AS BIGINT) AS totacctbal_cents
        FROM never GROUP BY 1"""

    # Theil-Sen: pairwise monthly-bucket slopes quantized to
    # micro-cents/day, exact lower-median order statistic per group.
    sql["orders_theilsen"] = """
        WITH b AS (
            SELECT o_orderpriority AS g,
                date_diff('day', DATE '1970-01-01',
                    CAST(date_trunc('month', o_orderdate) AS DATE))
                    AS x,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS y
            FROM orders GROUP BY 1, 2),
        p AS (
            SELECT l.g,
                CAST((CASE WHEN r.y - l.y < 0 THEN -1 ELSE 1 END)
                     * ((CAST(1000000 AS HUGEINT) * abs(r.y - l.y))
                        // (r.x - l.x)) AS BIGINT) AS s
            FROM b l JOIN b r ON l.g = r.g AND l.x < r.x),
        rk AS (
            SELECT g, s, row_number() OVER (
                PARTITION BY g ORDER BY s) AS rn,
                count(*) OVER (PARTITION BY g) AS n
            FROM p)
        SELECT g AS o_orderpriority,
            CAST(max(n) AS BIGINT) AS n_pairs,
            CAST(min(CASE WHEN rn >= (n + 1) // 2 THEN s END)
                 AS BIGINT) AS median_slope_upd
        FROM rk GROUP BY 1"""

    # Mann-Kendall: pairwise signs on the monthly grain + the exact
    # 18x tie-corrected variance numerator.
    sql["orders_mannkendall"] = """
        WITH b AS (
            SELECT o_orderpriority AS g,
                date_diff('day', DATE '1970-01-01',
                    CAST(date_trunc('month', o_orderdate) AS DATE))
                    AS x,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS y
            FROM orders GROUP BY 1, 2),
        p AS (
            SELECT l.g,
                CASE WHEN r.y > l.y THEN 1
                     WHEN r.y < l.y THEN -1 ELSE 0 END AS sgn
            FROM b l JOIN b r ON l.g = r.g AND l.x < r.x),
        s AS (
            SELECT g, CAST(sum(sgn) AS BIGINT) AS s,
                CAST(count(*) AS BIGINT) AS n_pairs
            FROM p GROUP BY 1),
        t AS (
            SELECT g, y, count(*) AS t FROM b GROUP BY 1, 2),
        ties AS (
            SELECT g,
                sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
                    AS tcorr,
                CAST(sum(t) AS HUGEINT) AS n
            FROM t GROUP BY 1)
        SELECT s.g AS o_orderpriority,
            CAST(ties.n AS BIGINT) AS n_buckets, s.n_pairs, s.s,
            CAST(ties.n * (ties.n - 1) * (2 * ties.n + 5)
                 - COALESCE(ties.tcorr, 0) AS BIGINT) AS var_s_x18
        FROM s JOIN ties ON s.g = ties.g"""

    langid_pred_case = """
            CASE WHEN greatest(COALESCE(score_de,0), COALESCE(score_en,0),
                               COALESCE(score_es,0), COALESCE(score_fr,0))
                      = 0 THEN 'und'
             WHEN COALESCE(score_de,0) >= COALESCE(score_en,0)
              AND COALESCE(score_de,0) >= COALESCE(score_es,0)
              AND COALESCE(score_de,0) >= COALESCE(score_fr,0) THEN 'de'
             WHEN COALESCE(score_en,0) >= COALESCE(score_es,0)
              AND COALESCE(score_en,0) >= COALESCE(score_fr,0) THEN 'en'
             WHEN COALESCE(score_es,0) >= COALESCE(score_fr,0) THEN 'es'
             ELSE 'fr' END"""

    # Heaps curve: hash-bucketed nested samples, token min-bucket
    # first appearances, 10-row cumulative sums.
    sql["doc_heaps"] = rf"""
        WITH d AS (
            SELECT doc_id, text,
                ({_H64.format(x="CAST(doc_id AS VARCHAR)")} % 10)
                    + 1 AS b
            FROM documents),
        toks AS (
            SELECT b, unnest(CASE WHEN trim(lower(text)) = '' THEN []
                ELSE string_split_regex(trim(lower(text)), '\s+')
                END) AS t
            FROM d),
        tt AS (SELECT b, t FROM toks WHERE t <> ''),
        docs AS (SELECT b, count(*) AS docs FROM d GROUP BY 1),
        tc AS (SELECT b, count(*) AS toks FROM tt GROUP BY 1),
        fs AS (
            SELECT fb AS b, count(*) AS new FROM (
                SELECT t, min(b) AS fb FROM tt GROUP BY 1)
            GROUP BY 1),
        sp AS (SELECT unnest(generate_series(1, 10)) AS b),
        j AS (
            SELECT sp.b, COALESCE(docs.docs, 0) AS docs,
                COALESCE(tc.toks, 0) AS toks,
                COALESCE(fs.new, 0) AS new
            FROM sp LEFT JOIN docs ON docs.b = sp.b
            LEFT JOIN tc ON tc.b = sp.b
            LEFT JOIN fs ON fs.b = sp.b)
        SELECT CAST(b AS BIGINT) AS fraction,
            CAST(sum(docs) OVER w AS BIGINT) AS n_docs_cum,
            CAST(sum(toks) OVER w AS BIGINT) AS n_tokens_cum,
            CAST(sum(new) OVER w AS BIGINT) AS n_types_cum
        FROM j WINDOW w AS (ORDER BY b ROWS UNBOUNDED PRECEDING)"""

    # Confusion matrix: raw (truth, predicted) counts.
    sql["doc_confusion"] = f"""
        WITH scores AS ({langid_scores}),
        pr AS (
            SELECT d.lang AS truth, {langid_pred_case} AS predicted
            FROM scores s JOIN documents d ON s.doc_id = d.doc_id)
        SELECT truth, predicted, CAST(count(*) AS BIGINT) AS n
        FROM pr GROUP BY 1, 2"""

    # Type audience overlap: exact pairwise intersection/Jaccard.
    sql["events_type_overlap"] = """
        WITH tu AS (
            SELECT DISTINCT event_type, user_id FROM events),
        sizes AS (
            SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                count(*) AS n_both
            FROM tu a JOIN tu b ON a.user_id = b.user_id
                AND a.event_type < b.event_type
            GROUP BY 1, 2)
        SELECT p.type_a, p.type_b,
            CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
            CAST(p.n_both AS BIGINT) AS n_both,
            CAST(sa.n + sb.n - p.n_both AS BIGINT) AS n_union,
            CAST((1000000 * p.n_both) // (sa.n + sb.n - p.n_both)
                 AS BIGINT) AS jaccard_ppm
        FROM pairs p
        JOIN sizes sa ON sa.event_type = p.type_a
        JOIN sizes sb ON sb.event_type = p.type_b"""

    # TPC-H Q6: pure filter + aggregation, integer discount band.
    sql["tpch_q6"] = """
        SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
            CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                     * CAST(round(l_discount * 100) AS BIGINT))
                 AS BIGINT) AS revenue_e4
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
          AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24"""

    # TPC-H Q8: conditional + total revenue in one aggregation.
    sql["tpch_q8"] = """
        WITH rev AS (
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                    AS o_year,
                CAST(round(l.l_extendedprice * 100) AS HUGEINT)
                    * (100 - CAST(round(l.l_discount * 100)
                                  AS BIGINT)) AS r,
                sn.n_name AS supp_nation
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
                AND p.p_type = 'PROMO'
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region rg ON cn.n_regionkey = rg.r_regionkey
                AND rg.r_name = 'ASIA'
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey),
        a AS (
            SELECT o_year,
                sum(CASE WHEN supp_nation = 'NATION_1' THEN r
                    ELSE 0 END) AS t,
                sum(r) AS tot
            FROM rev GROUP BY 1)
        SELECT o_year, CAST(t AS BIGINT) AS target_revenue_e4,
            CAST(tot AS BIGINT) AS total_revenue_e4,
            CAST((1000000 * t) // tot AS BIGINT) AS share_ppm
        FROM a"""

    # TPC-H Q14: promo share of one ship month, exact ppm.
    sql["tpch_q14"] = """
        WITH rev AS (
            SELECT CAST(round(l.l_extendedprice * 100) AS HUGEINT)
                    * (100 - CAST(round(l.l_discount * 100)
                                  AS BIGINT)) AS r,
                p.p_type
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
              AND CAST(l.l_shipdate AS DATE) < DATE '1996-02-01')
        SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
            CAST(sum(CASE WHEN p_type = 'PROMO' THEN r ELSE 0 END)
                 AS BIGINT) AS promo_revenue_e4,
            CAST(sum(r) AS BIGINT) AS total_revenue_e4,
            CAST((1000000 * sum(CASE WHEN p_type = 'PROMO' THEN r
                                ELSE 0 END)) // sum(r) AS BIGINT)
                AS promo_share_ppm
        FROM rev"""

    # Stickiness: sum(DAU) over active days vs MAU, exact ppm.
    sql["events_stickiness"] = """
        WITH dk AS (
            SELECT DISTINCT date_trunc('month', ts) AS month,
                CAST(ts AS DATE) AS d, user_id
            FROM events),
        dau AS (
            SELECT month, sum(dau) AS dau_sum, count(*) AS n_days
            FROM (SELECT month, d, count(*) AS dau
                  FROM dk GROUP BY 1, 2)
            GROUP BY 1),
        mau AS (
            SELECT month, count(DISTINCT user_id) AS mau
            FROM dk GROUP BY 1)
        SELECT dau.month, CAST(dau_sum AS BIGINT) AS dau_sum,
            CAST(n_days AS BIGINT) AS n_days,
            CAST(mau AS BIGINT) AS mau,
            CAST((CAST(1000000 AS HUGEINT) * dau_sum)
                 // (CAST(n_days AS HUGEINT) * mau) AS BIGINT)
                AS stickiness_ppm
        FROM dau JOIN mau ON dau.month = mau.month"""

    # Lorenz deciles: ascending-spend cumulative counts and sums,
    # boundary = smallest amount whose cum count reaches ceil(d*N/10).
    sql["orders_lorenz"] = """
        WITH pk AS (
            SELECT o_custkey,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS amt
            FROM orders GROUP BY 1),
        h AS (
            SELECT amt, count(*) AS c,
                CAST(sum(CAST(amt AS HUGEINT) * count(*))
                     OVER (ORDER BY amt) AS HUGEINT) AS wcum,
                sum(count(*)) OVER (ORDER BY amt) AS cum
            FROM pk GROUP BY amt),
        t AS (SELECT max(cum) AS n, max(wcum) AS w FROM h),
        sp AS (
            SELECT CAST(d AS BIGINT) AS decile,
                (d * (SELECT n FROM t) + 9) // 10 AS rank
            FROM (SELECT unnest(generate_series(1, 10)) AS d)),
        hit AS (
            SELECT sp.decile, sp.rank, h.amt, h.cum, h.wcum
            FROM sp JOIN h ON h.cum >= sp.rank),
        m AS (
            SELECT decile, rank, min(amt) AS amt
            FROM hit GROUP BY 1, 2)
        SELECT m.decile, CAST(m.rank AS BIGINT) AS rank,
            CAST(h.cum AS BIGINT) AS cum_entities,
            CAST((CAST(1000000 AS HUGEINT) * h.wcum)
                 // (SELECT w FROM t) AS BIGINT) AS cum_share_ppm
        FROM m JOIN h ON h.amt = m.amt"""

    # Distinctive terms: positive chi-square cells on the
    # (source, token) grain, top-5 per source, deterministic order.
    sql["doc_distinctive"] = r"""
        WITH toks AS (
            SELECT source AS stratum,
                unnest(CASE WHEN trim(lower(text)) = '' THEN []
                    ELSE string_split_regex(trim(lower(text)), '\s+')
                    END) AS t
            FROM documents),
        obs AS (
            SELECT stratum, t, count(*) AS o
            FROM toks WHERE t <> '' GROUP BY 1, 2),
        rm AS (SELECT stratum, sum(o) AS rm FROM obs GROUP BY 1),
        cm AS (SELECT t, sum(o) AS cm FROM obs GROUP BY 1),
        n AS (SELECT CAST(sum(o) AS HUGEINT) AS n FROM obs),
        cells AS (
            SELECT obs.stratum, obs.t, obs.o,
                CAST(obs.o AS HUGEINT) * n.n
                    - CAST(rm.rm AS HUGEINT) * cm.cm AS dev,
                CAST(rm.rm AS HUGEINT) AS rm,
                CAST(cm.cm AS HUGEINT) AS cm, n.n
            FROM obs
            JOIN rm ON obs.stratum = rm.stratum
            JOIN cm ON obs.t = cm.t
            CROSS JOIN n
            WHERE obs.o >= 10),
        pos AS (
            SELECT stratum, t, o,
                CAST((dev * dev * 1000000) // (rm * cm * n)
                     AS BIGINT) AS contrib_ppm
            FROM cells WHERE dev > 0),
        rk AS (
            SELECT stratum, t, o, contrib_ppm, row_number() OVER (
                PARTITION BY stratum
                ORDER BY contrib_ppm DESC, t ASC) AS rn
            FROM pos)
        SELECT stratum, t AS term, CAST(o AS BIGINT) AS n,
            contrib_ppm, CAST(rn AS BIGINT) AS rank
        FROM rk WHERE rn <= 5"""

    # Streaming windowed quantiles: the stream only merges bucket
    # counts, so the batch replay is the same histogram walk.
    sql["events_stream_quantiles"] = """
        WITH h AS (
            SELECT date_trunc('day', ts) AS ws,
                CAST(round(value * 100) AS BIGINT) // 100 AS bucket,
                count(*) AS n
            FROM events GROUP BY 1, 2),
        c AS (
            SELECT ws, bucket, n,
                sum(n) OVER (PARTITION BY ws ORDER BY bucket)
                    AS cum,
                sum(n) OVER (PARTITION BY ws) AS total
            FROM h),
        q AS (SELECT unnest([2500, 5000, 9900]) AS q_bp),
        hit AS (
            SELECT ws, q_bp, bucket, total FROM c, q
            WHERE cum * 10000 >= q_bp * total),
        m AS (
            SELECT ws, q_bp, min(bucket) AS bucket,
                min(total) AS total
            FROM hit GROUP BY 1, 2)
        SELECT m.ws AS window_start, CAST(m.q_bp AS BIGINT) AS q_bp,
            CAST(m.bucket AS BIGINT) AS bucket,
            CAST(m.bucket * 100 AS BIGINT) AS est_lo,
            CAST((m.bucket + 1) * 100 - 1 AS BIGINT) AS est_hi,
            CAST(c2.cum AS BIGINT) AS cum_count,
            CAST(m.total AS BIGINT) AS total
        FROM m JOIN c c2 ON c2.ws = m.ws AND c2.bucket = m.bucket"""

    # CUPED: pooled integer moments, theta ppm, truncating-div chain.
    sql["events_cuped"] = """
        WITH pr AS (
            SELECT user_id AS u,
                CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
                CAST(round((CASE WHEN ts < TIMESTAMP '2024-01-16'
                    THEN value ELSE 0 END) * 100) AS BIGINT) AS px,
                CAST(round((CASE WHEN ts >= TIMESTAMP '2024-01-16'
                    THEN value ELSE 0 END) * 100) AS BIGINT) AS py
            FROM events),
        units AS (
            SELECT u, max(t) AS t, CAST(sum(px) AS HUGEINT) AS x,
                CAST(sum(py) AS HUGEINT) AS y
            FROM pr GROUP BY 1),
        m AS (
            SELECT CAST(count(*) AS HUGEINT) AS n,
                sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                sum(x * x) AS sxx,
                CAST(sum(t) AS HUGEINT) AS nt,
                sum(CASE WHEN t = 1 THEN x ELSE 0 END) AS sxt,
                sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS syt
            FROM units),
        d AS (
            SELECT n, nt, n - nt AS nc, sx - sxt AS sxc,
                sy - syt AS syc, sxt, syt,
                n * sxy - sx * sy AS covn,
                n * sxx - sx * sx AS varn
            FROM m
            WHERE nt > 0 AND n - nt > 0 AND n * sxx - sx * sx > 0),
        e AS (
            SELECT nt, nc,
                (CASE WHEN covn < 0 THEN -1 ELSE 1 END)
                    * ((1000000 * abs(covn)) // varn) AS theta,
                (1000000 * syt) // nt - (1000000 * syc) // nc AS dy,
                (1000000 * sxt) // nt - (1000000 * sxc) // nc AS dx
            FROM d)
        SELECT CAST(nt AS BIGINT) AS n_treat,
            CAST(nc AS BIGINT) AS n_control,
            CAST(dy AS BIGINT) AS raw_diff_microcents,
            CAST(theta AS BIGINT) AS theta_ppm,
            CAST(dy - (theta * dx) // 1000000 AS BIGINT)
                AS adj_diff_microcents
        FROM e"""

    # Score AUC: Mann-Whitney on (label, n_chars) — same cumulative
    # machinery as orders_mwu with a derived binary label.
    sql["doc_score_auc"] = """
        WITH t AS (
            SELECT CAST(round(CAST(n_chars AS DOUBLE) * 100)
                        AS BIGINT) AS v,
                (lang = 'en') AS a
            FROM documents),
        h AS (
            SELECT v, sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
            FROM t GROUP BY 1),
        n AS (SELECT CAST(sum(ca) AS HUGEINT) AS na,
                     CAST(sum(cb) AS HUGEINT) AS nb FROM h),
        c AS (
            SELECT v, ca, cb, sum(ca) OVER (ORDER BY v) AS cuma,
                sum(cb) OVER (ORDER BY v) AS cumb
            FROM h),
        s AS (
            SELECT sum(CAST(ca AS HUGEINT)
                       * (2 * (cuma + cumb) - (ca + cb) + 1))
                AS r1x2
            FROM c)
        SELECT CAST(n.na AS BIGINT) AS n_a,
            CAST(n.nb AS BIGINT) AS n_b,
            CAST(s.r1x2 - n.na * (n.na + 1) AS BIGINT) AS u_doubled,
            CAST((1000000 * (s.r1x2 - n.na * (n.na + 1)))
                 // (2 * n.na * n.nb) AS BIGINT) AS auc_ppm
        FROM s, n"""

    # MASE: seasonal-naive vs one-step naive absolute errors on the
    # daily sum series, aligned tail, one truncating div.
    sql["events_mase"] = """
        WITH b AS (
            SELECT event_type AS g, date_trunc('day', ts) AS d,
                CAST(sum(CAST(round(value * 100) AS BIGINT))
                     AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
        l AS (
            SELECT g, y, lag(y, 1) OVER w AS l1,
                lag(y, 7) OVER w AS ls
            FROM b WINDOW w AS (PARTITION BY g ORDER BY d)),
        a AS (
            SELECT g, count(*) AS n_terms,
                sum(abs(y - ls)) AS se, sum(abs(y - l1)) AS sn
            FROM l WHERE l1 IS NOT NULL AND ls IS NOT NULL
            GROUP BY 1)
        SELECT g AS event_type, CAST(n_terms AS BIGINT) AS n_terms,
            CAST(se AS BIGINT) AS sum_err_season_cents,
            CAST(sn AS BIGINT) AS sum_err_naive_cents,
            CAST((CAST(1000000 AS HUGEINT) * se) // sn AS BIGINT)
                AS mase_ppm
        FROM a WHERE sn > 0"""

    # Runs test: per-user median via row_number rank, sign flips
    # under (ts, event_id) order, 2ab/n + 1 benchmark in ppm.
    sql["events_runs"] = """
        WITH b AS (
            SELECT user_id, ts, event_id,
                CAST(round(value * 100) AS BIGINT) AS v
            FROM events),
        r AS (
            SELECT user_id, v,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY v) AS rn,
                count(*) OVER (PARTITION BY user_id) AS n
            FROM b),
        m AS (
            SELECT user_id,
                min(CASE WHEN rn >= (n + 1) // 2 THEN v END) AS med
            FROM r GROUP BY 1),
        s AS (
            SELECT b.user_id, b.ts, b.event_id,
                CASE WHEN b.v > m.med THEN 1 ELSE 0 END AS sgn
            FROM b JOIN m ON b.user_id = m.user_id
            WHERE b.v <> m.med),
        f AS (
            SELECT user_id, sgn,
                CASE WHEN lag(sgn) OVER w IS NOT NULL
                     AND lag(sgn) OVER w <> sgn
                THEN 1 ELSE 0 END AS flip
            FROM s
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts, event_id)),
        a AS (
            SELECT user_id, count(*) AS n_signs, sum(sgn) AS n_above,
                sum(1 - sgn) AS n_below, sum(flip) + 1 AS n_runs
            FROM f GROUP BY 1)
        SELECT user_id, CAST(n_signs AS BIGINT) AS n_signs,
            CAST(n_above AS BIGINT) AS n_above,
            CAST(n_below AS BIGINT) AS n_below,
            CAST(n_runs AS BIGINT) AS n_runs,
            CAST((CAST(2000000 AS HUGEINT) * n_above * n_below)
                 // n_signs + 1000000 AS BIGINT)
                AS expected_runs_ppm
        FROM a WHERE n_above > 0 AND n_below > 0"""

    # Last-digit GOF: digit spine, (10*O - N)^2 // (10*N) in ppm.
    sql["orders_lastdigit"] = """
        WITH b AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 10
                AS cat
            FROM orders),
        o AS (SELECT cat, count(*) AS o FROM b GROUP BY 1),
        n AS (SELECT CAST(sum(o) AS HUGEINT) AS N FROM o),
        sp AS (SELECT unnest(generate_series(0, 9)) AS cat),
        g AS (
            SELECT CAST(sp.cat AS BIGINT) AS cat,
                COALESCE(o.o, 0) AS o, n.N
            FROM sp CROSS JOIN n LEFT JOIN o ON o.cat = sp.cat)
        SELECT cat, CAST(o AS BIGINT) AS observed,
            CAST((1000000 * N) // 10 AS BIGINT) AS expected_ppm,
            CAST(((10 * CAST(o AS HUGEINT) - N)
                  * (10 * CAST(o AS HUGEINT) - N) * 1000000)
                 // (10 * N) AS BIGINT) AS contrib_ppm
        FROM g"""

    # Log-rank: duration grain with per-group splits, at-risk prefix
    # sums, per-time truncated-micro E and V terms over death times.
    sql["events_logrank"] = """
        WITH per_user AS (
            SELECT user_id, min(ts) AS first_ts,
                min(CASE WHEN event_type = 'purchase' THEN ts END)
                    AS death_ts,
                max(ts) AS last_ts
            FROM events GROUP BY 1),
        dur AS (
            SELECT date_diff('day', CAST(first_ts AS DATE),
                CAST(COALESCE(death_ts, last_ts) AS DATE)) AS t,
                CASE WHEN death_ts IS NOT NULL THEN 1 ELSE 0 END
                    AS ev,
                CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a
            FROM per_user),
        per_t AS (
            SELECT CAST(t AS BIGINT) AS t, sum(ev) AS d,
                sum(CASE WHEN a = 1 THEN ev ELSE 0 END) AS d1,
                count(*) AS c, sum(a) AS c1
            FROM dur GROUP BY 1),
        tot AS (SELECT sum(c) AS N, sum(c1) AS N1 FROM per_t),
        staged AS (
            SELECT t, d, d1,
                CAST((SELECT N FROM tot) - COALESCE(
                    sum(c) OVER w, 0) AS HUGEINT) AS n,
                CAST((SELECT N1 FROM tot) - COALESCE(
                    sum(c1) OVER w, 0) AS HUGEINT) AS n1
            FROM per_t
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED
                         PRECEDING AND 1 PRECEDING)),
        terms AS (
            SELECT d1,
                (CAST(1000000 AS HUGEINT) * d * n1) // n AS e_t,
                CASE WHEN n > 1 THEN
                    (CAST(1000000 AS HUGEINT) * d * n1 * (n - n1)
                     * (n - d)) // (n * n * (n - 1))
                ELSE 0 END AS v_t
            FROM staged WHERE d > 0)
        SELECT (SELECT CAST(N1 AS BIGINT) FROM tot) AS n_a,
            (SELECT CAST(N - N1 AS BIGINT) FROM tot) AS n_b,
            CAST(sum(d1) AS BIGINT) AS o_a,
            CAST(sum(e_t) AS BIGINT) AS e_a_micro,
            CAST(sum(v_t) AS BIGINT) AS v_micro
        FROM terms"""

    # Vocabulary growth: (source, token) grain, hapax = freq-1 types.
    sql["doc_vocab_growth"] = r"""
        WITH tok AS (
            SELECT source AS stratum,
                unnest(CASE WHEN trim(lower(text)) = '' THEN []
                    ELSE string_split_regex(trim(lower(text)), '\s+')
                    END) AS t
            FROM documents),
        g AS (
            SELECT stratum, t, count(*) AS c
            FROM tok WHERE t <> '' GROUP BY 1, 2),
        s AS (
            SELECT stratum, CAST(sum(c) AS BIGINT) AS n_tokens,
                CAST(count(*) AS BIGINT) AS n_types,
                CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_hapax
            FROM g GROUP BY 1)
        SELECT stratum, n_tokens, n_types, n_hapax,
            CAST((1000000 * n_types) // n_tokens AS BIGINT)
                AS ttr_ppm,
            CAST((1000000 * n_hapax) // n_types AS BIGINT)
                AS hapax_ppm
        FROM s"""

    # HHI concentration: (lang, source) grain, (1e6 * sum c^2) // N^2.
    sql["doc_source_hhi"] = """
        WITH g AS (
            SELECT lang, source, count(*) AS c
            FROM documents GROUP BY 1, 2)
        SELECT lang, CAST(sum(c) AS BIGINT) AS n_rows,
            CAST(count(*) AS BIGINT) AS n_sources,
            CAST((1000000 * sum(CAST(c AS HUGEINT) * c))
                 // (CAST(sum(c) AS HUGEINT) * sum(c)) AS BIGINT)
                AS hhi_ppm
        FROM g GROUP BY 1"""

    # Peak concurrency: +1/-1 sweep over distinct boundary instants,
    # max running sum with earliest-boundary tiebreak.
    sql["events_concurrency"] = """
        WITH pts AS (
            SELECT epoch_us(ts) AS t, 1 AS d FROM events
            UNION ALL
            SELECT epoch_us(ts) + 1800000000, -1 FROM events),
        h AS (SELECT t, sum(d) AS nd FROM pts GROUP BY 1),
        c AS (SELECT t, sum(nd) OVER (ORDER BY t) AS run FROM h),
        b AS (
            SELECT run, t, row_number() OVER (
                ORDER BY run DESC, t ASC) AS rn
            FROM c)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM events)
                AS n_intervals,
            CAST(run AS BIGINT) AS peak, CAST(t AS BIGINT) AS at_us
        FROM b WHERE rn = 1"""

    # Skyline: distinct-x max-y grain, strict suffix-max dominance,
    # vertex multiplicity from a join back to the facts.
    sql["orders_skyline"] = """
        WITH b AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x,
                CAST(date_diff('day', DATE '1970-01-01',
                     CAST(o_orderdate AS DATE)) * 100 AS BIGINT) AS y
            FROM orders),
        g AS (SELECT x, max(y) AS my FROM b GROUP BY 1),
        t AS (
            SELECT x, my, max(my) OVER (
                ORDER BY x DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS thr
            FROM g),
        f AS (SELECT x, my FROM t WHERE thr IS NULL OR my > thr)
        SELECT f.x AS x_cents, f.my AS y_cents,
            CAST(count(*) AS BIGINT) AS n_points
        FROM b JOIN f ON b.x = f.x AND b.y = f.my
        GROUP BY 1, 2"""

    # Mann-Whitney: doubled tie-averaged rank sum off the cumulative
    # frame; u_doubled = 2*R1 - na*(na+1); AUC one truncating div.
    sql["orders_mwu"] = """
        WITH t AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
                (o_orderpriority = '1-URGENT') AS a
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        h AS (
            SELECT v, sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
            FROM t GROUP BY 1),
        n AS (SELECT CAST(sum(ca) AS HUGEINT) AS na,
                     CAST(sum(cb) AS HUGEINT) AS nb FROM h),
        c AS (
            SELECT v, ca, cb, sum(ca) OVER (ORDER BY v) AS cuma,
                sum(cb) OVER (ORDER BY v) AS cumb
            FROM h),
        s AS (
            SELECT sum(CAST(ca AS HUGEINT)
                       * (2 * (cuma + cumb) - (ca + cb) + 1))
                AS r1x2
            FROM c)
        SELECT CAST(n.na AS BIGINT) AS n_a,
            CAST(n.nb AS BIGINT) AS n_b,
            CAST(s.r1x2 - n.na * (n.na + 1) AS BIGINT) AS u_doubled,
            CAST((1000000 * (s.r1x2 - n.na * (n.na + 1)))
                 // (2 * n.na * n.nb) AS BIGINT) AS auc_ppm
        FROM s, n"""


    # Per-class P/R/F1 of langid vs the stored label: pair grain,
    # full outer label set, exact ppm divisions.
    sql["doc_langid_eval"] = f"""
        WITH scores AS ({langid_scores}),
        pr AS (
            SELECT d.lang AS a, {langid_pred_case} AS b
            FROM scores s JOIN documents d ON s.doc_id = d.doc_id),
        pairs AS (SELECT a, b, count(*) AS n FROM pr GROUP BY 1, 2),
        sup AS (SELECT a AS label, sum(n) AS n_true
                FROM pairs GROUP BY 1),
        prd AS (SELECT b AS label, sum(n) AS n_pred
                FROM pairs GROUP BY 1),
        tp AS (SELECT a AS label, sum(n) AS tp
               FROM pairs WHERE a = b GROUP BY 1),
        grid AS (
            SELECT COALESCE(sup.label, prd.label) AS label,
                COALESCE(n_true, 0) AS n_true,
                COALESCE(n_pred, 0) AS n_pred
            FROM sup FULL JOIN prd ON sup.label = prd.label),
        g2 AS (
            SELECT grid.label, n_true, n_pred,
                COALESCE(tp.tp, 0) AS tp
            FROM grid LEFT JOIN tp ON tp.label = grid.label)
        SELECT label, CAST(n_true AS BIGINT) AS n_true,
            CAST(n_pred AS BIGINT) AS n_pred,
            CAST(tp AS BIGINT) AS tp,
            CAST(CASE WHEN n_pred > 0 THEN (1000000 * tp) // n_pred
                 ELSE 0 END AS BIGINT) AS precision_ppm,
            CAST(CASE WHEN n_true > 0 THEN (1000000 * tp) // n_true
                 ELSE 0 END AS BIGINT) AS recall_ppm,
            CAST(CASE WHEN n_true + n_pred > 0
                 THEN (2000000 * tp) // (n_true + n_pred)
                 ELSE 0 END AS BIGINT) AS f1_ppm
        FROM g2"""

    # Cohen's kappa: (A*N - sum R*C) / (N^2 - sum R*C) in exact ppm.
    sql["doc_kappa"] = f"""
        WITH scores AS ({langid_scores}),
        pr AS (
            SELECT d.lang AS a, {langid_pred_case} AS b
            FROM scores s JOIN documents d ON s.doc_id = d.doc_id),
        pairs AS (SELECT a, b, count(*) AS n FROM pr GROUP BY 1, 2),
        am AS (SELECT a AS l, sum(n) AS ra FROM pairs GROUP BY 1),
        bm AS (SELECT b AS l, sum(n) AS cb FROM pairs GROUP BY 1),
        pe AS (
            SELECT COALESCE(sum(CAST(am.ra AS HUGEINT) * bm.cb),
                            0) AS pe
            FROM am JOIN bm USING (l)),
        tot AS (
            SELECT CAST(sum(n) AS HUGEINT) AS N,
                CAST(sum(CASE WHEN a = b THEN n ELSE 0 END)
                     AS HUGEINT) AS A
            FROM pairs)
        SELECT CAST(tot.N AS BIGINT) AS n,
            CAST(tot.A AS BIGINT) AS n_agree,
            CAST((CASE WHEN tot.A * tot.N - pe.pe < 0 THEN -1
                  ELSE 1 END)
                 * ((1000000 * abs(tot.A * tot.N - pe.pe))
                    // (tot.N * tot.N - pe.pe)) AS BIGINT)
                AS kappa_ppm
        FROM tot, pe WHERE tot.N * tot.N - pe.pe > 0"""

    # Max drawdown: running sum + running peak windows, worst gap
    # picked by (dd desc, trough asc) — min(struct) on the Spark side.
    sql["events_drawdown"] = """
        WITH b AS (
            SELECT user_id, ts, event_id,
                CAST(round(value * (CASE WHEN event_type = 'error'
                    THEN -1 ELSE 1 END) * 100) AS BIGINT) AS x
            FROM events),
        c AS (
            SELECT user_id, ts, event_id,
                sum(x) OVER w AS c
            FROM b
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)),
        p AS (
            SELECT user_id, c,
                max(c) OVER (PARTITION BY user_id ORDER BY ts,
                    event_id ROWS UNBOUNDED PRECEDING) AS p
            FROM c),
        r AS (
            SELECT user_id, c, p, p - c AS dd, row_number() OVER (
                PARTITION BY user_id
                ORDER BY p - c DESC, c ASC) AS rn
            FROM p)
        SELECT r.user_id, s.n_rows, s.max_cum_cents,
            CAST(r.dd AS BIGINT) AS max_drawdown_cents,
            CAST(r.p AS BIGINT) AS peak_cents,
            CAST(r.c AS BIGINT) AS trough_cents
        FROM r JOIN (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(max(c) AS BIGINT) AS max_cum_cents
            FROM c GROUP BY 1) s ON s.user_id = r.user_id
        WHERE r.rn = 1"""

    # Kaplan-Meier: duration grain + the recursive-CTE replay of the
    # truncated product-limit recurrence.
    sql["events_km"] = """
        WITH RECURSIVE per_user AS (
            SELECT user_id, min(ts) AS first_ts,
                min(CASE WHEN event_type = 'purchase' THEN ts END)
                    AS death_ts,
                max(ts) AS last_ts
            FROM events GROUP BY 1),
        dur AS (
            SELECT date_diff('day', CAST(first_ts AS DATE),
                CAST(COALESCE(death_ts, last_ts) AS DATE)) AS t,
                CASE WHEN death_ts IS NOT NULL THEN 1 ELSE 0 END
                    AS ev
            FROM per_user),
        per_t AS (
            SELECT CAST(t AS BIGINT) AS t, sum(ev) AS d,
                sum(1 - ev) AS c
            FROM dur GROUP BY 1),
        tot AS (SELECT sum(d + c) AS N FROM per_t),
        step AS (
            SELECT t, d, c, row_number() OVER (ORDER BY t) AS i,
                CAST((SELECT N FROM tot) - COALESCE(
                    sum(d + c) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS HUGEINT) AS nar
            FROM per_t),
        r(i, s) AS (
            SELECT 0, CAST(1000000 AS HUGEINT)
            UNION ALL
            SELECT step.i,
                CASE WHEN step.d > 0
                    THEN (r.s * (step.nar - step.d)) // step.nar
                    ELSE r.s END
            FROM r JOIN step ON step.i = r.i + 1)
        SELECT step.t, CAST(step.nar AS BIGINT) AS n_at_risk,
            CAST(step.d AS BIGINT) AS n_deaths,
            CAST(step.c AS BIGINT) AS n_censored,
            CAST(r.s AS BIGINT) AS survival_ppm
        FROM r JOIN step ON step.i = r.i"""

    sql["doc_textrank"] = _guarded_oracle(_textrank_oracle,
                                          "doc_textrank")

    # Spearman: doubled centered average ranks (exact zero-sum
    # integers), staged rho^2 division as in orders_ols.
    sql["lineitem_spearman"] = """
        WITH b AS (
            SELECT l_returnflag AS g,
                CAST(round(l_quantity * 100) AS BIGINT) AS x,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem),
        r AS (
            SELECT g,
                CAST(2 * rank() OVER (PARTITION BY g ORDER BY x)
                     + count(*) OVER (PARTITION BY g, x)
                     - count(*) OVER (PARTITION BY g) - 2
                     AS HUGEINT) AS rx,
                CAST(2 * rank() OVER (PARTITION BY g ORDER BY y)
                     + count(*) OVER (PARTITION BY g, y)
                     - count(*) OVER (PARTITION BY g) - 2
                     AS HUGEINT) AS ry
            FROM b),
        m AS (
            SELECT g, count(*) AS n_rows, sum(rx * ry) AS num,
                sum(rx * rx) AS dx, sum(ry * ry) AS dy
            FROM r GROUP BY 1)
        SELECT g AS l_returnflag, CAST(n_rows AS BIGINT) AS n_rows,
            CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                 * (((1000000 * abs(num)) // dx * abs(num)) // dy)
                 AS BIGINT) AS signed_rho2_ppm
        FROM m WHERE dx > 0 AND dy > 0"""

    # Chi-square: full margin cross-product grid (structural zeros
    # included), per-cell truncated-ppm contributions.
    sql["events_chisq"] = """
        WITH p AS (
            SELECT event_type AS r,
                CAST(EXTRACT(hour FROM ts) AS BIGINT) AS c
            FROM events),
        o AS (SELECT r, c, count(*) AS o FROM p GROUP BY 1, 2),
        rm AS (SELECT r, sum(o) AS rm FROM o GROUP BY 1),
        cm AS (SELECT c, sum(o) AS cm FROM o GROUP BY 1),
        n AS (SELECT CAST(sum(o) AS HUGEINT) AS n FROM o),
        g AS (
            SELECT rm.r, cm.c, COALESCE(o.o, 0) AS o,
                CAST(rm.rm AS HUGEINT) AS rm,
                CAST(cm.cm AS HUGEINT) AS cm, n.n
            FROM rm CROSS JOIN cm CROSS JOIN n
            LEFT JOIN o ON o.r = rm.r AND o.c = cm.c),
        d AS (
            SELECT r, c, o, rm, cm, n,
                CAST(o AS HUGEINT) * n - rm * cm AS dev
            FROM g)
        SELECT r AS event_type, c AS hour,
            CAST(o AS BIGINT) AS observed,
            CAST((rm * cm * 1000000) // n AS BIGINT) AS expected_ppm,
            CAST((dev * dev * 1000000) // (rm * cm * n) AS BIGINT)
                AS contrib_ppm
        FROM d"""

    # Rolling median: sorted bounded ROWS frame, lower median at
    # ceil(n/2) — the exact window the Spark side builds.
    sql["events_rolling_median"] = """
        SELECT user_id, ts,
            CAST(round(value * 100) AS BIGINT) AS value_cents,
            list_sort(list(CAST(round(value * 100) AS BIGINT))
                      OVER w)[CAST(ceil(
                count(*) OVER w / 2.0) AS INT)] AS rolling_median_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"""

    # Winsorize: percentile_disc ranks via add-before-divide ceil
    # ((p*n + 1e6-1) // 1e6; // truncates), clamp + re-sum in cents.
    sql["orders_winsorize"] = """
        WITH b AS (
            SELECT o_orderpriority AS g,
                CAST(round(o_totalprice * 100) AS BIGINT) AS v
            FROM orders),
        r AS (
            SELECT g, v,
                row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
                count(*) OVER (PARTITION BY g) AS n
            FROM b),
        q AS (
            SELECT g, max(n) AS n_rows,
                min(CASE WHEN rn >= (CAST(50000 AS HUGEINT) * n
                                     + 999999) // 1000000
                    THEN v END) AS lo,
                min(CASE WHEN rn >= (CAST(950000 AS HUGEINT) * n
                                     + 999999) // 1000000
                    THEN v END) AS hi
            FROM r GROUP BY 1)
        SELECT b.g AS o_orderpriority,
            CAST(max(q.n_rows) AS BIGINT) AS n_rows,
            CAST(max(q.lo) AS BIGINT) AS lo_cents,
            CAST(max(q.hi) AS BIGINT) AS hi_cents,
            CAST(sum(greatest(least(b.v, q.hi), q.lo)) AS BIGINT)
                AS winsorized_sum_cents,
            CAST(sum(CASE WHEN b.v < q.lo THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_clamped_lo,
            CAST(sum(CASE WHEN b.v > q.hi THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_clamped_hi
        FROM b JOIN q ON b.g = q.g GROUP BY 1"""

    # Inter-arrival gaps: lag micros per key; gap multiset is
    # invariant under tie order, so aggregates are deterministic.
    sql["orders_interarrival"] = """
        WITH l AS (
            SELECT o_custkey,
                epoch_us(o_orderdate) - lag(epoch_us(o_orderdate))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate) AS g
            FROM orders)
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
            CAST(min(g) AS BIGINT) AS min_gap_us,
            CAST(max(g) AS BIGINT) AS max_gap_us,
            CAST(sum(g) // count(*) AS BIGINT) AS avg_gap_us
        FROM l WHERE g IS NOT NULL GROUP BY 1"""

    # Mode: highest count then smallest value.
    sql["events_mode"] = """
        WITH c AS (
            SELECT user_id, event_type AS v, count(*) AS cnt
            FROM events GROUP BY 1, 2),
        r AS (
            SELECT user_id, v, cnt, row_number() OVER (
                PARTITION BY user_id
                ORDER BY cnt DESC, v ASC) AS rn
            FROM c)
        SELECT user_id, v AS mode_value,
            CAST(cnt AS BIGINT) AS mode_count
        FROM r WHERE rn = 1"""

    return sql


# -- deterministic-ANN oracle generation ------------------------------------

_EMB_TOPK_SQL = """
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            list_dot_product(CAST(q.embedding AS DOUBLE[]),
                             CAST(c.embedding AS DOUBLE[]))
            / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                     CAST(q.embedding AS DOUBLE[])))
             * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                     CAST(c.embedding AS DOUBLE[]))))
                AS cosine
        FROM embeddings q JOIN embeddings c
            ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cosine,
            row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id)
                AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
        CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5"""


_COSINE_RANKED = """
    scored AS (
        SELECT query_id, neighbor_id,
            list_dot_product(qv, cv)
            / (sqrt(list_dot_product(qv, qv))
             * sqrt(list_dot_product(cv, cv))) AS cosine
        FROM cand
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cosine,
            row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
        CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5"""


def _oracle_sf_dir() -> str:
    """Scale-factor dir the data-dependent oracles are generated for.

    The driver's correctness gate always compares at sf0.01; the local
    mirror (tools/check_correctness.py) overrides via env so oracle and
    query see the same data."""
    import os

    return os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def _emb_dim() -> int:
    import duckdb

    path = f"{_oracle_sf_dir()}/embeddings.parquet"
    return duckdb.sql(
        f"SELECT len(embedding) FROM read_parquet('{path}') LIMIT 1"
    ).fetchone()[0]


def _sql_dvec(row) -> str:
    """A DOUBLE[] literal; repr() round-trips binary64 exactly, so the
    parsed values equal the F.lit doubles in the Spark plan."""
    return "[" + ", ".join(repr(float(x)) for x in row) + "]::DOUBLE[]"


def _emb_ann_oracle() -> str:
    """Replicates ann_lsh_cosine(k=5, num_planes=8, num_tables=2,
    seed=42) exactly: same md5-derived hyperplanes (embedded as
    literals), same sign-bit bucket ids, same bucket equi-join candidate
    set, same exact-cosine rank."""
    from cubes_spark.llm.similarity import _plane_components

    dim = _emb_dim()
    rows = []
    for t in range(2):
        for p, prow in enumerate(_plane_components(8, dim, 42 + 7919 * t)):
            rows.append(f"({t}, {1 << p}, {_sql_dvec(prow)})")
    planes = ",\n            ".join(rows)
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    planes(tbl, w, pv) AS (VALUES
            {planes}),
    bucketed AS (
        SELECT e.vec_id, pl.tbl,
            SUM(CASE WHEN list_dot_product(e.v, pl.pv) > 0
                THEN pl.w ELSE 0 END) AS bucket
        FROM e CROSS JOIN planes pl
        GROUP BY e.vec_id, pl.tbl
    ),
    cand AS (
        SELECT DISTINCT p.query_id, p.neighbor_id, q.v AS qv, c.v AS cv
        FROM (
            SELECT l.vec_id AS query_id, r.vec_id AS neighbor_id
            FROM bucketed l
            JOIN bucketed r
              ON l.tbl = r.tbl AND l.bucket = r.bucket
             AND l.vec_id <> r.vec_id
        ) p
        JOIN e q ON q.vec_id = p.query_id
        JOIN e c ON c.vec_id = p.neighbor_id
    ),{_COSINE_RANKED}"""


def _emb_ivf_oracle() -> str:
    """Replicates ivf_topk(k=5, nlist=16, nprobe=4, seed=42,
    sample_size=4096): retrains the identical fixed-seed spherical
    k-means on the identical sorted sample and embeds the centroids as
    literals; assignment = nearest centroid, probing = 4 nearest, ties
    by cluster id — exactly the Spark plan's array_sort semantics."""
    import duckdb
    import numpy as np

    from cubes_spark.llm.similarity import train_spherical_kmeans

    path = f"{_oracle_sf_dir()}/embeddings.parquet"
    sample = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{path}') "
        "ORDER BY vec_id LIMIT 4096"
    ).fetchall()
    X = np.array([r[0] for r in sample], dtype=np.float64)
    cent = train_spherical_kmeans(X, 16, 42)
    values = ",\n            ".join(
        f"({i + 1}, {_sql_dvec(row)})" for i, row in enumerate(cent)
    )
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent(cluster, cv) AS (VALUES
            {values}),
    sims AS (
        SELECT e.vec_id, e.v, c.cluster,
            list_dot_product(e.v, c.cv) AS sim
        FROM e CROSS JOIN cent c
    ),
    cranked AS (
        SELECT vec_id, v, cluster,
            row_number() OVER (PARTITION BY vec_id
                               ORDER BY sim DESC, cluster) AS crank
        FROM sims
    ),
    assigned AS (
        SELECT vec_id AS neighbor_id, v AS nv, cluster
        FROM cranked WHERE crank = 1
    ),
    probed AS (
        SELECT vec_id AS query_id, v AS qv, cluster
        FROM cranked WHERE crank <= 4
    ),
    cand AS (
        SELECT query_id, neighbor_id, qv, nv AS cv
        FROM probed JOIN assigned USING (cluster)
        WHERE query_id <> neighbor_id
    ),{_COSINE_RANKED}"""


_QUALITY_FEATURES_SQL = """
    SELECT doc_id,
        round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 4)
            AS len_score,
        avg_token_len, punct_ratio, digit_ratio, stopword_ratio_en,
        CASE WHEN quality_score >= 0.5 THEN 1 ELSE 0 END AS label
    FROM derived
"""


def _guarded_oracle(builder, label):
    """Data-dependent oracle generation that cannot take the whole
    gate down: a generator failure (e.g. a scale dir missing the
    table it trains on) yields a marker that errors LOUDLY if that
    one oracle is actually used, while every other entry still
    verifies."""
    try:
        return builder()
    except Exception as exc:  # noqa: BLE001 — any generator failure
        return (f"ORACLE GENERATOR FAILED for {label}: "
                f"{type(exc).__name__}: {exc}")


def _quality_weights() -> list:
    """Retrains the identical quality model for the oracle: the same
    rounded features (DuckDB replica of text_stats — oracle-exact),
    the same first-256 sample, the same numpy IRLS."""
    import duckdb
    import numpy as np

    from cubes_spark.llm.quality import QUALITY_FEATURES, _irls

    path = f"{_oracle_sf_dir()}/documents.parquet"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    rows = con.execute(f"""
        WITH base AS ({_text_stats_sql()}),
        derived AS ({_TEXT_STATS_DERIVED})
        SELECT * FROM ({_QUALITY_FEATURES_SQL})
        ORDER BY doc_id LIMIT 256""").fetchall()
    X = np.array([[1.0] + [float(v) for v in r[1:6]] for r in rows])
    y = np.array([float(r[6]) for r in rows])
    return _irls(X, y, 25, 1e-3)


#: DuckDB replica of llm.quality._dsir_buckets for one gram string
_DSIR_BUCKET = ("(CAST(concat('0x', substr(md5('dsir:' || {g}), 1, 15)) "
                "AS BIGINT) % 128)")

#: unigrams + word bigrams of the whitespace tokens (DuckDB lists are
#: 1-based; range(1, n) is [1, n) so i+1 stays in bounds)
_DSIR_GRAMS_CTE = f"""
    toks AS (
        SELECT doc_id, lang, {_TOKENS} AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, lang,
            list_concat(t, CASE WHEN len(t) >= 2 THEN
                list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i + 1])
                ELSE [] END) AS g
        FROM toks
    )"""


def _pq_oracle() -> str:
    """Retrains the identical PQ codebooks (same id-ordered sample,
    same numpy per-subspace k-means) and replays encode (min_by over
    quantized subspace distances, ties to the lowest codeword) and the
    ADC scan with the SAME left-associated IEEE term order as the
    Spark folds."""
    import duckdb
    import numpy as np

    from cubes_spark.llm.similarity import train_pq_codebooks

    m, ksub_req, seed, k = 8, 16, 42, 5
    path = f"{_oracle_sf_dir()}/embeddings.parquet"
    sample = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{path}') "
        "ORDER BY vec_id LIMIT 4096").fetchall()
    X = np.array([r[0] for r in sample], dtype=np.float64)
    books = train_pq_codebooks(X, m, ksub_req, seed)
    ksub, dsub = len(books[0]), len(books[0][0])
    cb = "[" + ", ".join(
        "[" + ", ".join(
            "[" + ", ".join(repr(v) for v in row) + "]"
            for row in book) + "]"
        for book in books) + "]"
    # encode distance for runtime columns j, c (left-assoc = the fold)
    enc_terms = " + ".join(
        f"((v[j*{dsub} + {d + 1}] - CB[j+1][c+1][{d + 1}]) "
        f"* (v[j*{dsub} + {d + 1}] - CB[j+1][c+1][{d + 1}]))"
        for d in range(dsub))
    # ADC: per-subspace quantized terms, j unrolled statically
    adc_terms = " + ".join(
        "CAST(round((" + " + ".join(
            f"((qv[{j * dsub + d + 1}] - CB[{j + 1}][code[{j + 1}]+1][{d + 1}]) "
            f"* (qv[{j * dsub + d + 1}] - CB[{j + 1}][code[{j + 1}]+1][{d + 1}]))"
            for d in range(dsub))
        + ") * 1000000000000.0) AS BIGINT)"
        for j in range(m))
    return f"""
    WITH cbs AS (SELECT {cb} AS CB),
    e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    enc AS MATERIALIZED (
        SELECT vec_id, j,
            min_by(c, dq * {ksub} + c) AS code_j
        FROM (
            SELECT e.vec_id, r1.j, r2.c,
                CAST(round(({enc_terms}) * 1000000000000.0)
                     AS BIGINT) AS dq
            FROM e CROSS JOIN cbs
            CROSS JOIN range(0, {m}) r1(j)
            CROSS JOIN range(0, {ksub}) r2(c)
        ) GROUP BY vec_id, j
    ),
    codes AS MATERIALIZED (
        SELECT vec_id, list(code_j ORDER BY j) AS code
        FROM enc GROUP BY 1
    ),
    q AS (
        SELECT vec_id AS query_id, v AS qv FROM e
        WHERE vec_id % 50 = 0
    ),
    dists AS (
        SELECT q.query_id, c2.vec_id AS neighbor_id,
            ({adc_terms}) AS adc_dist_q
        FROM codes c2 CROSS JOIN q CROSS JOIN cbs
        WHERE q.query_id <> c2.vec_id
    )
    SELECT query_id, neighbor_id, adc_dist_q,
        CAST(row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_dist_q, neighbor_id)
             AS BIGINT) AS rank
    FROM dists QUALIFY rank <= {k}"""


def _emb_pq_recall_oracle() -> str:
    """Recall@1 of the PQ ADC scan vs exact cosine top-1 over the
    planted-duplicate corpus: retrains the identical codebooks on the
    identically-constructed augmented sample, replays encode + ADC
    (same quantized int64 arithmetic as _pq_oracle) and the exact
    ranking, then emits the Spark entry's counts."""
    import duckdb
    import numpy as np

    from cubes_spark.llm.similarity import train_pq_codebooks

    m, ksub_req, seed = 8, 16, 42
    path = f"{_oracle_sf_dir()}/embeddings.parquet"
    sample = duckdb.sql(f"""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM read_parquet('{path}')
        ),
        aug AS (
            SELECT vec_id, v FROM base
            UNION ALL
            SELECT vec_id + 10000000, list_prepend(v[1] + 0.2, v[2:])
            FROM base WHERE vec_id % 10 = 0
        )
        SELECT v FROM aug ORDER BY vec_id LIMIT 4096""").fetchall()
    X = np.array([r[0] for r in sample], dtype=np.float64)
    books = train_pq_codebooks(X, m, ksub_req, seed)
    ksub, dsub = len(books[0]), len(books[0][0])
    cb = "[" + ", ".join(
        "[" + ", ".join(
            "[" + ", ".join(repr(v) for v in row) + "]"
            for row in book) + "]"
        for book in books) + "]"
    enc_terms = " + ".join(
        f"((v[j*{dsub} + {d + 1}] - CB[j+1][c+1][{d + 1}]) "
        f"* (v[j*{dsub} + {d + 1}] - CB[j+1][c+1][{d + 1}]))"
        for d in range(dsub))
    adc_terms = " + ".join(
        "CAST(round((" + " + ".join(
            f"((qv[{j * dsub + d + 1}] - CB[{j + 1}][code[{j + 1}]+1][{d + 1}]) "
            f"* (qv[{j * dsub + d + 1}] - CB[{j + 1}][code[{j + 1}]+1][{d + 1}]))"
            for d in range(dsub))
        + ") * 1000000000000.0) AS BIGINT)"
        for j in range(m))
    return f"""
    WITH {_AUG_CORPUS_SQL},
    cbs AS (SELECT {cb} AS CB),
    enc AS MATERIALIZED (
        SELECT vec_id, j,
            min_by(c, dq * {ksub} + c) AS code_j
        FROM (
            SELECT aug.vec_id, r1.j, r2.c,
                CAST(round(({enc_terms}) * 1000000000000.0)
                     AS BIGINT) AS dq
            FROM aug CROSS JOIN cbs
            CROSS JOIN range(0, {m}) r1(j)
            CROSS JOIN range(0, {ksub}) r2(c)
        ) GROUP BY vec_id, j
    ),
    codes AS MATERIALIZED (
        SELECT vec_id, list(code_j ORDER BY j) AS code
        FROM enc GROUP BY 1
    ),
    q AS (
        SELECT vec_id AS query_id, v AS qv FROM aug
        WHERE vec_id >= 10000000
    ),
    pq AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c2.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY q.query_id
                    ORDER BY ({adc_terms}), c2.vec_id) AS rank
            FROM codes c2 CROSS JOIN q CROSS JOIN cbs
            WHERE q.query_id <> c2.vec_id
        ) WHERE rank = 1
    ),
    cos AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            list_dot_product(q.v, c.v)
            / (sqrt(list_dot_product(q.v, q.v))
             * sqrt(list_dot_product(c.v, c.v))) AS cosine
        FROM aug q JOIN aug c ON q.vec_id <> c.vec_id
        WHERE q.vec_id >= 10000000
    ),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id)
                    AS rank
            FROM cos
        ) WHERE rank = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(COUNT(a.query_id) AS BIGINT) AS n_hit,
        CAST(COUNT(a.query_id) * 10000 // COUNT(*) AS BIGINT)
            AS recall_bp,
        COUNT(a.query_id) * 10 >= COUNT(*) * 8 AS recall_ok
    FROM exact x LEFT JOIN pq a
        ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id"""


def _dsir_sample_oracle() -> str:
    """doc_dsir's scoring CTE plus the Gumbel-top-k replay: the same
    md5-seeded uniform, the same ``-ln(-ln u)`` noise, the same
    ``log w + g`` key rounded to 6 decimals."""
    import duckdb

    from cubes_spark.llm.quality import dsir_log_ratios

    path = f"{_oracle_sf_dir()}/documents.parquet"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")

    def counts(where: str) -> list:
        rows = con.execute(f"""
            WITH {_DSIR_GRAMS_CTE}
            SELECT {_DSIR_BUCKET.format(g='gram')} AS b, count(*)
            FROM (SELECT unnest(g) AS gram FROM grams {where})
            GROUP BY 1""").fetchall()
        out = [0] * 128
        for b, n in rows:
            out[int(b)] = int(n)
        return out

    ratios_q = dsir_log_ratios(counts("WHERE lang = 'en'"),
                               counts(""))
    lr = "[" + ", ".join(str(v) for v in ratios_q) + "]"
    gum = ("(- ln(- ln((CAST(CAST(concat('0x', substr(md5('gumbel:' "
           "|| CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) "
           "AS DOUBLE) + 1.0) / 1152921504606846977.0)))")
    return f"""
    WITH {_DSIR_GRAMS_CTE},
    scored AS MATERIALIZED (
        SELECT doc_id, lang,
            CAST(COALESCE(list_sum(list_transform(g,
                x -> ({lr})[{_DSIR_BUCKET.format(g='x')} + 1])), 0)
                AS BIGINT) AS dsir_score_q
        FROM grams
    ),
    keyed AS (
        SELECT doc_id, lang, dsir_score_q,
            round(CAST(dsir_score_q AS DOUBLE) * 1e-06 + {gum}, 6)
                AS gumbel_key
        FROM scored
    )
    SELECT doc_id, lang, dsir_score_q, gumbel_key,
        CAST(row_number() OVER (ORDER BY gumbel_key DESC, doc_id)
             AS BIGINT) AS rank
    FROM keyed ORDER BY rank LIMIT 64"""


def _bm25_oracle() -> str:
    """Recomputes N/avgdl/per-term document frequencies in DuckDB,
    takes the SAME ``math.log`` idf doubles as the operator (both are
    driver-side Python on identical integer counts), and replays the
    scoring with the identical IEEE expression order; contributions
    quantize to int64 1e-9 units exactly like llm.text.bm25_search."""
    import duckdb
    import math

    k1, b = 1.2, 0.75
    terms_sql = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    path = f"{_oracle_sf_dir()}/documents.parquet"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    n_docs, total = con.execute(f"""
        SELECT count(*), COALESCE(SUM(len({_TOKENS})), 0)
        FROM documents""").fetchone()
    n_docs, total = int(n_docs), int(total)
    avgdl = (total / n_docs) if n_docs and total else 1.0
    dfs = dict(con.execute(f"""
        SELECT term, count(*) FROM (
            SELECT DISTINCT doc_id, unnest({_TOKENS}) AS term
            FROM documents)
        WHERE term IN ({terms_sql}) GROUP BY 1""").fetchall())
    idf_case = "CASE term " + " ".join(
        f"WHEN '{t}' THEN {math.log((n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5) + 1.0)!r}"
        for t in _BM25_TERMS) + " ELSE 0.0 END"
    return f"""
    WITH postings AS MATERIALIZED (
        SELECT doc_id, term, count(*) AS tf FROM (
            SELECT doc_id, unnest({_TOKENS}) AS term FROM documents)
        WHERE term IN ({terms_sql})
        GROUP BY 1, 2
    ),
    lens AS (
        SELECT doc_id, len({_TOKENS}) AS dl FROM documents
    ),
    contrib AS (
        SELECT p.doc_id,
            CAST(round((({idf_case})
                * (CAST(tf AS DOUBLE) * {k1 + 1.0!r})
                / (CAST(tf AS DOUBLE)
                   + {k1!r} * ({1.0 - b!r}
                               + {b!r} * CAST(dl AS DOUBLE)
                               / {avgdl!r})))
                * 1000000000.0) AS BIGINT) AS cq
        FROM postings p JOIN lens l USING (doc_id)
    ),
    scored AS (
        SELECT doc_id, CAST(SUM(cq) AS BIGINT) AS score_q,
            CAST(count(*) AS BIGINT) AS n_hit_terms
        FROM contrib GROUP BY 1
    )
    SELECT doc_id, score_q, n_hit_terms,
        CAST(row_number() OVER (ORDER BY score_q DESC, doc_id)
             AS BIGINT) AS rank
    FROM scored ORDER BY rank LIMIT 20"""


def _lpa_oracle() -> str:
    """Unrolls label_propagation's 3 synchronous rounds in SQL —
    same undirected-distinct edges, same most-frequent/min-tie label
    choice, same keep-own for neighborless nodes."""
    rounds = 3
    parts = ["""e0 AS (
        SELECT doc_id AS src,
            (doc_id // 50) * 50 + ((doc_id % 50 + 1) % 50) AS dst
        FROM documents
    ),
    und AS MATERIALIZED (
        SELECT src AS s, dst AS d FROM e0
        UNION
        SELECT dst, src FROM e0
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT s AS node FROM und),
    r0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"""]
    for k in range(1, rounds + 1):
        parts.append(f"""c{k} AS MATERIALIZED (
        SELECT u.s AS node, l.label, count(*) AS c
        FROM und u JOIN r{k - 1} l ON u.d = l.node
        GROUP BY 1, 2
    ),
    b{k} AS MATERIALIZED (
        SELECT node, label FROM (
            SELECT node, label,
                row_number() OVER (PARTITION BY node
                                   ORDER BY c DESC, label) AS rn
            FROM c{k}
        ) WHERE rn = 1
    ),
    r{k} AS MATERIALIZED (
        SELECT n.node, COALESCE(b.label, n.node) AS label
        FROM nodes n LEFT JOIN b{k} b USING (node)
    )""")
    return ("WITH " + ",\n    ".join(parts)
            + f"\n    SELECT node, label FROM r{rounds}")


def _dsir_oracle() -> str:
    """Independently recounts the target (lang='en') and raw hashed
    n-gram distributions in DuckDB, recomputes the quantized log
    ratios with the shared deterministic arithmetic
    (llm.quality.dsir_log_ratios), and replays the per-document int64
    scoring with the ratio table as a literal list."""
    import duckdb

    from cubes_spark.llm.quality import dsir_log_ratios

    path = f"{_oracle_sf_dir()}/documents.parquet"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")

    def counts(where: str) -> list:
        rows = con.execute(f"""
            WITH {_DSIR_GRAMS_CTE}
            SELECT {_DSIR_BUCKET.format(g='gram')} AS b, count(*)
            FROM (SELECT unnest(g) AS gram FROM grams {where})
            GROUP BY 1""").fetchall()
        out = [0] * 128
        for b, n in rows:
            out[int(b)] = int(n)
        return out

    ratios_q = dsir_log_ratios(counts("WHERE lang = 'en'"),
                               counts(""))
    lr = "[" + ", ".join(str(v) for v in ratios_q) + "]"
    return f"""
    WITH {_DSIR_GRAMS_CTE}
    SELECT doc_id, lang,
        CAST(COALESCE(list_sum(list_transform(g,
            x -> ({lr})[{_DSIR_BUCKET.format(g='x')} + 1])), 0)
            AS BIGINT) AS dsir_score_q,
        CAST(len(g) AS BIGINT) AS n_grams
    FROM grams"""


def _kmeans_cent_values() -> str:
    """Centroid VALUES rows for the kmeans/semdedup oracles: retrains
    the identical fixed-seed spherical k-means (nlist=16, seed=42,
    sample_size=4096) on the identical id-sorted sample — same recipe
    as _emb_ivf_oracle."""
    import duckdb
    import numpy as np

    from cubes_spark.llm.similarity import train_spherical_kmeans

    path = f"{_oracle_sf_dir()}/embeddings.parquet"
    sample = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{path}') "
        "ORDER BY vec_id LIMIT 4096"
    ).fetchall()
    X = np.array([r[0] for r in sample], dtype=np.float64)
    cent = train_spherical_kmeans(X, 16, 42)
    return ",\n            ".join(
        f"({i + 1}, {_sql_dvec(row)})" for i, row in enumerate(cent)
    )


_KMEANS_ASSIGNED_CTE = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent(cluster, cv) AS (VALUES
            {values}),
    sims AS (
        SELECT e.vec_id, e.v, c.cluster,
            list_dot_product(e.v, c.cv) AS sim
        FROM e CROSS JOIN cent c
    ),
    cranked AS (
        SELECT vec_id, v, cluster, sim,
            row_number() OVER (PARTITION BY vec_id
                               ORDER BY sim DESC, cluster) AS crank
        FROM sims
    ),
    assigned AS (
        SELECT vec_id, v, cluster, sim FROM cranked WHERE crank = 1
    )"""


def _emb_kmeans_oracle() -> str:
    cte = _KMEANS_ASSIGNED_CTE.format(values=_kmeans_cent_values())
    return cte + """
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
        round(sim, 6) AS centroid_sim
    FROM assigned"""


def _emb_semdedup_greedy_oracle(max_rounds: int = 8) -> str:
    """Unrolls semantic_dedup_greedy's decidability rounds as chained
    CTEs: d1 = unconstrained vectors (kept); d{k+1} adds every vector
    whose lower-id neighbours are all in d{k}, kept iff none of them
    is kept.  max_rounds-1 progress rounds, exactly like the Spark
    loop; undecided-at-cap vectors land as dropped via the final left
    join's COALESCE(FALSE)."""
    cte = _KMEANS_ASSIGNED_CTE.format(values=_kmeans_cent_values())
    parts = [cte + """
    , edges AS MATERIALIZED (
        SELECT r.vec_id AS v, l.vec_id AS u
        FROM assigned l JOIN assigned r
            ON l.cluster = r.cluster AND l.vec_id < r.vec_id
        WHERE list_dot_product(l.v, r.v)
              / (sqrt(list_dot_product(l.v, l.v))
               * sqrt(list_dot_product(r.v, r.v))) >= 0.35
    ),
    deg AS MATERIALIZED (
        SELECT v, COUNT(*) AS n FROM edges GROUP BY v),
    d1 AS MATERIALIZED (
        SELECT a.vec_id AS v, TRUE AS kept
        FROM assigned a LEFT JOIN deg ON a.vec_id = deg.v
        WHERE deg.v IS NULL
    )"""]
    for k in range(1, max_rounds):
        parts.append(f""",
    d{k + 1} AS MATERIALIZED (
        SELECT * FROM d{k}
        UNION ALL
        SELECT e.v,
            (SUM(CASE WHEN s.kept THEN 1 ELSE 0 END) = 0) AS kept
        FROM edges e
        JOIN d{k} s ON e.u = s.v
        JOIN deg ON deg.v = e.v
        WHERE e.v NOT IN (SELECT v FROM d{k})
        GROUP BY e.v, deg.n
        HAVING COUNT(*) = deg.n
    )""")
    parts.append(f"""
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
        CAST(CASE WHEN COALESCE(d.kept, FALSE) THEN 1 ELSE 0 END
             AS BIGINT) AS is_kept
    FROM assigned a LEFT JOIN d{max_rounds} d ON a.vec_id = d.v""")
    return "".join(parts)


def _emb_semdedup_oracle() -> str:
    cte = _KMEANS_ASSIGNED_CTE.format(values=_kmeans_cent_values())
    return cte + """
    , drops AS (
        SELECT DISTINCT r.vec_id
        FROM assigned l JOIN assigned r
            ON l.cluster = r.cluster AND l.vec_id < r.vec_id
        WHERE list_dot_product(l.v, r.v)
              / (sqrt(list_dot_product(l.v, l.v))
               * sqrt(list_dot_product(r.v, r.v))) >= 0.35
    )
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
        CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
            AS is_kept
    FROM assigned a LEFT JOIN drops d ON a.vec_id = d.vec_id"""


_AUG_CORPUS_SQL = """
    base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    aug AS (
        SELECT vec_id, v FROM base
        UNION ALL
        SELECT vec_id + 10000000, list_prepend(v[1] + 0.2, v[2:])
        FROM base WHERE vec_id % 10 = 0
    )"""


def _aug_bucketed_sql(num_tables: int, num_planes: int) -> str:
    """LSH (table, bucket) assignment CTEs over the augmented corpus —
    same md5-derived plane literals the engine folds over."""
    from cubes_spark.llm.similarity import _plane_components

    dim = _emb_dim()
    rows = []
    for t in range(num_tables):
        for p, prow in enumerate(
                _plane_components(num_planes, dim, 42 + 7919 * t)):
            rows.append(f"({t}, {1 << p}, {_sql_dvec(prow)})")
    planes = ",\n            ".join(rows)
    return f"""
    planes(tbl, w, pv) AS (VALUES
            {planes}),
    bucketed AS (
        SELECT aug.vec_id, aug.v, pl.tbl,
            SUM(CASE WHEN list_dot_product(aug.v, pl.pv) > 0
                THEN pl.w ELSE 0 END) AS bucket
        FROM aug CROSS JOIN planes pl
        GROUP BY aug.vec_id, aug.v, pl.tbl
    )"""


def _emb_projection_oracle() -> str:
    """Replays random_projection(out_dim=8, seed=42): the identical
    md5-derived, 1/sqrt(8)-scaled plane rows as literals."""
    import math

    from cubes_spark.llm.similarity import _plane_components

    dim = _emb_dim()
    scale = 1.0 / math.sqrt(8)
    rows = []
    for p, prow in enumerate(_plane_components(8, dim, 42)):
        rows.append(f"({p}, {_sql_dvec([x * scale for x in prow])})")
    planes = ",\n            ".join(rows)
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id % 25 = 0
        ),
        planes(idx, pv) AS (VALUES
            {planes})
        SELECT e.vec_id, CAST(p.idx AS BIGINT) AS idx,
            round(list_dot_product(e.v, p.pv), 6) AS value
        FROM e CROSS JOIN planes p"""


def _doc_dup_clusters_oracle() -> str:
    """Union-find over the pairs produced by the doc_minhash oracle SQL
    (an INDEPENDENT pair derivation — DuckDB recomputes the full
    MinHash/banding pipeline), embedded as literal rows.  Singletons
    are their own component."""
    import duckdb

    con = duckdb.connect()
    path = _oracle_sf_dir()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{path}/documents.parquet')"
    )
    pair_sql = f"""
        {_minhash_cte()}
        SELECT id_a, id_b FROM pairs"""
    pairs = con.execute(pair_sql).fetchall()
    doc_ids = [r[0] for r in
               con.execute("SELECT doc_id FROM documents").fetchall()]
    con.close()

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    rows = []
    for doc_id in sorted(doc_ids):
        comp = find(doc_id)
        rows.append(f"({doc_id}, {comp}, {str(comp == doc_id).upper()})")
    values = ",\n            ".join(rows)
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
            CAST(component AS BIGINT) AS component, is_canonical
        FROM (VALUES
            {values}) AS t(doc_id, component, is_canonical)"""


def _emb_ann_recall_oracle() -> str:
    """Recall@1 of the deterministic LSH ANN vs the exact top-1 over
    the planted-duplicate corpus, both recomputed independently in
    SQL; integer basis points, so no cross-engine float rounding."""
    return f"""
    WITH {_AUG_CORPUS_SQL},
    {_aug_bucketed_sql(4, 8)},
    cos AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            list_dot_product(q.v, c.v)
            / (sqrt(list_dot_product(q.v, q.v))
             * sqrt(list_dot_product(c.v, c.v))) AS cosine
        FROM aug q JOIN aug c ON q.vec_id <> c.vec_id
        WHERE q.vec_id >= 10000000
    ),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id)
                    AS rank
            FROM cos
        ) WHERE rank = 1
    ),
    cand AS (
        SELECT DISTINCT l.vec_id AS query_id, r.vec_id AS neighbor_id
        FROM bucketed l
        JOIN bucketed r
          ON l.tbl = r.tbl AND l.bucket = r.bucket
         AND l.vec_id <> r.vec_id
        WHERE l.vec_id >= 10000000
    ),
    ann AS (
        SELECT query_id, neighbor_id FROM (
            SELECT c.query_id, c.neighbor_id,
                row_number() OVER (PARTITION BY c.query_id
                                   ORDER BY k.cosine DESC, c.neighbor_id)
                    AS rank
            FROM cand c JOIN cos k
                ON k.query_id = c.query_id
               AND k.neighbor_id = c.neighbor_id
        ) WHERE rank = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(COUNT(a.query_id) AS BIGINT) AS n_hit,
        CAST(COUNT(a.query_id) * 10000 // COUNT(*) AS BIGINT)
            AS recall_bp,
        COUNT(a.query_id) * 10 >= COUNT(*) * 8 AS recall_ok
    FROM exact x LEFT JOIN ann a
        ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id"""


def _emb_ivf_recall_oracle() -> str:
    """Recall@1 of IVF (nlist=16, nprobe=4, seed=42) vs the exact
    top-1 over the planted-duplicate corpus: retrains the identical
    fixed-seed k-means on the identically-constructed augmented
    sample and replays assignment/probing in SQL."""
    import duckdb
    import numpy as np

    from cubes_spark.llm.similarity import train_spherical_kmeans

    path = f"{_oracle_sf_dir()}/embeddings.parquet"
    sample = duckdb.sql(f"""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM read_parquet('{path}')
        ),
        aug AS (
            SELECT vec_id, v FROM base
            UNION ALL
            SELECT vec_id + 10000000, list_prepend(v[1] + 0.2, v[2:])
            FROM base WHERE vec_id % 10 = 0
        )
        SELECT v FROM aug ORDER BY vec_id LIMIT 4096""").fetchall()
    X = np.array([r[0] for r in sample], dtype=np.float64)
    cent = train_spherical_kmeans(X, 16, 42)
    values = ",\n            ".join(
        f"({i + 1}, {_sql_dvec(row)})" for i, row in enumerate(cent)
    )
    return f"""
    WITH {_AUG_CORPUS_SQL},
    cent(cluster, cv) AS (VALUES
            {values}),
    sims AS (
        SELECT aug.vec_id, aug.v, c.cluster,
            list_dot_product(aug.v, c.cv) AS sim
        FROM aug CROSS JOIN cent c
    ),
    cranked AS (
        SELECT vec_id, v, cluster,
            row_number() OVER (PARTITION BY vec_id
                               ORDER BY sim DESC, cluster) AS crank
        FROM sims
    ),
    assigned AS (
        SELECT vec_id AS neighbor_id, cluster
        FROM cranked WHERE crank = 1
    ),
    probed AS (
        SELECT vec_id AS query_id, cluster
        FROM cranked WHERE crank <= 4 AND vec_id >= 10000000
    ),
    cos AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            list_dot_product(q.v, c.v)
            / (sqrt(list_dot_product(q.v, q.v))
             * sqrt(list_dot_product(c.v, c.v))) AS cosine
        FROM aug q JOIN aug c ON q.vec_id <> c.vec_id
        WHERE q.vec_id >= 10000000
    ),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id)
                    AS rank
            FROM cos
        ) WHERE rank = 1
    ),
    ivf AS (
        SELECT query_id, neighbor_id FROM (
            SELECT p.query_id, a.neighbor_id,
                row_number() OVER (PARTITION BY p.query_id
                                   ORDER BY k.cosine DESC,
                                            a.neighbor_id) AS rank
            FROM probed p
            JOIN assigned a USING (cluster)
            JOIN cos k ON k.query_id = p.query_id
                      AND k.neighbor_id = a.neighbor_id
            WHERE p.query_id <> a.neighbor_id
        ) WHERE rank = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(COUNT(a.query_id) AS BIGINT) AS n_hit,
        CAST(COUNT(a.query_id) * 10000 // COUNT(*) AS BIGINT)
            AS recall_bp,
        COUNT(a.query_id) * 10 >= COUNT(*) * 8 AS recall_ok
    FROM exact x LEFT JOIN ivf a
        ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id"""


def _emb_neardup_recall_oracle() -> str:
    """Replicates embedding_near_duplicates(threshold=0.9,
    method='lsh', num_planes=8, num_tables=4, seed=42) candidate
    generation + exact verify over the planted-duplicate corpus, and
    the exact all-pairs set, then the recall/precision counts the
    Spark entry emits."""
    return f"""
    WITH {_AUG_CORPUS_SQL},
    {_aug_bucketed_sql(4, 8)},
    cos AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) AS cosine
        FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    ),
    exact AS (SELECT id_a, id_b FROM cos WHERE cosine >= 0.9),
    cand AS (
        SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
        FROM bucketed l
        JOIN bucketed r
          ON l.tbl = r.tbl AND l.bucket = r.bucket
         AND l.vec_id < r.vec_id
    ),
    lsh AS (
        SELECT c.id_a, c.id_b
        FROM cand c JOIN cos k ON k.id_a = c.id_a AND k.id_b = c.id_b
        WHERE k.cosine >= 0.9
    ),
    marked AS (
        SELECT x.id_a, l.id_a AS hit
        FROM exact x LEFT JOIN lsh l
            ON x.id_a = l.id_a AND x.id_b = l.id_b
    )
    SELECT CAST((SELECT COUNT(*) FROM marked) AS BIGINT) AS n_exact,
        CAST((SELECT COUNT(*) FROM lsh) AS BIGINT) AS n_lsh,
        CAST((SELECT COUNT(hit) FROM marked) AS BIGINT) AS n_hit,
        CAST((SELECT COUNT(hit) FROM marked) * 10000
             // (SELECT COUNT(*) FROM marked) AS BIGINT) AS recall_bp,
        (SELECT COUNT(hit) FROM marked) = (SELECT COUNT(*) FROM lsh)
            AS precision_ok,
        (SELECT COUNT(hit) FROM marked) * 10
            >= (SELECT COUNT(*) FROM marked) * 8 AS recall_ok"""
