"""Distributed exact-arithmetic statistics operators.

Classical two-sample / association / robust statistics re-expressed
so that every emitted number is an INTEGER a SQL oracle replays
bit-for-bit: comparisons happen on cross-multiplied integer
numerators (never an early float division), irrational outputs are
avoided (rho² instead of rho, D·n₁·n₂ instead of D), and the single
division that produces a report unit (ppm) is a truncating integer
div both engines share.

The reference (DataBrewery/cubes) has no statistics layer at all —
its aggregate vocabulary stops at sum/avg/stddev
(/root/reference/cubes/query/browser.py, aggregate functions table);
these operators extend the same browser/oracle discipline to the
tests an analytics user actually runs on 100 TB of fact data.

Scale notes per operator are in each docstring; the common theme is
that NOTHING here sorts globally: cumulative distributions come from
the two-phase value-bucketed prefix sum (`_cum_value_histogram`),
ranks from windows PARTITIONED BY THE GROUP, and everything else is
algebraic moment sketches (map-side combinable single aggregations).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ks_two_sample",
    "emd_two_sample",
    "spearman_rho",
    "chi_square_independence",
    "rolling_median",
    "winsorized_stats",
    "interarrival_stats",
    "group_mode",
    "max_drawdown",
    "kaplan_meier",
    "mann_whitney_u",
    "cohen_kappa",
    "classifier_eval",
    "runs_test",
    "chi_square_gof_uniform",
    "logrank_test",
    "theil_sen_slope",
    "cuped_adjusted_diff",
    "mann_kendall",
    "one_way_anova",
    "brown_forsythe",
    "kruskal_wallis",
    "shannon_entropy",
    "ratio_delta_ci",
    "poisson_bootstrap_mean",
    "binary_segmentation",
    "welch_t2",
    "hill_tail_index",
]

_DEC = "decimal(38,0)"


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


def _null_safe_join(left: DataFrame, right: DataFrame,
                    cols: Sequence[str],
                    broadcast_right: bool = False) -> DataFrame:
    """Inner equi-join that MATCHES NULL keys.  groupBy keeps a NULL
    group, but a plain ``join(..., cols)`` drops it (NULL never
    equals NULL), silently losing the group vs SQL GROUP BY
    semantics — so every attach-back join on group keys goes through
    eqNullSafe here.  Still a hash-partitionable equi-join (Spark
    plans ``<=>`` keys exactly like ``=`` keys), so nothing changes
    at scale.
    """
    renamed = right
    for c in cols:
        renamed = renamed.withColumnRenamed(c, "__nsj_" + c)
    if broadcast_right:
        renamed = F.broadcast(renamed)
    cond = None
    for c in cols:
        e = left[c].eqNullSafe(renamed["__nsj_" + c])
        cond = e if cond is None else (cond & e)
    return left.join(renamed, cond).drop(
        *["__nsj_" + c for c in cols])


def _two_sample_cum(df: DataFrame, group_col: str, value_col: str,
                    group_a: str, group_b: str, num_buckets: int):
    """Shared distributed machinery for two-sample EDF statistics
    (KS, EMD): per distinct value v in cents, exact cumulative counts
    ``__cuma__/__cumb__`` of each sample plus, for EMD, the gap to
    the next distinct value ``__dv__`` (0 on the global maximum).

    Two-phase value-bucketed prefix sum — deterministic buckets from
    the value range, ONE bounded driver collect of per-bucket totals
    (which also yields each bucket's min value, so the cross-bucket
    successor needed by ``__dv__`` is a broadcast lookup, not a
    global window), bucket-local windows for both the running sums
    and the intra-bucket ``lead``.  Returns ``(cum_df, na, nb)`` or
    ``(None, 0, 0)`` when either sample is empty.
    """
    from pyspark.sql.window import Window as W

    tagged = (df.filter(F.col(group_col).isin([group_a, group_b]))
              .select(_cents(value_col).alias("__v__"),
                      (F.col(group_col) == group_a).alias("__a__")))
    hist = (tagged.groupBy("__v__")
            .agg(F.sum(F.col("__a__").cast("long")).alias("__ca__"),
                 F.sum((~F.col("__a__")).cast("long")).alias("__cb__")))
    bounds = hist.agg(F.min("__v__").alias("lo"),
                      F.max("__v__").alias("hi"),
                      F.sum("__ca__").alias("na"),
                      F.sum("__cb__").alias("nb")).first()
    if bounds["lo"] is None or not bounds["na"] or not bounds["nb"]:
        return None, 0, 0
    lo, hi = bounds["lo"], bounds["hi"]
    na, nb = int(bounds["na"]), int(bounds["nb"])
    width = max(1, -(-(hi - lo + 1) // num_buckets))
    hist = hist.withColumn(
        "__pid__",
        F.floor((F.col("__v__") - F.lit(lo)) / F.lit(width)).cast("int"))
    totals = (hist.groupBy("__pid__")
              .agg(F.sum("__ca__").alias("ta"),
                   F.sum("__cb__").alias("tb"),
                   F.min("__v__").alias("mn")).collect())
    ordered = sorted(totals, key=lambda r: r["__pid__"])
    offsets, acc_a, acc_b = [], 0, 0
    for i, row in enumerate(ordered):
        nxt = ordered[i + 1]["mn"] if i + 1 < len(ordered) else None
        offsets.append((row["__pid__"], acc_a, acc_b, nxt))
        acc_a += row["ta"] or 0
        acc_b += row["tb"] or 0
    spark = df.sparkSession
    off = F.broadcast(spark.createDataFrame(
        offsets,
        "__pid__ int, __offa__ long, __offb__ long, __nextmn__ long"))
    local = (W.partitionBy("__pid__").orderBy("__v__")
             .rowsBetween(W.unboundedPreceding, 0))
    w_lead = W.partitionBy("__pid__").orderBy("__v__")
    cum = (hist.join(off, "__pid__")
           .withColumn("__cuma__", F.col("__offa__")
                       + F.sum("__ca__").over(local))
           .withColumn("__cumb__", F.col("__offb__")
                       + F.sum("__cb__").over(local))
           .withColumn("__dv__", F.coalesce(
               F.lead("__v__").over(w_lead), F.col("__nextmn__"),
               F.col("__v__")) - F.col("__v__")))
    return cum, na, nb


def ks_two_sample(df: DataFrame, group_col: str, value_col: str,
                  group_a: str, group_b: str,
                  num_buckets: int = 256) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance, integer-exact.

    D = max_v |F_a(v) − F_b(v)| has the exact rational form
    ``max_v |ca(v)·nb − cb(v)·na| / (na·nb)`` where ``ca(v)`` is the
    cumulative count of sample A at value v — so the maximisation
    runs entirely on integers and only the final report unit is a
    truncating div: ``d_ppm = 10^6·max|..| div (na·nb)``.  Also
    emits the (smallest) value in cents where the supremum is
    attained.

    Scale shape: one groupBy to the |distinct values| grain with
    per-sample counts, then the two-phase value-bucketed prefix sum
    (deterministic buckets, bounded driver collect of one row per
    bucket, bucket-local windows) — the same pattern as
    ``_cum_value_histogram``; no global sort, no one-partition
    window, regardless of sample size.
    """
    cum, na, nb = _two_sample_cum(df, group_col, value_col,
                                  group_a, group_b, num_buckets)
    if cum is None:
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "n_a long, n_b long, d_ppm long, at_value_cents long")
    gap = F.abs(F.col("__cuma__").cast(_DEC) * F.lit(nb)
                - F.col("__cumb__").cast(_DEC) * F.lit(na))
    best = (cum.select(F.struct(gap.alias("g"),
                                (-F.col("__v__")).alias("nv"))
                       .alias("__s__"))
            .agg(F.max("__s__").alias("m")))
    return best.select(
        F.lit(na).alias("n_a"), F.lit(nb).alias("n_b"),
        F.expr(f"CAST((CAST(1000000 AS {_DEC}) * m.g)"
               f" div (CAST({na} AS {_DEC}) * {nb}) AS BIGINT)")
        .alias("d_ppm"),
        (-F.col("m.nv")).cast("long").alias("at_value_cents"))


def emd_two_sample(df: DataFrame, group_col: str, value_col: str,
                   group_a: str, group_b: str,
                   num_buckets: int = 256) -> DataFrame:
    """Two-sample earth-mover's (Wasserstein-1) distance,
    integer-exact: W₁ = ∫|F_a − F_b| dv is a finite sum over the
    distinct sample values,

        W₁·na·nb = Σ_v |cuma(v)·nb − cumb(v)·na| · Δv

    where Δv is the gap in cents to the NEXT distinct value — every
    term an integer, so the sum is exact and the single report
    division ``emd_millicents = (1000·Σ) div (na·nb)`` truncates
    identically in both engines.

    Unlike KS (supremum — scale-free), EMD weights HOW FAR mass must
    move, the distribution-shift magnitude in value units.

    Scale shape: the same two-phase bucketed prefix sum as KS; the
    cross-bucket successor that Δv needs comes from the per-bucket
    min collected in the SAME bounded driver pass (broadcast lookup),
    so there is still no global window.
    """
    cum, na, nb = _two_sample_cum(df, group_col, value_col,
                                  group_a, group_b, num_buckets)
    if cum is None:
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "n_a long, n_b long, emd_millicents long")
    gap = F.abs(F.col("__cuma__").cast(_DEC) * F.lit(nb)
                - F.col("__cumb__").cast(_DEC) * F.lit(na))
    tot = cum.agg(F.sum(gap * F.col("__dv__").cast(_DEC))
                  .alias("__t__"))
    return tot.select(
        F.lit(na).alias("n_a"), F.lit(nb).alias("n_b"),
        F.expr(f"CAST((CAST(1000 AS {_DEC}) * __t__)"
               f" div (CAST({na} AS {_DEC}) * {nb}) AS BIGINT)")
        .alias("emd_millicents"))


def _grouped_rank_frame(df: DataFrame, gcols: Sequence[str],
                        value_col: str, out_col: str,
                        num_buckets: int = 256) -> DataFrame:
    """Per (group, distinct value): the DOUBLED CENTERED average rank
    ``rc = 2·cum(v) − ties(v) − n`` (cum = #(x ≤ v) within the
    group), computed WITHOUT per-group sort windows: the two-phase
    value-bucketed prefix sum runs per (group, bucket), so a table
    with 3 huge groups still ranks with full cluster parallelism —
    the grouped sibling of ``_cum_value_histogram``.  The driver
    collect is |groups|·|buckets| rows (bounded); join the result
    back on (group, value) to attach ranks to fact rows.
    """
    from pyspark.sql.window import Window as W

    gl = list(gcols)
    # NOT persisted (r14 opt round, measured): the histogram feeds
    # three separate jobs, but caching it cost MORE than the
    # recompute — the InMemoryRelation build + the lost whole-stage
    # pipeline beat two cheap scan+groupBy replays (spearman
    # 3.7 → 4.0 s WITH persist; same shape for winsorize/kruskal/
    # gini/abc).  Revisit only if the fact scan itself becomes the
    # dominant cost.
    hist = (df.groupBy(*[F.col(c) for c in gl],
                       F.col(value_col).alias("__v__"))
            .agg(F.count(F.lit(1)).alias("__cnt__")))
    bounds = (hist.groupBy(*gl)
              .agg(F.min("__v__").alias("__lo__"),
                   F.max("__v__").alias("__hi__"),
                   F.sum("__cnt__").alias("__n__")))
    hist = _null_safe_join(hist, bounds, gl, broadcast_right=True)
    width = F.greatest(
        F.lit(1),
        -((-(F.col("__hi__") - F.col("__lo__") + 1))
          .cast("long") / F.lit(num_buckets)).cast("long"))
    hist = hist.withColumn(
        "__pid__", F.floor((F.col("__v__") - F.col("__lo__"))
                           / width).cast("int"))
    totals = (hist.groupBy(*gl, F.col("__pid__"))
              .agg(F.sum("__cnt__").alias("__tot__")).collect())
    offsets, acc = [], {}
    for row in sorted(totals,
                      key=lambda r: (tuple(str(r[c]) for c in gl),
                                     r["__pid__"])):
        key = tuple(row[c] for c in gl)
        offsets.append(tuple(row[c] for c in gl)
                       + (row["__pid__"], acc.get(key, 0)))
        acc[key] = acc.get(key, 0) + (row["__tot__"] or 0)
    spark = df.sparkSession
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)
    schema = StructType(
        list(df.select(*gl).schema.fields)
        + [StructField("__pid__", IntegerType()),
           StructField("__poff__", LongType())])
    off = F.broadcast(spark.createDataFrame(offsets, schema))
    local = (W.partitionBy(*gl, "__pid__").orderBy("__v__")
             .rowsBetween(W.unboundedPreceding, 0))
    return (_null_safe_join(hist, off, gl + ["__pid__"],
                            broadcast_right=True)
            .withColumn("__cum__", F.col("__poff__")
                        + F.sum("__cnt__").over(local))
            .select(*gl, F.col("__v__"),
                    F.col("__n__").cast("long").alias("__n__"),
                    F.col("__cnt__"), F.col("__cum__"),
                    (2 * F.col("__cum__") - F.col("__cnt__")
                     - F.col("__n__")).alias(out_col)))


def spearman_rho(df: DataFrame, group_cols: Sequence[str],
                 x_col: str, y_col: str) -> DataFrame:
    """Per-group Spearman rank correlation as a SIGNED rho² in ppm,
    tie-corrected (Pearson on average ranks), integer-exact.

    Average ranks with ties are half-integers, so DOUBLED CENTERED
    ranks ``rc = 2·cum(v) − ties(v) − n`` (= 2·avg_rank − (n+1)) are
    integers that sum to EXACTLY zero per group — Pearson on them
    collapses to

        rho = Σ(rcx·rcy) / sqrt(Σrcx² · Σrcy²)

    whose sqrt is irrational, so the emitted statistic is the exact
    rational ``signed_rho2_ppm = sign(num) · ((10^6·|num|) div dx ·
    |num|) div dy`` with num = Σ(rcx·rcy), dx = Σrcx², dy = Σrcy²
    (monotone in |rho|, sign preserved; |rho|=1 ⇒ ±10^6; the staged
    division keeps every intermediate ≤ 10^6·|num| — exact through
    ~10^10 rows per group in decimal(38,0); error vs the real
    rho² < 2 ppm, and the SQL oracle replays the same staging).

    Scale shape: ranks come from the GROUP-PARTITIONED bucketed
    prefix sum (``_grouped_rank_frame``) joined back on (group,
    value) — never a per-group sort window.  Measured sf0.1→sf1:
    3.8×/decade vs the window variant's 6.8×; the deeper point is
    that the window variant sorts EACH GROUP IN ONE TASK (3 tasks
    for 3-group lineitem — impossible at 10^10 rows/group), while
    this shape shuffles on (group, value) with full parallelism.
    Then ONE map-side-combinable moment aggregation.
    """
    gcols = list(group_cols)
    base = df.select(*[F.col(c) for c in gcols],
                     _cents(x_col).alias("__x__"),
                     _cents(y_col).alias("__y__"))
    xr = _grouped_rank_frame(base, gcols, "__x__", "__rcx__")
    yr = _grouped_rank_frame(base, gcols, "__y__", "__rcy__")
    ranked = _null_safe_join(
        _null_safe_join(base,
                        xr.select(*gcols,
                                  F.col("__v__").alias("__x__"),
                                  F.col("__rcx__")),
                        gcols + ["__x__"]),
        yr.select(*gcols,
                  F.col("__v__").alias("__y__"),
                  F.col("__rcy__")),
        gcols + ["__y__"])
    rx = F.col("__rcx__").cast(_DEC)
    ry = F.col("__rcy__").cast(_DEC)
    m = ranked.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(rx * ry).alias("__num__"),
        F.sum(rx * rx).alias("__dx__"),
        F.sum(ry * ry).alias("__dy__"))
    withd = m.filter((F.col("__dx__") > 0) & (F.col("__dy__") > 0))
    return withd.select(
        *gcols,
        F.col("n_rows"),
        (F.when(F.col("__num__") < 0, -1).otherwise(1)
         * F.expr(f"CAST(((CAST(1000000 AS {_DEC}) * abs(__num__))"
                  f" div __dx__ * abs(__num__)) div __dy__"
                  f" AS BIGINT)"))
        .cast("long").alias("signed_rho2_ppm"))


def chi_square_independence(df: DataFrame, row_col: str,
                            col_col: str) -> DataFrame:
    """Chi-square contingency table, integer-exact per cell.

    With observed O, margins R and C and total N, the cell term
    (O − E)²/E = (O·N − R·C)² / (R·C·N); the emitted per-cell
    contribution is ``10^6·(O·N − R·C)² div (R·C·N)`` — i.e. the
    statistic is DEFINED as the sum of per-cell truncated-ppm terms,
    which both engines compute identically (each term differs from
    the real one by < 1 ppm).  The full grid — including structural
    zeros, which still contribute R·C/N — is generated by crossing
    the two margin tables, never by scanning the facts twice.

    Scale shape: one groupBy to the |rows|×|cols| grain, two margin
    aggregations off THAT grain (not the facts), broadcast joins
    back; everything algebraic.
    """
    obs = (df.groupBy(F.col(row_col).alias("__r__"),
                      F.col(col_col).alias("__c__"))
           .agg(F.count(F.lit(1)).alias("__o__")))
    rmar = obs.groupBy("__r__").agg(F.sum("__o__").alias("__rm__"))
    cmar = obs.groupBy("__c__").agg(F.sum("__o__").alias("__cm__"))
    total = obs.agg(F.sum("__o__").alias("__n__"))
    grid = (rmar.crossJoin(F.broadcast(cmar))
            .crossJoin(F.broadcast(total))
            .join(obs, ["__r__", "__c__"], "left")
            .fillna({"__o__": 0}))
    o = F.col("__o__").cast(_DEC)
    rm = F.col("__rm__").cast(_DEC)
    cm = F.col("__cm__").cast(_DEC)
    n = F.col("__n__").cast(_DEC)
    dev = o * n - rm * cm
    grid = (grid.withColumn("__rm_d__", rm).withColumn("__cm_d__", cm)
            .withColumn("__n_d__", n).withColumn("__dev__", dev))
    return grid.select(
        F.col("__r__").alias(row_col),
        F.col("__c__").alias(col_col),
        F.col("__o__").cast("long").alias("observed"),
        F.expr("CAST((__rm_d__ * __cm_d__ * 1000000) div __n_d__"
               " AS BIGINT)").alias("expected_ppm"),
        F.expr("CAST((__dev__ * __dev__ * 1000000)"
               " div (__rm_d__ * __cm_d__ * __n_d__) AS BIGINT)")
        .alias("contrib_ppm"))


def rolling_median(df: DataFrame, key_col: str, ts_col: str,
                   value_col: str, window_rows: int = 7,
                   order_cols: Optional[Sequence[str]] = None
                   ) -> DataFrame:
    """Exact rolling median (lower order statistic) over the last
    ``window_rows`` rows per key, deterministic order.

    Spark has no exact percentile window, but a ROWS frame of bounded
    width makes the sorted frame itself cheap: ``collect_list`` over
    the frame, ``sort_array``, element ``ceil(n/2)`` (the lower
    median for even n — replayable as ``list_sort(list(v) OVER w)
    [ceil(n/2)]`` in the oracle).  Frame memory is O(window_rows) per
    row — bounded by construction, never by data volume.

    Scale shape: one window partitioned by the key; the frame is
    rows-bounded so state never grows with history length.
    """
    from pyspark.sql.window import Window as W

    order = [F.col(c) for c in (order_cols or [ts_col])]
    w = (W.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-(window_rows - 1), 0))
    frame = F.sort_array(F.collect_list(_cents(value_col)).over(w))
    return df.select(
        F.col(key_col),
        F.col(ts_col),
        _cents(value_col).alias("value_cents"),
        F.element_at(frame, F.ceil(F.size(frame) / 2).cast("int"))
        .alias("rolling_median_cents"))


def winsorized_stats(df: DataFrame, group_cols: Sequence[str],
                     value_col: str, lo_ppm: int = 50000,
                     hi_ppm: int = 950000) -> DataFrame:
    """Per-group winsorized sum: values are clamped at the exact
    percentile_disc order statistics for ``lo_ppm``/``hi_ppm``
    (rank = the smallest r with r·10^6 ≥ p_ppm·n, i.e. ``ceil(p·n)``
    = ``(p_ppm·n + 10^6 − 1) div 10^6`` — the add-before-divide ceil,
    since both Spark ``div`` and SQL ``//`` truncate toward zero and
    the negate trick would floor) and re-summed in cents.

    Robust-mean reporting without the outlier sensitivity of the raw
    sum and without discarding rows (contrast trimming) — Tukey 1962.

    Scale shape: boundaries come from the GROUP-PARTITIONED bucketed
    prefix sum (``_grouped_rank_frame`` — the value-grain cumulative
    counts give ``min v with cum ≥ rank`` in one conditional
    aggregate), never a per-group sort window, so a few huge groups
    still rank with full parallelism; one broadcast-friendly rejoin
    clamps and re-sums.
    """
    gcols = list(group_cols)
    base = df.select(*[F.col(c) for c in gcols],
                     _cents(value_col).alias("__v__"))
    frame = _grouped_rank_frame(base, gcols, "__v__", "__rc__")
    lo_rank = F.expr(f"(CAST({lo_ppm} AS {_DEC}) * __n__ + 999999)"
                     f" div 1000000")
    hi_rank = F.expr(f"(CAST({hi_ppm} AS {_DEC}) * __n__ + 999999)"
                     f" div 1000000")
    q = frame.groupBy(*gcols).agg(
        F.max("__n__").cast("long").alias("n_rows"),
        F.min(F.when(F.col("__cum__") >= lo_rank, F.col("__v__")))
        .alias("lo_cents"),
        F.min(F.when(F.col("__cum__") >= hi_rank, F.col("__v__")))
        .alias("hi_cents"))
    joined = _null_safe_join(base, q, gcols)
    clamped = F.greatest(F.least(F.col("__v__"), F.col("hi_cents")),
                         F.col("lo_cents"))
    return (joined.groupBy(*gcols)
            .agg(F.max("n_rows").alias("n_rows"),
                 F.max("lo_cents").alias("lo_cents"),
                 F.max("hi_cents").alias("hi_cents"),
                 F.sum(clamped).cast("long")
                 .alias("winsorized_sum_cents"),
                 F.sum((F.col("__v__") < F.col("lo_cents"))
                       .cast("long")).cast("long").alias("n_clamped_lo"),
                 F.sum((F.col("__v__") > F.col("hi_cents"))
                       .cast("long")).cast("long")
                 .alias("n_clamped_hi")))


def interarrival_stats(df: DataFrame, key_col: str, ts_col: str,
                       tiebreak_col: Optional[str] = None) -> DataFrame:
    """Per-key inter-arrival gap statistics in exact microseconds:
    gaps from ``lag`` under a deterministic (ts[, tiebreak]) order,
    min/max/sum plus the mean as a truncating integer div — keys with
    fewer than two events are dropped.

    Scale shape: one window partitioned by the key, one algebraic
    aggregation; no global sort.
    """
    from pyspark.sql.window import Window as W

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else [])
    w = W.partitionBy(key_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    gaps = (df.select(F.col(key_col), gap.alias("__gap__"))
            .filter(F.col("__gap__").isNotNull()))
    return (gaps.groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"),
                 F.min("__gap__").alias("min_gap_us"),
                 F.max("__gap__").alias("max_gap_us"),
                 F.expr("CAST(sum(__gap__) div count(*) AS BIGINT)")
                 .alias("avg_gap_us")))


def group_mode(df: DataFrame, group_cols: Sequence[str],
               value_col: str) -> DataFrame:
    """Per-group exact mode with a deterministic tiebreak (highest
    count, then SMALLEST value): count to the (group, value) grain,
    then one ``min(struct(-count, value))`` — two map-side-combinable
    aggregations, no window, no sort.
    """
    gcols = list(group_cols)
    counted = (df.filter(F.col(value_col).isNotNull())
               .groupBy(*[F.col(c) for c in gcols],
                        F.col(value_col).alias("__val__"))
               .agg(F.count(F.lit(1)).alias("__cnt__")))
    pick = F.min(F.struct((-F.col("__cnt__")).alias("nc"),
                          F.col("__val__").alias("v"))).alias("__p__")
    return (counted.groupBy(*gcols).agg(pick)
            .select(*gcols,
                    F.col("__p__.v").alias("mode_value"),
                    (-F.col("__p__.nc")).cast("long")
                    .alias("mode_count")))


def max_drawdown(df: DataFrame, key_col: str, ts_col: str,
                 value_col: str,
                 tiebreak_col: Optional[str] = None) -> DataFrame:
    """Per-key maximum drawdown of the running value sum, exact
    cents: with C_i the prefix sum under deterministic (ts[,
    tiebreak]) order and P_i = max_{j<=i} C_j its running peak, the
    drawdown at i is P_i − C_i and the answer is its maximum — two
    stacked windows over ONE per-key sort (the running-extremum
    prefix trick of ``clamped_running_sum``), then one algebraic
    aggregate.  Emits the peak and trough prefix sums of the worst
    drawdown (earliest = largest trough on ties via min(struct)).
    """
    from pyspark.sql.window import Window as W

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else [])
    w = (W.partitionBy(key_col).orderBy(*order)
         .rowsBetween(W.unboundedPreceding, 0))
    base = (df.withColumn("__c__", F.sum(_cents(value_col)).over(w))
            .withColumn("__p__", F.max("__c__").over(w)))
    dd = F.col("__p__") - F.col("__c__")
    pick = F.min(F.struct((-dd).alias("ndd"),
                          F.col("__c__").alias("trough"),
                          F.col("__p__").alias("peak"))).alias("__b__")
    return (base.groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.max("__c__").cast("long").alias("max_cum_cents"),
                 pick)
            .select(key_col, "n_rows", "max_cum_cents",
                    (-F.col("__b__.ndd")).cast("long")
                    .alias("max_drawdown_cents"),
                    F.col("__b__.peak").cast("long")
                    .alias("peak_cents"),
                    F.col("__b__.trough").cast("long")
                    .alias("trough_cents")))


def kaplan_meier(df: DataFrame, duration_col: str,
                 event_col: str) -> DataFrame:
    """Kaplan–Meier survival curve (Kaplan & Meier 1958),
    integer-exact: per distinct duration t, deaths d_t, censored
    c_t, at-risk n_t = N − Σ_{s<t}(d_s + c_s), and the product-limit
    estimate DEFINED by the truncated-integer recurrence

        S ← (S · (n_t − d_t)) div n_t        (S₀ = 10^6)

    applied at death times in ascending order — each step differs
    from the real product by < 1 ppm and a SQL oracle replays the
    recurrence exactly with a recursive CTE.  The fold runs as one
    SQL ``aggregate`` lambda so the division is the true integer
    ``div`` (a long/long ``/`` detours through doubles and loses
    exactness above 2^53).

    Scale shape: the facts collapse to the DURATION grain in one
    map-side-combinable groupBy; the at-risk prefix sum and the fold
    run on that bounded grain (a 30-day study has ≤ 31 rows
    regardless of cohort size — the single-partition window IS the
    curve, not the data).  Emits one row per distinct duration:
    ``(t, n_at_risk, n_deaths, n_censored, survival_ppm)``.
    """
    from pyspark.sql.window import Window as W

    per_t = (df.filter(F.col(duration_col).isNotNull())
             .groupBy(F.col(duration_col).cast("long").alias("t"))
             .agg(F.sum(F.col(event_col).cast("long")).alias("d"),
                  F.sum(1 - F.col(event_col).cast("long"))
                  .alias("c")))
    w_prev = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    tot = per_t.agg((F.sum("d") + F.sum("c")).alias("__N__"))
    staged = (per_t.crossJoin(F.broadcast(tot))
              .withColumn("n", F.col("__N__") - F.coalesce(
                  F.sum(F.col("d") + F.col("c")).over(w_prev),
                  F.lit(0))))
    collected = staged.agg(F.sort_array(F.collect_list(F.struct(
        F.col("t"), F.col("n"), F.col("d"), F.col("c"))))
        .alias("__arr__"))
    curve = collected.select(F.explode(F.expr("""
        aggregate(
            __arr__,
            named_struct(
                's', CAST(1000000 AS BIGINT),
                'out', CAST(array() AS
                    array<struct<t:bigint,n:bigint,d:bigint,
                                 c:bigint,s:bigint>>)),
            (acc, x) -> named_struct(
                's', CAST(CASE WHEN x.d > 0
                          THEN (acc.s * (x.n - x.d)) div x.n
                          ELSE acc.s END AS BIGINT),
                'out', array_append(acc.out, named_struct(
                    't', x.t, 'n', x.n, 'd', x.d, 'c', x.c,
                    's', CAST(CASE WHEN x.d > 0
                              THEN (acc.s * (x.n - x.d)) div x.n
                              ELSE acc.s END AS BIGINT)))),
            acc -> acc.out)
    """)).alias("r"))
    return curve.select(
        F.col("r.t").alias("t"),
        F.col("r.n").alias("n_at_risk"),
        F.col("r.d").alias("n_deaths"),
        F.col("r.c").alias("n_censored"),
        F.col("r.s").alias("survival_ppm"))


def mann_whitney_u(df: DataFrame, group_col: str, value_col: str,
                   group_a: str, group_b: str,
                   num_buckets: int = 256) -> DataFrame:
    """Mann–Whitney U / AUC, integer-exact with ties: using DOUBLED
    average ranks over the pooled sample (2·avg_rank(v) =
    2·#below(v) + ties(v) + 1 — pure counts from the same bucketed
    cumulative frame as KS/EMD), the doubled rank sum of sample A is

        2·R₁ = Σ_v ca(v) · (2·(cuma+cumb) − (ca+cb) + 1)

    and ``u_doubled = 2·R₁ − na·(na+1)`` (= 2·U₁), from which the
    probability-of-superiority ``auc_ppm = (10^6·u_doubled) div
    (2·na·nb)`` — the tie-averaged P(A > B) both engines truncate
    identically.  AUC 500000 ⇒ stochastically equal samples.

    Scale shape: identical to ``ks_two_sample`` — one value-grain
    groupBy, the two-phase prefix sum, one algebraic aggregate; the
    pooled ranking never materializes per-row ranks at all.
    """
    cum, na, nb = _two_sample_cum(df, group_col, value_col,
                                  group_a, group_b, num_buckets)
    if cum is None:
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "n_a long, n_b long, u_doubled long, auc_ppm long")
    two_r1 = F.sum(
        F.col("__ca__").cast(_DEC)
        * (2 * (F.col("__cuma__") + F.col("__cumb__")).cast(_DEC)
           - (F.col("__ca__") + F.col("__cb__")).cast(_DEC) + 1))
    tot = cum.agg(two_r1.alias("__r1x2__"))
    # na*(na+1) computed driver-side: a long*long column product
    # would overflow at ~3e9 rows per sample
    u2 = F.col("__r1x2__") - F.lit(str(na * (na + 1))).cast(_DEC)
    return (tot.withColumn("__u2__", u2)
            .select(F.lit(na).alias("n_a"), F.lit(nb).alias("n_b"),
                    F.col("__u2__").cast("long").alias("u_doubled"),
                    F.expr(f"CAST((CAST(1000000 AS {_DEC}) * __u2__)"
                           f" div (CAST(2 AS {_DEC}) * {na} * {nb})"
                           f" AS BIGINT)").alias("auc_ppm")))


def cohen_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa inter-rater agreement, integer-exact: with
    agreement count A, per-label margins R_l/C_l and total N,

        kappa = (A·N − Σ_l R_l·C_l) / (N² − Σ_l R_l·C_l)

    an exact integer ratio emitted as ``kappa_ppm = sign ·
    (10^6·|num|) div den`` (den = 0 — chance agreement 1 — yields an
    empty result rather than a division error).

    Scale shape: one groupBy to the |labels|² pair grain; margins
    and the product sum live on the LABEL grain; everything
    algebraic, broadcast-sized.
    """
    pairs = (df.filter(F.col(col_a).isNotNull()
                       & F.col(col_b).isNotNull())
             .groupBy(F.col(col_a).alias("__a__"),
                      F.col(col_b).alias("__b__"))
             .agg(F.count(F.lit(1)).alias("__n__")))
    amar = pairs.groupBy(F.col("__a__").alias("__l__")).agg(
        F.sum("__n__").alias("__ra__"))
    bmar = pairs.groupBy(F.col("__b__").alias("__l__")).agg(
        F.sum("__n__").alias("__cb__"))
    prod = (amar.join(bmar, "__l__")
            .agg(F.sum(F.col("__ra__").cast(_DEC)
                       * F.col("__cb__").cast(_DEC)).alias("__pe__")))
    tot = pairs.agg(
        F.sum("__n__").alias("__N__"),
        F.sum(F.when(F.col("__a__") == F.col("__b__"),
                     F.col("__n__")).otherwise(0)).alias("__A__"))
    j = (tot.crossJoin(prod)
         .withColumn("__num__",
                     F.col("__A__").cast(_DEC) * F.col("__N__")
                     - F.coalesce(F.col("__pe__"), F.lit(0).cast(_DEC)))
         .withColumn("__den__",
                     F.col("__N__").cast(_DEC) * F.col("__N__")
                     - F.coalesce(F.col("__pe__"),
                                  F.lit(0).cast(_DEC)))
         .filter(F.col("__den__") > 0))
    return j.select(
        F.col("__N__").cast("long").alias("n"),
        F.col("__A__").cast("long").alias("n_agree"),
        (F.when(F.col("__num__") < 0, -1).otherwise(1)
         * F.expr(f"CAST((CAST(1000000 AS {_DEC}) * abs(__num__))"
                  f" div __den__ AS BIGINT)"))
        .cast("long").alias("kappa_ppm"))


def classifier_eval(df: DataFrame, truth_col: str,
                    pred_col: str) -> DataFrame:
    """Per-class precision / recall / F1 in exact ppm: tp, support
    and predicted counts are plain aggregates on the (truth, pred)
    pair grain; every metric is a single truncating div of integers
    (F1 = 2·tp/(support + predicted) — no harmonic-mean floats).
    Classes missing on one side (never predicted / never true) still
    appear with zero metrics — the full outer label set.

    Scale shape: one groupBy to the label-pair grain (bounded by
    |classes|²), label-grain joins after; nothing row-scale survives
    the first aggregation.
    """
    pairs = (df.filter(F.col(truth_col).isNotNull()
                       & F.col(pred_col).isNotNull())
             .groupBy(F.col(truth_col).alias("__t__"),
                      F.col(pred_col).alias("__p__"))
             .agg(F.count(F.lit(1)).alias("__n__")))
    support = pairs.groupBy(F.col("__t__").alias("label")).agg(
        F.sum("__n__").cast("long").alias("n_true"))
    predicted = pairs.groupBy(F.col("__p__").alias("label")).agg(
        F.sum("__n__").cast("long").alias("n_pred"))
    tp = (pairs.filter(F.col("__t__") == F.col("__p__"))
          .select(F.col("__t__").alias("label"),
                  F.col("__n__").cast("long").alias("tp")))
    grid = (support.join(predicted, "label", "full")
            .join(tp, "label", "left")
            .fillna({"n_true": 0, "n_pred": 0, "tp": 0}))
    prec = F.when(F.col("n_pred") > 0,
                  F.expr("(1000000 * tp) div n_pred")).otherwise(0)
    rec = F.when(F.col("n_true") > 0,
                 F.expr("(1000000 * tp) div n_true")).otherwise(0)
    f1 = F.when(F.col("n_true") + F.col("n_pred") > 0,
                F.expr("(2000000 * tp) div (n_true + n_pred)")
                ).otherwise(0)
    return grid.select(
        "label", "n_true", "n_pred", "tp",
        prec.cast("long").alias("precision_ppm"),
        rec.cast("long").alias("recall_ppm"),
        f1.cast("long").alias("f1_ppm"))


def runs_test(df: DataFrame, key_col: str, ts_col: str,
              value_col: str,
              tiebreak_col: Optional[str] = None) -> DataFrame:
    """Wald–Wolfowitz runs test per key: the sequence of signs
    (value above/below the KEY'S OWN median, ties-at-median dropped)
    is summarized as the observed number of runs R and the
    randomness benchmark E[R] = 2ab/n + 1 — too few runs means
    clumping/trend, too many means oscillation.  All integers:
    R = 1 + #(sign flips), ``expected_runs_ppm = (2·a·b·10^6) div n
    + 10^6`` (E[R] in ppm units both engines truncate identically).

    Scale shape: the median is the per-key percentile_disc order
    statistic read off a rank window PARTITIONED BY KEY (many keys →
    full parallelism — the per-key grain here is genuinely bounded,
    unlike the few-huge-groups spearman case); sign flips from one
    lag over the same per-key sort.
    """
    from pyspark.sql.window import Window as W

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else [])
    base = df.select(F.col(key_col), *order,
                     _cents(value_col).alias("__v__"))
    w_med = W.partitionBy(key_col).orderBy("__v__")
    w_all = W.partitionBy(key_col)
    ranked = (base.withColumn("__rn__", F.row_number().over(w_med))
              .withColumn("__n__", F.count(F.lit(1)).over(w_all)))
    med = ranked.groupBy(key_col).agg(
        F.min(F.when(F.col("__rn__") >= F.expr("(__n__ + 1) div 2"),
                     F.col("__v__"))).alias("__med__"))
    signed = (base.join(med, key_col)
              .filter(F.col("__v__") != F.col("__med__"))
              .withColumn("__s__",
                          (F.col("__v__") > F.col("__med__"))
                          .cast("int")))
    w_seq = W.partitionBy(key_col).orderBy(*order)
    flips = signed.withColumn(
        "__flip__",
        (F.lag("__s__").over(w_seq).isNotNull()
         & (F.lag("__s__").over(w_seq) != F.col("__s__")))
        .cast("long"))
    agg = flips.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_signs"),
        F.sum("__s__").cast("long").alias("n_above"),
        F.sum(1 - F.col("__s__")).cast("long").alias("n_below"),
        (F.sum("__flip__") + 1).cast("long").alias("n_runs"))
    return (agg.filter((F.col("n_above") > 0)
                       & (F.col("n_below") > 0))
            .withColumn(
                "expected_runs_ppm",
                F.expr(f"CAST((CAST(2000000 AS {_DEC}) * n_above"
                       f" * n_below) div n_signs + 1000000"
                       f" AS BIGINT)")))


def chi_square_gof_uniform(df: DataFrame, category_col: str,
                           n_categories: int) -> DataFrame:
    """Chi-square goodness-of-fit against the uniform distribution
    over ``n_categories`` buckets (the last-digit / lottery-audit
    test), integer-exact per category: with expected N/k the term
    (O − N/k)²/(N/k) = (k·O − N)²/k² · k/N = (k·O − N)² / (k·N),
    emitted as ``contrib_ppm = 10^6·(k·O − N)² div (k·N)``.
    Categories that
    never occur still contribute N/k (generated, not scanned).

    Scale shape: one groupBy to the category grain (k rows), a
    broadcast total, a driver-side k-row category spine.
    """
    k = int(n_categories)
    obs = (df.filter(F.col(category_col).isNotNull())
           .groupBy(F.col(category_col).cast("long").alias("cat"))
           .agg(F.count(F.lit(1)).alias("__o__")))
    spark = df.sparkSession
    spine = spark.createDataFrame([(i,) for i in range(k)],
                                  "cat long")
    tot = obs.agg(F.sum("__o__").alias("__N__"))
    grid = (spine.join(obs, "cat", "left").fillna({"__o__": 0})
            .crossJoin(F.broadcast(tot)))
    o = F.col("__o__").cast(_DEC)
    n = F.col("__N__").cast(_DEC)
    dev = F.lit(k) * o - n
    grid = grid.withColumn("__dev__", dev).withColumn("__n_d__", n)
    return grid.select(
        F.col("cat"),
        F.col("__o__").cast("long").alias("observed"),
        F.expr(f"CAST((CAST(1000000 AS {_DEC}) * __n_d__)"
               f" div {k} AS BIGINT)").alias("expected_ppm"),
        F.expr(f"CAST((__dev__ * __dev__ * 1000000)"
               f" div (CAST({k} AS {_DEC}) * __n_d__)"
               f" AS BIGINT)").alias("contrib_ppm"))


def logrank_test(df: DataFrame, duration_col: str, event_col: str,
                 group_col: str, group_a: str) -> DataFrame:
    """Two-group log-rank test numerators (Mantel 1966), the
    standard 'do these survival curves differ' companion to
    ``kaplan_meier``: at each distinct duration t with d_t total
    deaths, n_t total at risk and n1_t at risk in group A, the
    observed group-A deaths O = Σ d1_t are compared against the
    hypergeometric expectation E = Σ d_t·n1_t/n_t and variance
    V = Σ d_t·(n1_t/n_t)·(1 − n1_t/n_t)·(n_t − d_t)/(n_t − 1).

    E and V are sums of rationals, so the emitted statistic is
    DEFINED as the sum of per-time truncated-micro terms (each off
    by < 1e-6, replayed identically by SQL):
    ``e_micro = Σ (10^6·d_t·n1_t) div n_t`` and ``v_micro =
    Σ (10^6·d_t·n1_t·(n_t−n1_t)·(n_t−d_t)) div (n_t²·(n_t−1))``.
    The consumer forms z² ≈ (10^6·O − E_micro)² / (10^6·V_micro).

    Scale shape: identical to kaplan_meier — one groupBy to the
    bounded duration grain (with per-group death/at-risk splits from
    conditional aggregation), prefix sums on that grain, one final
    algebraic aggregate.  Emits one row:
    ``(n_a, n_b, o_a, e_a_micro, v_micro)``.
    """
    from pyspark.sql.window import Window as W

    is_a = F.col(group_col) == group_a
    per_t = (df.filter(F.col(duration_col).isNotNull())
             .groupBy(F.col(duration_col).cast("long").alias("t"))
             .agg(F.sum(F.col(event_col).cast("long")).alias("d"),
                  F.sum(F.when(is_a, F.col(event_col).cast("long"))
                        .otherwise(0)).alias("d1"),
                  F.count(F.lit(1)).alias("c"),
                  F.sum(is_a.cast("long")).alias("c1")))
    w_prev = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    tot = per_t.agg(F.sum("c").alias("__N__"),
                    F.sum("c1").alias("__N1__"))
    staged = (per_t.crossJoin(F.broadcast(tot))
              .withColumn("n", F.col("__N__") - F.coalesce(
                  F.sum("c").over(w_prev), F.lit(0)))
              .withColumn("n1", F.col("__N1__") - F.coalesce(
                  F.sum("c1").over(w_prev), F.lit(0))))
    e_term = F.expr(f"CAST((CAST(1000000 AS {_DEC}) * d * n1)"
                    f" div n AS {_DEC})")
    v_term = F.when(
        F.col("n") > 1,
        F.expr(f"CAST((CAST(1000000 AS {_DEC}) * d * n1 * (n - n1)"
               f" * (n - d)) div (n * n * (n - 1)) AS {_DEC})")
    ).otherwise(F.lit(0).cast(_DEC))
    deaths = staged.filter(F.col("d") > 0)
    deaths = (deaths.withColumn("__e__", e_term)
              .withColumn("__v__", v_term))
    out = deaths.agg(
        F.sum("d1").cast("long").alias("o_a"),
        F.sum("__e__").cast("long").alias("e_a_micro"),
        F.sum("__v__").cast("long").alias("v_micro"))
    return (out.crossJoin(F.broadcast(tot))
            .select(F.col("__N1__").cast("long").alias("n_a"),
                    (F.col("__N__") - F.col("__N1__")).cast("long")
                    .alias("n_b"),
                    "o_a", "e_a_micro", "v_micro"))


def theil_sen_slope(df: DataFrame, group_cols: Sequence[str],
                    ts_col: str, value_col: str,
                    bucket: str = "month") -> DataFrame:
    """Theil–Sen robust trend per group (Theil 1950, Sen 1968): the
    MEDIAN of all pairwise slopes of the bucketed value-sum series —
    immune to the outlier buckets that swing an OLS fit.  Each pair
    slope is quantized to the exact integer ``slope_upd =
    sign·(10^6·|Δy|) div Δx`` (micro-cents per day) and the median
    is the exact lower order statistic of those integers, so the SQL
    oracle replays everything.

    Scale shape: the quadratic is over the CALENDAR grain, not the
    data — a 7-year monthly series is 84 buckets → 3486 pairs per
    group regardless of fact count; the pair join is grain×grain,
    the median a per-group rank window on the pair grain.
    """
    from pyspark.sql.window import Window as W

    gcols = list(group_cols)
    b = (df.groupBy(*[F.col(c) for c in gcols],
                    F.datediff(F.to_date(F.date_trunc(
                        bucket, F.col(ts_col))),
                        F.lit("1970-01-01").cast("date"))
                    .cast("long").alias("__x__"))
         .agg(F.sum(F.round(F.col(value_col) * 100).cast("long"))
              .cast("long").alias("__y__")))
    left = b.select(*gcols, F.col("__x__").alias("__x1__"),
                    F.col("__y__").alias("__y1__"))
    right = b.select(*gcols, F.col("__x__").alias("__x2__"),
                     F.col("__y__").alias("__y2__"))
    pairs = (left.join(right, gcols)
             .filter(F.col("__x1__") < F.col("__x2__")))
    dy = F.col("__y2__") - F.col("__y1__")
    dx = F.col("__x2__") - F.col("__x1__")
    slope = (F.when(dy < 0, -1).otherwise(1)
             * F.expr(f"(CAST(1000000 AS {_DEC})"
                      f" * abs(__y2__ - __y1__))"
                      f" div (__x2__ - __x1__)")).cast("long")
    sl = pairs.select(*gcols, slope.alias("__s__"))
    w_ord = W.partitionBy(*gcols).orderBy("__s__")
    w_all = W.partitionBy(*gcols)
    ranked = (sl.withColumn("__rn__", F.row_number().over(w_ord))
              .withColumn("__n__", F.count(F.lit(1)).over(w_all)))
    return (ranked.groupBy(*gcols)
            .agg(F.max("__n__").cast("long").alias("n_pairs"),
                 F.min(F.when(
                     F.col("__rn__") >= F.expr("(__n__ + 1) div 2"),
                     F.col("__s__"))).cast("long")
                 .alias("median_slope_upd")))


def cuped_adjusted_diff(df: DataFrame, unit_col: str,
                        group_col: str, treat_value: str,
                        pre_col: str, post_col: str) -> DataFrame:
    """CUPED-adjusted treatment effect (Deng, Xu, Kohavi & Walker,
    WSDM 2013) — the experimentation-platform variance-reduction
    estimator: with per-unit pre-period covariate X and outcome Y,
    θ = cov(X,Y)/var(X) (pooled) and the adjusted effect is
    ``(Ȳ_t − Ȳ_c) − θ·(X̄_t − X̄_c)``.

    All inputs are cents; every reported number is a DEFINED chain
    of integer operations both engines replay: means in micro-cents
    (truncating div), ``theta_ppm = sign·((10^6·|cov_num|) div
    var_num)`` from the pooled integer moment sums (n·Σxy − ΣxΣy
    over n·Σx² − (Σx)²), and the adjustment term is
    ``(theta_ppm · Δx̄_micro) div 10^6``.

    Scale shape: one groupBy to the unit grain (the experiment
    table), two algebraic aggregations; no windows, no sort.
    """
    units = (df.groupBy(F.col(unit_col).alias("__u__"))
             .agg(F.max((F.col(group_col) == treat_value)
                        .cast("int")).alias("__t__"),
                  F.sum(F.round(F.col(pre_col) * 100).cast("long"))
                  .alias("__x__"),
                  F.sum(F.round(F.col(post_col) * 100).cast("long"))
                  .alias("__y__")))
    x = F.col("__x__").cast(_DEC)
    y = F.col("__y__").cast(_DEC)
    m = units.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx"),
        F.sum(F.when(F.col("__t__") == 1, 1).otherwise(0))
        .cast(_DEC).alias("nt"),
        F.sum(F.when(F.col("__t__") == 1, x).otherwise(0))
        .alias("sxt"),
        F.sum(F.when(F.col("__t__") == 1, y).otherwise(0))
        .alias("syt"))
    m = (m.withColumn("nc", F.col("n") - F.col("nt"))
         .withColumn("sxc", F.col("sx") - F.col("sxt"))
         .withColumn("syc", F.col("sy") - F.col("syt"))
         .filter((F.col("nt") > 0) & (F.col("nc") > 0)))
    m = (m.withColumn("covn", F.col("n") * F.col("sxy")
                      - F.col("sx") * F.col("sy"))
         .withColumn("varn", F.col("n") * F.col("sxx")
                     - F.col("sx") * F.col("sx"))
         .filter(F.col("varn") > 0))
    theta = (F.when(F.col("covn") < 0, -1).otherwise(1)
             * F.expr(f"(CAST(1000000 AS {_DEC}) * abs(covn))"
                      f" div varn"))
    dy_micro = F.expr(f"(CAST(1000000 AS {_DEC}) * syt) div nt"
                      f" - (CAST(1000000 AS {_DEC}) * syc) div nc")
    dx_micro = F.expr(f"(CAST(1000000 AS {_DEC}) * sxt) div nt"
                      f" - (CAST(1000000 AS {_DEC}) * sxc) div nc")
    m = (m.withColumn("__theta__", theta)
         .withColumn("__dy__", dy_micro)
         .withColumn("__dx__", dx_micro))
    adj = F.expr("__dy__ - (__theta__ * __dx__) div 1000000")
    return m.select(
        F.col("nt").cast("long").alias("n_treat"),
        F.col("nc").cast("long").alias("n_control"),
        F.col("__dy__").cast("long").alias("raw_diff_microcents"),
        F.col("__theta__").cast("long").alias("theta_ppm"),
        adj.cast("long").alias("adj_diff_microcents"))


def mann_kendall(df: DataFrame, group_cols: Sequence[str],
                 ts_col: str, value_col: str,
                 bucket: str = "month") -> DataFrame:
    """Mann–Kendall trend test per group (Mann 1945, Kendall 1975):
    S = Σ_{i<j} sign(y_j − y_i) over the bucketed value-sum series —
    the nonparametric 'is there a monotone trend' companion to
    Theil–Sen, sharing its calendar-bounded pair frame.  Ties
    contribute 0 to S and enter the variance through the standard
    correction; since Var(S) = (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5))/18
    is rational with denominator 18, the emitted ``var_s_x18`` is
    the exact integer numerator (consumers form z² ≈ 18·(S∓1)²/
    var_s_x18).

    Scale shape: one shuffle to the (group, bucket) grain; the pair
    join and the tie-run aggregation run on that bounded grain (84
    monthly buckets → 3486 pairs per group at any fact count).
    """
    gcols = list(group_cols)
    b = (df.groupBy(*[F.col(c) for c in gcols],
                    F.datediff(F.to_date(F.date_trunc(
                        bucket, F.col(ts_col))),
                        F.lit("1970-01-01").cast("date"))
                    .cast("long").alias("__x__"))
         .agg(F.sum(F.round(F.col(value_col) * 100).cast("long"))
              .cast("long").alias("__y__")))
    left = b.select(*gcols, F.col("__x__").alias("__x1__"),
                    F.col("__y__").alias("__y1__"))
    right = b.select(*gcols, F.col("__x__").alias("__x2__"),
                     F.col("__y__").alias("__y2__"))
    pairs = (left.join(right, gcols)
             .filter(F.col("__x1__") < F.col("__x2__")))
    sgn = (F.when(F.col("__y2__") > F.col("__y1__"), 1)
           .when(F.col("__y2__") < F.col("__y1__"), -1)
           .otherwise(0))
    s = pairs.groupBy(*gcols).agg(
        F.sum(sgn).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"))
    ties = (b.groupBy(*gcols, F.col("__y__"))
            .agg(F.count(F.lit(1)).alias("__t__"))
            .groupBy(*gcols)
            .agg(F.count(F.lit(1)).cast("long").alias("__nv__"),
                 F.sum(F.col("__t__").cast(_DEC)
                       * (F.col("__t__") - 1)
                       * (2 * F.col("__t__") + 5)).cast(_DEC)
                 .alias("__tcorr__"),
                 F.sum("__t__").cast("long").alias("n_buckets")))
    joined = s.join(ties, gcols)
    n = F.col("n_buckets").cast(_DEC)
    var18 = (n * (n - 1) * (2 * n + 5)
             - F.coalesce(F.col("__tcorr__"), F.lit(0).cast(_DEC)))
    return joined.select(
        *gcols, "n_buckets", "n_pairs", "s",
        var18.cast("long").alias("var_s_x18"))


def _fdiv(a: str, b: str) -> str:
    """SQL text for EXACT floor division of non-negative
    decimal(38,0) expressions that STAYS decimal(38,0).  Spark's
    ``div`` operator always narrows its result to BIGINT (overflow
    at ~9.2·10¹⁸), so large-integer quotients need the remainder
    form ``(a − a % b) / b``: the decimal ``%`` is exact, the
    division's operand is then an exact multiple of ``b``, and the
    (38,6)-typed quotient is integral — representable exactly up to
    10³² — before the final cast.  DuckDB replays it as plain
    HUGEINT ``//`` (both floor non-negative operands identically).
    """
    return (f"CAST(((({a}) - (({a}) % ({b}))) / ({b})) AS {_DEC})")


def _anova_from_moments(gstats: DataFrame, k_scale: int = 1000
                        ) -> DataFrame:
    """Shared F-statistic assembly for :func:`one_way_anova` /
    :func:`brown_forsythe`: from the per-group moment frame
    ``(n_g, s_g, q_g)`` (count, sum, sum-of-squares — all exact
    integers in cents), emit the classical one-way F and eta² as
    scaled integers a SQL oracle replays bit-for-bit.

    Exactness recipe (every step integer, both engines truncate
    identically):

        A   = Σ_g (s_g² · SCALE) fdiv n_g         (SCALE = 10³)
        SSB = max(0, A − (S² · SCALE) fdiv n)
        SSW = max(0, Q · SCALE − A)
        SST = max(0, Q · SCALE − (S² · SCALE) fdiv n)
        f_ppm    = (SSB · (n−k) · 10⁶) fdiv (SSW · (k−1))
        eta2_ppm = (SSB · 10⁶) fdiv SST

    where ``fdiv`` is :func:`_fdiv` — Spark's ``div`` operator
    always narrows to BIGINT, so the quotients here (up to ~10²⁶)
    need the remainder-subtraction floor division to stay in
    decimal(38,0).  The interim SCALE=10³ keeps the per-group
    truncation error below one part in 10³ of a cent² while bounding
    the largest product — Q·10³·n·10⁶ — under 10³⁸ (decimal(38,0) /
    HUGEINT) up to roughly 10⁸ fact rows of 7-digit cent values
    (≈ sf30 orders).

    Scale shape: ONE map-side-combinable aggregation to the k-row
    group grain, then a k-row reduce — no window, no join, no
    driver-side data beyond the final row.
    """
    a_term = F.sum(F.expr(_fdiv(
        f"CAST(s_g AS {_DEC}) * s_g * {k_scale}",
        f"CAST(n_g AS {_DEC})"))).alias("__a__")
    tot = gstats.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast(_DEC).alias("__n__"),
        F.sum(F.col("s_g").cast(_DEC)).alias("__s__"),
        F.sum(F.col("q_g").cast(_DEC)).alias("__q__"),
        a_term)
    ssb = F.expr(
        f"greatest(CAST(0 AS {_DEC}), __a__ - "
        + _fdiv(f"__s__ * __s__ * {k_scale}", "__n__") + ")")
    ssw = F.expr(
        f"greatest(CAST(0 AS {_DEC}), __q__ * {k_scale} - __a__)")
    sst = F.expr(
        f"greatest(CAST(0 AS {_DEC}), __q__ * {k_scale} - "
        + _fdiv(f"__s__ * __s__ * {k_scale}", "__n__") + ")")
    out = (tot.withColumn("__ssb__", ssb)
           .withColumn("__ssw__", ssw)
           .withColumn("__sst__", sst))
    f_ppm = F.expr(
        "CAST(CASE WHEN __ssw__ > 0 AND k > 1 THEN "
        + _fdiv("__ssb__ * (__n__ - k) * 1000000",
                "__ssw__ * (k - 1)")
        + " END AS BIGINT)")
    eta = F.expr(
        "CAST(CASE WHEN __sst__ > 0 THEN "
        + _fdiv("__ssb__ * 1000000", "__sst__")
        + " END AS BIGINT)")
    return out.select(
        F.col("k").alias("n_groups"),
        F.col("__n__").cast("long").alias("n_rows"),
        f_ppm.alias("f_ppm"),
        eta.alias("eta2_ppm"))


def one_way_anova(df: DataFrame, group_col: str,
                  value_col: str) -> DataFrame:
    """One-way ANOVA (Fisher): F = (SSB/(k−1)) / (SSW/(n−k)) across
    the groups of ``group_col``, plus the eta² effect size — emitted
    as exact scaled integers (``f_ppm``, ``eta2_ppm``) via the
    integer recipe in :func:`_anova_from_moments`.  The reference's
    aggregate vocabulary stops at variance (see module docstring);
    this is the standard 'do the group means differ' companion.

    Scale shape: one aggregation to the group grain carrying
    (count, Σv, Σv²) — map-side combinable, no shuffle beyond the
    k-row exchange; identical cost to a plain grouped variance.
    """
    v = _cents(value_col)
    gstats = (df.filter(F.col(value_col).isNotNull()
                        & F.col(group_col).isNotNull())
              .groupBy(group_col)
              .agg(F.count(F.lit(1)).cast("long").alias("n_g"),
                   F.sum(v.cast(_DEC)).alias("s_g"),
                   F.sum(v.cast(_DEC) * v).alias("q_g")))
    return _anova_from_moments(gstats)


def brown_forsythe(df: DataFrame, group_col: str,
                   value_col: str) -> DataFrame:
    """Brown–Forsythe test for equality of group variances (Brown &
    Forsythe 1974): the one-way ANOVA F applied to the absolute
    deviations from each GROUP MEDIAN ``z = |v − med_g|`` — the
    robust (median-centred) Levene variant.  Medians are exact
    percentile_disc order statistics in cents (smallest v with
    rank ≥ (n_g+1) div 2), so z is an exact integer and the F
    assembly shares :func:`_anova_from_moments`'s recipe verbatim.

    Scale shape: per-group ranks come from a window PARTITIONED BY
    THE GROUP (never global); the median attaches back with one
    null-safe equi-join on the group key; then the same single
    moment aggregation as :func:`one_way_anova`.
    """
    from pyspark.sql.window import Window as W

    base = (df.filter(F.col(value_col).isNotNull()
                      & F.col(group_col).isNotNull())
            .select(F.col(group_col).alias("__g__"),
                    _cents(value_col).alias("__v__")))
    w_ord = W.partitionBy("__g__").orderBy("__v__")
    w_all = W.partitionBy("__g__")
    ranked = (base.withColumn("__rn__", F.row_number().over(w_ord))
              .withColumn("__ng__", F.count(F.lit(1)).over(w_all)))
    med = ranked.groupBy("__g__").agg(
        F.min(F.when(F.col("__rn__") >= F.expr("(__ng__ + 1) div 2"),
                     F.col("__v__"))).alias("__med__"))
    z = F.abs(F.col("__v__") - F.col("__med__"))
    gstats = (_null_safe_join(base, med, ["__g__"],
                              broadcast_right=True)
              .select("__g__", z.alias("__z__"))
              .groupBy("__g__")
              .agg(F.count(F.lit(1)).cast("long").alias("n_g"),
                   F.sum(F.col("__z__").cast(_DEC)).alias("s_g"),
                   F.sum(F.col("__z__").cast(_DEC)
                         * F.col("__z__")).alias("q_g")))
    return _anova_from_moments(gstats)


def kruskal_wallis(df: DataFrame, group_col: str, value_col: str,
                   num_buckets: int = 256) -> DataFrame:
    """Kruskal–Wallis H across the groups of ``group_col`` — the
    k-sample rank generalization of :func:`mann_whitney_u`, with the
    standard tie correction, emitted as an exact scaled integer
    ``h_ppm`` a SQL oracle replays bit-for-bit.

    With DOUBLED tie-averaged ranks (2·avg_rank(v) = 2·#below(v) +
    ties(v) + 1 — pure counts off the value-grain cumulative
    histogram), the doubled rank sum R2_g gives

        A     = Σ_g (R2_g² · 10⁶) fdiv (4·n_g)
        B     = max(0, (12·A) fdiv (n(n+1)) − 3(n+1)·10⁶)
        h_ppm = (B · (n³−n)) fdiv (n³−n−T),  T = Σ_v (t_v³ − t_v)

    — H = 12/(n(n+1))·ΣR_g²/n_g − 3(n+1) over the tie factor
    1 − T/(n³−n), every division the exact decimal floor division
    of :func:`_fdiv` (DuckDB replays HUGEINT ``//``).  The decimal(38,0) bound holds to ≈ 10⁸ rows.

    Scale shape: the pooled ranking NEVER materializes per-row ranks
    — one groupBy to the (value, group) grain, the two-phase
    value-bucketed prefix sum of :func:`~cubes_spark.operators.olap.
    _cum_value_histogram` for #(x ≤ v), one value-grain equi-join,
    one aggregation to the k-row group grain.
    """
    from cubes_spark.operators.olap import _cum_value_histogram

    base = (df.filter(F.col(value_col).isNotNull()
                      & F.col(group_col).isNotNull())
            .select(F.col(group_col).alias("__g__"),
                    _cents(value_col).alias("__vc__")))
    cum = _cum_value_histogram(base, "__vc__", num_buckets)
    spark = df.sparkSession
    if cum is None:
        return spark.createDataFrame(
            [], "n_groups long, n_rows long, tie_term long, "
                "h_ppm long")
    # doubled tie-averaged rank per distinct value, and the tie term
    vals = cum.select(
        "__v__",
        (2 * F.col("__cum__") - F.col("__cnt__") + 1)
        .cast(_DEC).alias("__r2__"))
    ties = cum.agg(
        F.sum(F.col("__cnt__").cast(_DEC) * F.col("__cnt__")
              * F.col("__cnt__")
              - F.col("__cnt__")).alias("__t__"),
        F.sum("__cnt__").cast(_DEC).alias("__n__"))
    gv = (base.groupBy("__g__", F.col("__vc__").alias("__v__"))
          .agg(F.count(F.lit(1)).cast("long").alias("__c__")))
    per_g = (gv.join(vals, "__v__")
             .groupBy("__g__")
             .agg(F.sum("__c__").cast(_DEC).alias("__ng__"),
                  F.sum(F.col("__c__") * F.col("__r2__"))
                  .alias("__r2g__")))
    a_term = F.sum(F.expr(_fdiv(
        "__r2g__ * __r2g__ * 1000000",
        f"CAST(4 AS {_DEC}) * __ng__"))).alias("__a__")
    tot = per_g.agg(F.count(F.lit(1)).cast("long").alias("k"),
                    a_term).crossJoin(ties)
    b = F.expr(
        f"greatest(CAST(0 AS {_DEC}), "
        + _fdiv("12 * __a__", "__n__ * (__n__ + 1)")
        + " - 3 * (__n__ + 1) * 1000000)")
    out = tot.withColumn("__b__", b)
    h = F.expr(
        "CAST(CASE WHEN __n__ * __n__ * __n__ - __n__ - __t__ > 0"
        " THEN "
        + _fdiv("__b__ * (__n__ * __n__ * __n__ - __n__)",
                "__n__ * __n__ * __n__ - __n__ - __t__")
        + " END AS BIGINT)")
    return out.select(
        F.col("k").alias("n_groups"),
        F.col("__n__").cast("long").alias("n_rows"),
        F.col("__t__").cast("long").alias("tie_term"),
        h.alias("h_ppm"))


def shannon_entropy(df: DataFrame, category_col: str) -> DataFrame:
    """Shannon entropy of a categorical distribution, in nats:
    H = ln n − (Σ_c c·ln c)/n over the category counts.  Counts are
    exact longs; the only float work is the pointwise ``ln``
    (:func:`~cubes_spark.llm.util.libm_ln` — C-library bits, because
    the JVM's Math.log is 1 ulp off glibc on ~2% of integer inputs)
    and ONE ordered fold over the sorted c·ln c array — double
    addition is not associative, so the k-term Σ c·ln c runs as a
    sequential ``aggregate()`` over ``array_sort(collect_list(...))``,
    which the oracle replays with the identical sorted-list reduce
    (DuckDB ``list_reduce``).

    Scale shape: one map-side-combinable count aggregation to the
    category grain; the collect_list holds only the k category counts
    (bounded by the alphabet, not the fact count).
    """
    from cubes_spark.llm.util import libm_ln

    cnt = (df.filter(F.col(category_col).isNotNull())
           .groupBy(category_col)
           .agg(F.count(F.lit(1)).cast("long").alias("__c__")))
    # ln through the C library (libm_ln): the JVM's Math.log differs
    # from glibc's (= DuckDB's) by 1 ulp on ~2% of integer inputs;
    # the category grain is bounded so the Python hop costs nothing.
    # c·ln c is monotone in c, so sorting the products reproduces the
    # oracle's sort-by-count fold order even through ties.
    clnc = cnt.select(
        "__c__",
        (F.col("__c__").cast("double")
         * libm_ln(F.col("__c__").cast("double"))).alias("__clnc__"))
    tot = clnc.agg(
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.sum("__c__").cast("long").alias("n_rows"),
        F.array_sort(F.collect_list("__clnc__")).alias("__cs__"))
    return (tot.withColumn(
        "__sum_clnc__",
        F.expr("aggregate(__cs__, CAST(0.0 AS DOUBLE),"
               " (acc, v) -> acc + v)"))
        .withColumn("__lnn__",
                    libm_ln(F.col("n_rows").cast("double")))
        .select("n_categories", "n_rows",
                F.expr("CASE WHEN n_rows > 0 THEN"
                       " __lnn__ - __sum_clnc__ / n_rows"
                       " END").alias("entropy_nats")))


def ratio_delta_ci(df: DataFrame, group_cols: Sequence[str],
                   num_col: str, den_col: str) -> DataFrame:
    """Per-group ratio-of-sums metric R = Σx/Σy with its delta-method
    (linearization) variance — the standard estimator for ratio
    metrics in A/B analysis (e.g. revenue per unit), where rows are
    the randomization unit:

        var(R) ≈ n/(n−1) · (Σx² − 2R·Σxy + R²·Σy²) / (Σy)²

    All six moments (n, Σx, Σy, Σx², Σy², Σxy) are EXACT integers in
    cents; R and var(R) are then computed with the one fixed double
    formula both engines share, so the output hashes bit-for-bit.

    Scale shape: one map-side-combinable aggregation to the group
    grain — identical cost to a grouped variance; no window, no join.
    """
    x = _cents(num_col)
    y = _cents(den_col)
    g = (df.filter(F.col(num_col).isNotNull()
                   & F.col(den_col).isNotNull())
         .groupBy(*group_cols)
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum(x.cast(_DEC)).alias("__sx__"),
              F.sum(y.cast(_DEC)).alias("__sy__"),
              F.sum(x.cast(_DEC) * x).alias("__sxx__"),
              F.sum(y.cast(_DEC) * y).alias("__syy__"),
              F.sum(x.cast(_DEC) * y).alias("__sxy__")))
    r = "(CAST(__sx__ AS DOUBLE) / CAST(__sy__ AS DOUBLE))"
    var = (f"CAST(n AS DOUBLE)/(n-1) * (CAST(__sxx__ AS DOUBLE)"
           f" - 2*{r}*CAST(__sxy__ AS DOUBLE)"
           f" + {r}*{r}*CAST(__syy__ AS DOUBLE))"
           f" / (CAST(__sy__ AS DOUBLE)*CAST(__sy__ AS DOUBLE))")
    return g.select(
        *group_cols, "n",
        F.expr(f"CASE WHEN __sy__ <> 0 THEN {r} END").alias("ratio"),
        F.expr(f"CASE WHEN __sy__ <> 0 AND n > 1 THEN {var} END")
        .alias("var_ratio"))


#: cumulative Poisson(1) thresholds in the 60-bit hash space:
#: T_k = floor(P(X <= k) · 2^60); a uniform 60-bit draw u maps to
#: weight w = #{k : u >= T_k} — the inverse-CDF in pure integers.
_POISSON1_THRESHOLDS = (
    424136118829305344, 848272237658610688, 1060340297073263360,
    1131029650211480960, 1148701988496035328, 1152236456152946176,
    1152825534095764608, 1152909688087595776)


def poisson_bootstrap_mean(df: DataFrame, group_cols: Sequence[str],
                           value_col: str, id_col: str,
                           n_reps: int = 64,
                           salt: str = "boot") -> DataFrame:
    """Per-group bootstrap confidence interval for the mean via the
    POISSON bootstrap (Chamandy et al. 2012 — the resampling scheme
    that works on partitioned data: each row independently draws a
    Poisson(1) multiplicity per replicate, no global sample of size
    n required).  The draw is the portable md5 hash of
    ``salt:replicate:id`` mapped through integer inverse-CDF
    thresholds (:data:`_POISSON1_THRESHOLDS`), so every replicate is
    deterministic and the oracle replays it hash-for-hash.

    Replicate means are exact-int ratios evaluated as one double
    division; the interval is the 2nd / (B−1)th order statistic of
    the B replicate means (≈ the 2.5/97.5 percentile band at B=64).

    Scale shape: ONE Arrow-batched map stage computes all B weights
    per row and pre-aggregates (group × B) partial sums in-batch —
    no exploded rows ever exist, and the shuffle carries only
    |groups|·B partial rows per batch; the order statistics then run
    on B rows per group.  No resampling shuffle ever happens — this
    is the point of the Poisson scheme.  (With more than one group
    column the group key rides the batch stage as a concatenated
    string and is split back afterwards.)
    """
    from pyspark.sql.window import Window as W

    import pandas as pd

    gcols = list(group_cols)
    base = (df.filter(F.col(value_col).isNotNull())
            .select(*gcols, F.col(id_col).alias("__id__"),
                    _cents(value_col).alias("__x__")))
    single = base
    if len(gcols) != 1:
        single = base.withColumn(
            "__g__", F.concat_ws("\x1f",
                                 *[F.col(c).cast("string")
                                   for c in gcols]))

    # The md5 → uniform → weight chain runs in ONE Arrow batch stage
    # that also pre-aggregates (group, replicate) partial sums: the
    # JVM formulation (explode 64× + md5 + conv per row) was measured
    # at 13s for 9.6M rows at sf0.1 — conv(hex,16,10) alone cost as
    # much as md5 — while this map-side combine ships only
    # |groups|·B partial rows per batch and no exploded rows at all.
    # The arithmetic is IDENTICAL (hashlib md5 == SQL md5 bytes,
    # int(hex,16) == conv, bisect == the threshold sum), so the
    # DuckDB oracle still replays it exactly.
    from bisect import bisect_right

    import hashlib

    thresholds = list(_POISSON1_THRESHOLDS)
    gname = gcols[0] if len(gcols) == 1 else "__g__"

    def _partials(batches):
        for pdf in batches:
            acc = {}
            for g, i, x in zip(pdf[gname], pdf["__id__"],
                               pdf["__x__"]):
                pre = f"{salt}:%d:{i}"
                for b in range(n_reps):
                    h = hashlib.md5(
                        (pre % b).encode()).hexdigest()[:15]
                    w = bisect_right(thresholds, int(h, 16))
                    if w:
                        k = (g, b)
                        if k in acc:
                            acc[k][0] += w * x
                            acc[k][1] += w
                        else:
                            acc[k] = [w * x, w]
                    else:
                        acc.setdefault((g, b), [0, 0])
            yield pd.DataFrame(
                [(g, b, swx, sw)
                 for (g, b), (swx, sw) in acc.items()],
                columns=[gname, "__b__", "__pswx__", "__psw__"])

    # a small scale-factor input can be a single parquet split; the
    # weight stage is CPU-bound (B md5s per row, ~1.4us each), so
    # spread it across the cluster before the batch stage — at real
    # scale the input already has more partitions than cores and the
    # repartition is a no-op branch
    sc = df.sparkSession.sparkContext
    if single.rdd.getNumPartitions() < sc.defaultParallelism:
        single = single.repartition(sc.defaultParallelism)
    gtype = dict(single.dtypes)[gname]
    partial = single.mapInPandas(
        _partials,
        f"`{gname}` {gtype}, __b__ int, __pswx__ long, __psw__ long")
    perb0 = (partial.groupBy(gname, "__b__")
             .agg(F.sum(F.col("__pswx__").cast(_DEC))
                  .alias("__swx__"),
                  F.sum("__psw__").cast("long").alias("__sw__")))
    if len(gcols) == 1:
        perb = perb0
    else:
        split = F.split(F.col(gname), "\x1f")
        perb = perb0.select(
            *[split.getItem(i).alias(c) for i, c in enumerate(gcols)],
            "__b__", "__swx__", "__sw__")
    means = (perb.filter(F.col("__sw__") > 0)
             .select(*gcols, "__b__",
                     F.expr("CAST(__swx__ AS DOUBLE) / __sw__")
                     .alias("__m__")))
    wo = W.partitionBy(*gcols).orderBy("__m__", "__b__")
    wall = W.partitionBy(*gcols)
    ranked = (means.withColumn("__rn__", F.row_number().over(wo))
              .withColumn("__nb__", F.count(F.lit(1)).over(wall)))
    ci = ranked.groupBy(*gcols).agg(
        F.max("__nb__").cast("long").alias("n_reps"),
        F.min(F.when(F.col("__rn__") == 2, F.col("__m__")))
        .alias("ci_lo"),
        F.min(F.when(F.col("__rn__") == F.col("__nb__") - 1,
                     F.col("__m__"))).alias("ci_hi"))
    point = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"CAST(CAST(sum(CAST(__x__ AS {_DEC})) AS DOUBLE)"
               f" / count(*) AS DOUBLE)").alias("mean_cents"))
    return _null_safe_join(point, ci, gcols).select(
        *gcols, "n", "mean_cents", "n_reps", "ci_lo", "ci_hi")


def binary_segmentation(df: DataFrame, ts_col: str, value_col: str,
                        bucket: str = "day") -> DataFrame:
    """Single-changepoint detection by binary segmentation (the
    classic Scott & Knott / CUSUM-style SSE split): bucket the series
    to a calendar grain, then pick the split i that MINIMIZES total
    squared error — equivalently maximizes

        gain(i) = (S_L²·K) fdiv n_L + (S_R²·K) fdiv n_R      (K = 10³)

    with exact integer prefix sums in cents (:func:`_fdiv` floor
    division, so the oracle replays the argmax bit-for-bit; ties
    break on the earlier day).  ``gain_scaled`` is reported relative
    to the no-split baseline (S²·K) fdiv n — positive means the split
    explains variance.  The complement of :func:`~cubes_spark.
    operators.stats.mann_kendall`'s monotone-trend test: WHERE does
    the level shift.

    Scale shape: one shuffle to the bounded calendar grain (days —
    thousands of rows at ANY fact count), prefix sums via a window
    over that bounded grain, one bounded driver row for (n, total),
    and an order-by-limit-1 on the candidate frame.

    Output bound (like the ANOVA family): ``gain_scaled`` is
    10³ × the between-segment sum of squares of per-day cent sums,
    reported as BIGINT — exact-replay domain is
    |gain − base| < 2⁶³ (≈ daily sums below ~3·10⁷ cent-dollars
    squared, i.e. ≲ 10⁸ fact rows at TPC-H price scales).  Beyond
    that Spark's non-ANSI cast yields NULL while the oracle's
    HUGEINT→BIGINT cast errors; keep series inside the bound or
    re-bucket to a coarser grain.
    """
    from pyspark.sql.window import Window as W

    b = (df.filter(F.col(value_col).isNotNull())
         .groupBy(F.to_date(F.date_trunc(bucket, F.col(ts_col)))
                  .alias("__d__"))
         .agg(F.sum(_cents(value_col)).cast(_DEC).alias("__s__")))
    w = W.orderBy("__d__")
    cum = (b.withColumn("__i__", F.row_number().over(w))
           .withColumn("__cs__", F.sum("__s__").over(w)))
    tot = cum.agg(F.max("__i__").alias("n"),
                  F.sum("__s__").alias("st")).first()
    spark = df.sparkSession
    if tot["n"] is None or int(tot["n"]) < 2:
        return spark.createDataFrame(
            [], "split_day string, n_left long, n_days long, "
                "mean_left_cents double, mean_right_cents double, "
                "gain_scaled long")
    n, st = int(tot["n"]), str(tot["st"])
    gain = (F.expr(_fdiv("__cs__ * __cs__ * 1000",
                         f"CAST(__i__ AS {_DEC})"))
            + F.expr(_fdiv(
                f"(CAST('{st}' AS {_DEC}) - __cs__)"
                f" * (CAST('{st}' AS {_DEC}) - __cs__) * 1000",
                f"CAST({n} - __i__ AS {_DEC})")))
    base = F.expr(_fdiv(
        f"CAST('{st}' AS {_DEC}) * CAST('{st}' AS {_DEC}) * 1000",
        f"CAST({n} AS {_DEC})"))
    cand = (cum.filter(F.col("__i__") < n)
            .withColumn("__g__", gain)
            .orderBy(F.col("__g__").desc(), F.col("__d__").asc())
            .limit(1))
    return cand.select(
        F.date_format("__d__", "yyyy-MM-dd").alias("split_day"),
        F.col("__i__").cast("long").alias("n_left"),
        F.lit(n).cast("long").alias("n_days"),
        F.expr("CAST(CAST(__cs__ AS DOUBLE) / __i__ AS DOUBLE)")
        .alias("mean_left_cents"),
        F.expr(f"CAST(CAST(CAST('{st}' AS {_DEC}) - __cs__ AS DOUBLE)"
               f" / ({n} - __i__) AS DOUBLE)")
        .alias("mean_right_cents"),
        (F.col("__g__") - base).cast("long").alias("gain_scaled"))


def welch_t2(df: DataFrame, group_col: str, value_col: str,
             group_a: str, group_b: str) -> DataFrame:
    """Welch's unequal-variance two-sample test, emitted as the exact
    scaled integers ``t2_ppm`` (the SQUARED t statistic — rational,
    unlike t itself) and ``nu_milli`` (the Welch–Satterthwaite
    degrees of freedom):

        d_i     = ((n_i·Q_i − S_i²) · 10⁶) fdiv (n_i²·(n_i−1))
        N       = ((S₁n₂ − S₂n₁)² fdiv (n₁n₂)²) · 10⁶
        t2_ppm  = (N · 10⁶) fdiv (d₁ + d₂)
        nu_milli = ((d₁+d₂)² · 10³) fdiv (d₁² fdiv (n₁−1)
                                          + d₂² fdiv (n₂−1))

    — d_i is 10⁶·v_i/n_i from exact cent moments, every division the
    exact decimal floor division of :func:`_fdiv`, so a SQL oracle
    replays the statistic bit-for-bit (HUGEINT ``//``).  The staged
    quotients keep every intermediate under 10³⁸ to ≈ 10⁷ rows per
    group.  The two-group companion of :func:`one_way_anova` when
    variances differ (where Student's pooled t misleads).

    Scale shape: ONE map-side-combinable conditional aggregation over
    the two groups' rows — no shuffle beyond the 1-row reduce, no
    window, no join.
    """
    v = _cents(value_col)
    isa = F.col(group_col) == group_a
    isb = F.col(group_col) == group_b
    gg = (df.filter((isa | isb) & F.col(value_col).isNotNull())
          .groupBy()
          .agg(F.sum(isa.cast("long")).cast(_DEC).alias("n1"),
               F.sum(F.when(isa, v).otherwise(0).cast(_DEC))
               .alias("s1"),
               F.sum(F.when(isa, v.cast(_DEC) * v)
                     .otherwise(F.lit(0).cast(_DEC))).alias("q1"),
               F.sum(isb.cast("long")).cast(_DEC).alias("n2"),
               F.sum(F.when(isb, v).otherwise(0).cast(_DEC))
               .alias("s2"),
               F.sum(F.when(isb, v.cast(_DEC) * v)
                     .otherwise(F.lit(0).cast(_DEC))).alias("q2")))
    d1 = _fdiv("(n1*q1 - s1*s1)*1000000", "n1*n1*(n1-1)")
    d2 = _fdiv("(n2*q2 - s2*s2)*1000000", "n2*n2*(n2-1)")
    staged = (gg.filter("n1 > 1 AND n2 > 1")
              .withColumn("d1", F.expr(d1))
              .withColumn("d2", F.expr(d2))
              .withColumn("ns", F.expr(_fdiv(
                  "(s1*n2 - s2*n1)*(s1*n2 - s2*n1)",
                  "(n1*n2)*(n1*n2)"))
                  * F.lit(1000000).cast(_DEC)))
    t2 = F.expr(
        "CAST(CASE WHEN d1 + d2 > 0 THEN "
        + _fdiv("ns*1000000", "d1+d2") + " END AS BIGINT)")
    nu_den = (_fdiv("d1*d1", "n1-1") + " + "
              + _fdiv("d2*d2", "n2-1"))
    nu = F.expr(
        "CAST(CASE WHEN d1 + d2 > 0 AND (" + nu_den + ") > 0 THEN "
        + _fdiv("(d1+d2)*(d1+d2)*1000", nu_den)
        + " END AS BIGINT)")
    return staged.select(
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        t2.alias("t2_ppm"), nu.alias("nu_milli"))


def hill_tail_index(df: DataFrame, value_col: str, id_col: str,
                    k: int = 200) -> DataFrame:
    """Hill estimator of the power-law tail index (Hill 1975): over
    the k largest values x₍₁₎ ≥ … ≥ x₍ₖ₎,

        1/alpha = (Σ_{i<k} ln x₍ᵢ₎)/(k−1) − ln x₍ₖ₎

    — the standard heavy-tail diagnostic (alpha ≲ 2 means infinite
    variance: plan for extreme skew; large alpha means a thin,
    well-behaved tail).  Values in exact cents; ln through
    :func:`~cubes_spark.llm.util.libm_ln` (JVM Math.log is 1 ulp off
    glibc on ~2% of inputs) and the log sum as a sequential fold over
    the rank-ordered array, so the oracle replays it bit-for-bit.

    Scale shape: the top-k comes from ``orderBy().limit()`` — Spark
    plans TakeOrderedAndProject (per-partition top-k heaps + one
    k-row merge), NEVER a global sort; everything after runs on the
    bounded k-row frame.
    """
    from cubes_spark.llm.util import libm_ln

    top = (df.filter(F.col(value_col).isNotNull())
           .select(_cents(value_col).alias("__x__"),
                   F.col(id_col).alias("__id__"))
           .filter(F.col("__x__") > 0)
           .orderBy(F.col("__x__").desc(), F.col("__id__").asc())
           .limit(k))
    from pyspark.sql.window import Window as W

    wr = W.orderBy(F.col("__x__").desc(), F.col("__id__").asc())
    ranked = (top.withColumn("__r__", F.row_number().over(wr))
              .select("__r__", "__x__",
                      libm_ln(F.col("__x__").cast("double"))
                      .alias("__lnx__")))
    arr = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_top"),
        F.min("__x__").cast("long").alias("x_k_cents"),
        F.array_sort(F.collect_list(F.struct("__r__", "__lnx__")))
        .alias("__a__"))
    out = (arr.withColumn(
        "__s__",
        F.expr("aggregate(transform(__a__, e -> e.__lnx__),"
               " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
        .withColumn("__lnxk__",
                    libm_ln(F.col("x_k_cents").cast("double"))))
    return (out.filter(F.col("n_top") > 1)
            .select(
                "n_top", "x_k_cents",
                F.expr("(__s__ - __lnxk__) / (n_top - 1) - __lnxk__")
                .alias("inv_alpha"),
                F.expr(
                    "CASE WHEN __s__ - __lnxk__"
                    " - (n_top - 1) * __lnxk__ <> 0.0"
                    " THEN (n_top - 1) / (__s__ - __lnxk__"
                    " - (n_top - 1) * __lnxk__) END")
                .alias("alpha")))
