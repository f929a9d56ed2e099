"""As-of (nearest-event) joins.

The reference has no as-of operator (its join surface is the star
schema, ``/root/reference/cubes/sql/star.py``); this is a
beyond-parity operator for event streams: "for each left row, the
latest right row at-or-before it" (``backward``) or "the earliest
at-or-after" (``forward``) per entity.

Spark has no native ASOF JOIN either, and the naive formulation —
a range join + per-left-row argmax — explodes quadratically per
entity.  The scalable composition used here is **union + ordered
window**:

1. tag left/right rows and union them into one DataFrame,
2. one shuffle: partition by the ``by`` keys, order by (time, side,
   tie-break) within each partition,
3. ``last(struct, ignorenulls=True)`` over the unbounded-preceding
   window fills each left row with the most recent right row carried
   as ONE struct — atomic, so a NULL value inside the matched right
   row stays NULL rather than being back-filled from an older row,
4. drop the right carrier rows.

Cost is ONE hash shuffle of |left|+|right| rows and a linear
within-partition sort-scan — the same asymptotics as a sort-merge
join, no row multiplication at any skew.  Per-entity row counts
bound partition size; for pathological single-entity streams,
pre-split by coarse time bucket and as-of within the bucket
(carrying the previous bucket's tail), as in streaming sessionization
(streaming/stream.py).

Tie-breaks are deterministic: at equal timestamps the right row still
matches (at-or-before includes equality) and among equal right
timestamps the highest ``right_order`` value wins, so results are
reproducible at any parallelism and a SQL oracle can replay them
exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "peak_concurrency"]


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: Union[str, Sequence[str], None] = None,
              right_values: Optional[Sequence[str]] = None,
              right_order: Optional[str] = None,
              direction: str = "backward",
              tolerance_seconds: Optional[float] = None,
              suffix: str = "_right") -> DataFrame:
    """Enrich each ``left`` row with the nearest ``right`` row.

    Parameters
    ----------
    on: time column name, present in both sides.
    by: entity key column(s); the join never crosses entities.
    right_values: right columns to carry (default: all but on/by),
        each renamed with ``suffix``.
    right_order: extra right column breaking timestamp ties
        (highest wins for backward, lowest for forward); without it,
        equal-timestamp right rows resolve by their partition order.
    direction: ``backward`` (latest at-or-before, the default) or
        ``forward`` (earliest at-or-after).
    tolerance_seconds: maximum |left.on - right.on|; matches further
        away are nulled out (the row is kept — it is a left join).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, "
                         f"got '{direction}'")
    by = [by] if isinstance(by, str) else list(by or [])
    if right_values is None:
        skip = set(by) | {on}
        right_values = [c for c in right.columns if c not in skip]

    matched_time = "__asof_rtime" + suffix
    order_carrier = "__asof_rorder" + suffix
    packed = "__asof_pack" + suffix

    # The entire matched right row travels as ONE struct so the fill
    # is atomic: a right row whose value column is legitimately NULL
    # carries that NULL (the struct itself is non-null), instead of
    # the per-column last-non-null fill reaching back to an OLDER
    # right row and mixing attributes from different versions — the
    # SCD2 point-in-time hazard (olap.py:scd2_lookup).
    r = right.select(
        *by,
        *([F.col(right_order).alias(order_carrier)]
          if right_order else []),
        F.struct(
            F.col(on).alias(matched_time),
            *[F.col(c).alias(c + suffix) for c in right_values],
        ).alias(packed),
    ).withColumn("__asof_side", F.lit(0))
    l = left.withColumn("__asof_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    t = F.coalesce(F.col(on), F.col(packed)[matched_time])
    if direction == "backward":
        # right rows at the same instant sort BEFORE the left row
        # (at-or-before includes equality); later right rows win
        order = [t.asc(), F.col("__asof_side").asc()]
        if right_order:
            order.append(F.col(order_carrier).asc_nulls_first())
    else:
        order = [t.desc(), F.col("__asof_side").asc()]
        if right_order:
            order.append(F.col(order_carrier).desc_nulls_first())
    w = (Window.partitionBy(*by) if by else Window.partitionBy()) \
        .orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    carried = [matched_time] + [c + suffix for c in right_values]
    filled = u.withColumn(packed,
                          F.last(packed, ignorenulls=True).over(w))

    out = filled.filter(F.col("__asof_side") == 1)
    for c in carried:
        out = out.withColumn(c, F.col(packed)[c])
    out = out.drop(packed)
    if tolerance_seconds is not None:
        # integer-exact comparison for timestamps: a double-seconds
        # cast carries ~0.25µs rounding at current epochs, enough to
        # flip a gap that lands exactly ON the tolerance boundary
        # versus an oracle's integer date_diff
        if dict(out.dtypes).get(on, "").startswith("timestamp"):
            gap = F.abs(F.unix_micros(F.col(on))
                        - F.unix_micros(F.col(matched_time)))
            ok = gap <= F.lit(int(round(tolerance_seconds * 1_000_000)))
        else:
            gap = F.abs(
                F.col(on).cast("double")
                - F.col(matched_time).cast("double"))
            ok = gap <= F.lit(float(tolerance_seconds))
        for c in carried:
            out = out.withColumn(c, F.when(ok, F.col(c)))
    out = out.withColumnRenamed(matched_time, on + suffix)
    return out.drop("__asof_side",
                    *([order_carrier] if right_order else []))


def peak_concurrency(df: DataFrame, ts_col: str,
                     duration_seconds: int = 1800,
                     num_buckets: int = 256) -> DataFrame:
    """Sweep-line peak concurrency: each row opens an interval
    ``[ts, ts + duration)``; the answer is the maximum of the
    running (+1 at start, −1 at end) sum over the merged boundary
    timeline, with the EARLIEST attaining boundary — "the most
    sessions ever simultaneously active" of capacity planning.

    The running sum over one global timeline is the sequential trap;
    like the EDF statistics it distributes as a two-phase prefix sum
    over deterministic TIME buckets: per distinct boundary
    microsecond, net delta; per-bucket totals collected once
    (bounded driver rows), bucket-local cumulative windows finish
    the sweep.  Ends sort before starts at the same instant
    (half-open intervals — back-to-back sessions never double-count),
    which the delta-per-distinct-timestamp formulation gives for
    free.

    Returns one row: ``(n_intervals, peak, at_us)``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    us = F.unix_micros(F.col(ts_col))
    dur = int(duration_seconds) * 1_000_000
    pts = (df.select(us.alias("__t__"),
                     F.lit(1).alias("__d__"))
           .unionAll(df.select((us + dur).alias("__t__"),
                               F.lit(-1).alias("__d__"))))
    hist = pts.groupBy("__t__").agg(
        F.sum("__d__").alias("__nd__"),
        # Interval count must tally +1 starts BEFORE netting against
        # ends: a start coinciding with an end nets to 0 and would
        # otherwise vanish from the count (back-to-back sessions).
        F.sum(F.when(F.col("__d__") > 0, F.col("__d__"))
              .otherwise(0)).alias("__ns__"))
    bounds = hist.agg(F.min("__t__").alias("lo"),
                      F.max("__t__").alias("hi"),
                      F.sum("__ns__").alias("n")).first()
    spark = df.sparkSession
    if bounds["lo"] is None:
        return spark.createDataFrame(
            [], "n_intervals long, peak long, at_us long")
    lo, hi = bounds["lo"], bounds["hi"]
    width = max(1, -(-(hi - lo + 1) // num_buckets))
    hist = hist.withColumn(
        "__pid__",
        F.floor((F.col("__t__") - F.lit(lo)) / F.lit(width))
        .cast("int"))
    totals = (hist.groupBy("__pid__")
              .agg(F.sum("__nd__").alias("t")).collect())
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r["__pid__"]):
        offsets.append((row["__pid__"], acc))
        acc += row["t"] or 0
    off = F.broadcast(spark.createDataFrame(
        offsets, "__pid__ int, __off__ long"))
    local = (W.partitionBy("__pid__").orderBy("__t__")
             .rowsBetween(W.unboundedPreceding, 0))
    cum = (hist.join(off, "__pid__")
           .withColumn("__run__", F.col("__off__")
                       + F.sum("__nd__").over(local)))
    best = cum.agg(F.max(F.struct(
        F.col("__run__").alias("r"),
        (-F.col("__t__")).alias("nt"))).alias("m"))
    return best.select(
        F.lit(int(bounds["n"])).alias("n_intervals"),
        F.col("m.r").cast("long").alias("peak"),
        (-F.col("m.nt")).cast("long").alias("at_us"))
