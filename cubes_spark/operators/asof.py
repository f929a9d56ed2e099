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
3. ``last(value, ignorenulls=True)`` over the unbounded-preceding
   window fills each left row with the most recent right values,
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

__all__ = ["asof_join"]


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

    r = right.select(
        *by,
        F.col(on).alias(matched_time),
        *([F.col(right_order).alias(order_carrier)]
          if right_order else []),
        *[F.col(c).alias(c + suffix) for c in right_values],
    ).withColumn("__asof_side", F.lit(0))
    l = left.withColumn("__asof_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    t = F.coalesce(F.col(on), F.col(matched_time))
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
    filled = u
    for c in carried:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = filled.filter(F.col("__asof_side") == 1)
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
