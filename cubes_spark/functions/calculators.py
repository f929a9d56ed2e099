"""Window post-calculators: sma/wma/sms/smstd/smvar/smrsd.

Parity: /root/reference/cubes/query/statutils.py — the reference
computes these client-side in Python, streaming over the drilldown
result (dispatch table 210-229, window machinery 96-205).  We compute
them *natively* inside the same Spark plan with Window functions —
identical semantics, no driver-side loop, scales with the cluster.

Semantics preserved (for oracle parity):

* Window is the last `window_size` values, per partition, in the
  result's natural order (expanding until full — fewer than N values
  still compute, statutils.py:196-205).
* Partition key: the split column if present, NOTHING else when the
  aggregate has `window_size` set (statutils.py:104-119 — drilldown
  keys partition only in the legacy `aggregation_units` path).
* Null source values are skipped, not counted (statutils.py:192-194):
  the reference deque holds the last N NON-NULL values, reaching
  further back past nulls.  Replayed exactly with a RANGE frame over
  a running non-null count: ``count(source) ROWS UNBOUNDED
  PRECEDING..CURRENT`` ranks each row by how many non-null values
  precede-or-include it; a ``RANGE BETWEEN N-1 PRECEDING AND CURRENT
  ROW`` frame on that rank is precisely the deque (null rows share
  the rank of the latest non-null value and contribute nothing to
  the frame aggregates).  A row before the first non-null value gets
  NO value (statutils.py:205 — ``len(values) > 0`` guard) → NULL.
* Roundings: sma→2, wma→4, sms→none, smstd→2, smvar→2, smrsd→4
  (statutils.py:54-94); n<2 variance is 0, mean≤0 relative stdev is 0.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

__all__ = [
    "CALCULATED_AGGREGATIONS",
    "available_calculators",
    "calculators_for_aggregates",
    "apply_window_calculators",
    "calculate_scalar",
]


def _wma_column(source: Column, w: WindowSpec) -> Column:
    """Weighted moving average, weights 1..n oldest→newest
    (parity: statutils.py:54-62)."""
    vals = F.collect_list(source).over(w)
    n = F.size(vals)
    weighted = F.aggregate(
        F.zip_with(
            vals,
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda v, i: v.cast("double") * i.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = (n * (n + F.lit(1))).cast("double") / F.lit(2.0)
    # empty frame (before the first non-null value) -> NULL, not 0/1
    # (parity: statutils.py:205 sets the target only when len > 0)
    return F.when(n > 0, F.round(weighted / denom, 4))


def _sma_column(source: Column, w: WindowSpec) -> Column:
    return F.round(F.avg(source).over(w), 2)


def _sms_column(source: Column, w: WindowSpec) -> Column:
    return F.sum(source).over(w)


def _window_var(source: Column, w: WindowSpec) -> Column:
    """Sample variance over the frame from exact windowed sums:
    ``(Σx² - (Σx)²/n) / (n-1)``.  With a decimal source the sums are
    exact, so the result is bit-reproducible at any parallelism (and
    matches a SQL oracle computing the same formula); n < 2 → 0
    (parity: statutils.py:73-82)."""
    s = F.sum(source).over(w).cast("double")
    s2 = F.sum(source * source).over(w).cast("double")
    n = F.count(source).over(w).cast("double")
    return (F.when(n < 1, F.lit(None).cast("double"))
            .when(n < 2, F.lit(0.0))
            .otherwise((s2 - s * s / n) / (n - F.lit(1.0))))


def _smstd_column(source: Column, w: WindowSpec) -> Column:
    return F.round(F.sqrt(_window_var(source, w)), 2)


def _smvar_column(source: Column, w: WindowSpec) -> Column:
    return F.round(_window_var(source, w), 2)


def _smrsd_column(source: Column, w: WindowSpec) -> Column:
    """sqrt(var)/mean, 0 when mean <= 0 (parity: statutils.py:84-86)."""
    mean = F.sum(source).over(w).cast("double") / \
        F.count(source).over(w).cast("double")
    std = F.sqrt(_window_var(source, w))
    # empty frame -> NULL mean -> NULL result (not the 0.0 sentinel,
    # which is only for a computed mean <= 0)
    return (F.when(mean > 0, F.round(std / mean, 4))
            .when(mean.isNotNull(), F.lit(0.0)))


def _zscore_column(source: Column, w: WindowSpec) -> Column:
    """Trailing z-score of the CURRENT value against its calculator
    frame: (x - frame mean) / frame sample std, rounded to 4 — the
    per-row anomaly signal over the same window machinery as the
    reference calculators (an extra, like ewma — no reference
    counterpart).  NULL when the frame std is 0 or undefined
    (constant or single-value frame): a 0-divide sentinel would be
    wrong data."""
    mean = F.sum(source).over(w).cast("double") / \
        F.count(source).over(w).cast("double")
    std = F.sqrt(_window_var(source, w))
    return F.when(
        std > 0,
        F.round((source.cast("double") - mean) / std, 4))


def _pctchange_column(source: Column, w: WindowSpec) -> Column:
    """Period-over-period relative change vs the previous row in the
    calculator order: (x - prev) / prev, rounded to 4; NULL for the
    first row and when prev is 0 (a 0-divide sentinel would be wrong
    data)."""
    prev = F.lag(source).over(w)
    return F.when(
        prev.isNotNull() & (prev != 0),
        F.round((source.cast("double") - prev.cast("double"))
                / prev.cast("double"), 4))


def _ewma_column(source: Column, w: WindowSpec) -> Column:
    """Exponentially weighted moving average, ``alpha = 1/2``,
    truncated to the frame and renormalized.

    For frame values v_1..v_n (oldest→newest) the weight of v_i is
    2^(i-1) and the normalizer is 2^n - 1 — exactly the EWMA recursion
    ``s_t = a·x_t + (1-a)·s_(t-1)`` restarted at the frame edge and
    scaled so the weights sum to 1.  Powers of two up to 2^52 are
    exact doubles, so the weighted sum is reproducible at any
    parallelism and replayable by a SQL oracle; rounded to 4 like wma.
    """
    vals = F.collect_list(source).over(w)
    n = F.size(vals)
    weighted = F.aggregate(
        F.zip_with(
            vals,
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda v, i: v.cast("double")
            * F.pow(F.lit(2.0), i.cast("double") - F.lit(1.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.pow(F.lit(2.0), n.cast("double")) - F.lit(1.0)
    return F.round(weighted / denom, 4)


def _rsum_column(source: Column, w: WindowSpec) -> Column:
    """Running (cumulative) sum over the whole preceding partition."""
    return F.sum(source).over(w)


def _ptot_column(source: Column, w: WindowSpec) -> Column:
    """Share of the partition total, rounded to 4 (percent-of-total /
    share-of-parent when the calculator partition is the parent
    drilldown level)."""
    total = F.sum(source).over(w).cast("double")
    return F.when(total != 0,
                  F.round(source.cast("double") / total, 4))         .otherwise(F.lit(0.0))


#: function name → Column builder (source, window_spec) -> Column
CALCULATED_AGGREGATIONS: Dict[str, Callable[[Column, WindowSpec], Column]] = {
    "wma": _wma_column,
    "sma": _sma_column,
    "sms": _sms_column,
    "smstd": _smstd_column,
    "smvar": _smvar_column,
    "smrsd": _smrsd_column,
    "ewma": _ewma_column,
    "rsum": _rsum_column,
    "ptot": _ptot_column,
    "pct_change": _pctchange_column,
    "zscore": _zscore_column,
}

#: frame overrides: running calculators ignore window_size and frame
#: from the partition start; share-of-total frames the WHOLE
#: partition; lag-based calculators take the UNFRAMED ordered window
#: (a rows-between frame is illegal around lag())
_UNBOUNDED_PRECEDING = {"rsum"}
_WHOLE_PARTITION = {"ptot"}
_UNFRAMED = {"pct_change"}

#: calculators whose formula squares the source (need p <= 18 decimals)
_VARIANCE_FAMILY = {"smstd", "smvar", "smrsd"}

#: the six reference calculators with deque semantics — framed as the
#: last N NON-NULL values (reaching back past nulls) via a RANGE frame
#: over a running non-null count (see module docstring).  Extras
#: (ewma) keep plain last-N-rows frames.
_REFERENCE_DEQUE = {"sma", "sms", "wma", "smstd", "smvar", "smrsd"}

CALCULATOR_LABELS = {
    "wma": "Weighted Moving Avg. of {measure}",
    "sma": "Simple Moving Avg. of {measure}",
    "sms": "Simple Moving Sum of {measure}",
    "smstd": "Moving Std. Deviation of {measure}",
    "smrsd": "Moving Relative St. Dev. of {measure}",
    "smvar": "Moving Variance of {measure}",
    "ewma": "Exp. Weighted Moving Avg. of {measure}",
    "rsum": "Running Total of {measure}",
    "zscore": "Trailing Z-Score of {measure}",
    "ptot": "Share of Total {measure}",
    "pct_change": "Period-over-Period Change of {measure}",
}


def register_calculator(name: str,
                        builder: Callable[[Column, WindowSpec], Column],
                        label: Optional[str] = None) -> None:
    """Register a window calculator programmatically (the in-process
    analog of a ``cubes_spark.calculator`` entry point)."""
    CALCULATED_AGGREGATIONS[name] = builder
    if label:
        CALCULATOR_LABELS[name] = label


_entry_points_loaded = False


def load_entry_point_calculators() -> None:
    """Merge ``cubes_spark.calculator`` entry points into the registry
    (parity: reference ext.py finder loading; idempotent).  Called
    lazily from every lookup path so an installed package's
    calculators work without an explicit import."""
    global _entry_points_loaded
    if _entry_points_loaded:
        return
    _entry_points_loaded = True
    from cubes_spark import ext

    for name in ext.calculator.names():
        if name not in CALCULATED_AGGREGATIONS:
            CALCULATED_AGGREGATIONS[name] = ext.calculator.factory(name)


def available_calculators() -> list:
    """Parity: statutils.py:231-233 (registry + entry points)."""
    load_entry_point_calculators()
    return list(CALCULATED_AGGREGATIONS.keys())


def calculators_for_aggregates(cube: Any, aggregates: Sequence,
                               drilldown: Any = None,
                               split: Any = None) -> list:
    """Return (aggregate, source_ref, function_name, window_size) specs
    for post-calculated aggregates (parity: statutils.py:19-52)."""
    load_entry_point_calculators()
    specs = []
    for aggregate in aggregates:
        if aggregate.function in CALCULATED_AGGREGATIONS:
            if not aggregate.measure:
                raise ValueError(
                    f"No measure specified for aggregate '{aggregate.name}'"
                )
            source = cube.aggregate(aggregate.measure)
            window_size = aggregate.window_size or 1
            specs.append((aggregate, source.ref, aggregate.function, window_size))
    return specs


def apply_window_calculators(
    df: DataFrame,
    specs: Sequence[Tuple[Any, str, str, int]],
    order_by: Sequence[Column],
    partition_by: Optional[Sequence[Column]] = None,
) -> DataFrame:
    """Add post-calculated aggregate columns to the drilldown result.

    `order_by` is the result's natural order; `partition_by` is the
    split column (and nothing else — see module docstring).
    """
    from pyspark.sql.types import DecimalType

    dtypes = {f.name: f.dataType for f in df.schema.fields}

    def _base_window() -> WindowSpec:
        if partition_by:
            return Window.partitionBy(*partition_by).orderBy(*order_by)
        return Window.orderBy(*order_by)

    # last-N-NON-NULL frames (the reference deque) need a helper rank
    # column — a running count of non-null source values — because a
    # window cannot order by another window expression in one select.
    # The rank counts the RAW (pre-narrowing) source: an overflow-
    # narrowed value is still a real value that occupies a deque slot
    # (and must advance the rank so the poison guard sees it inside
    # exactly the frames whose deque contained it), while rows sharing
    # a rank — the frame's PEERS, which a RANGE frame includes even
    # when they FOLLOW the current row — are then only genuine nulls,
    # which contribute nothing to any frame aggregate or flag sum.
    # One helper per source_ref; added before the calculator pass,
    # dropped after.
    helper_names: Dict[str, str] = {}
    helper_exprs: Dict[str, Column] = {}

    def _nn_rank(source_ref: str) -> Column:
        if source_ref not in helper_names:
            name = f"__nn_rank_{len(helper_names)}__"
            run = _base_window().rowsBetween(Window.unboundedPreceding, 0)
            helper_exprs[name] = F.count(F.col(f"`{source_ref}`")).over(run)
            helper_names[source_ref] = name
        return F.col(helper_names[source_ref])

    new_cols: Dict[str, Column] = {}
    for aggregate, source_ref, fname, window_size in specs:
        builder = CALCULATED_AGGREGATIONS[fname]
        source = F.col(f"`{source_ref}`")
        dtype = dtypes.get(source_ref)
        overflow = None
        if isinstance(dtype, DecimalType) and fname in _VARIANCE_FAMILY:
            # the variance formula squares the source, so exactness
            # demands p <= 18 ((18,s)² = (37,2s) fits decimal(38) in
            # Spark AND every 128-bit-decimal SQL engine).  Narrowing a
            # wider decimal could silently NULL values >= 10^(18-s),
            # which F.count would then SKIP — a silently WRONG variance.
            # Policy: narrow when it exactly fits; for sum-inflated
            # declareds (Spark's SUM adds exactly 10 digits of
            # headroom) narrow but POISON any frame that truly
            # overflows (NULL result, never a wrong number); for
            # genuinely wide types fall back to double (last-ulp
            # rounding instead of exactness — documented trade-off,
            # never data loss).  sma/sms/wma never narrow: their sums
            # are exact at native precision.
            scale = min(dtype.scale, 6)
            int_digits = dtype.precision - dtype.scale
            if int_digits + scale <= 18:
                source = source.cast(f"decimal(18,{scale})")
            elif int_digits + scale <= 30:
                # the shape of SUM over a <=(20,s) measure (Spark adds
                # exactly 10 digits of headroom): values usually fit
                # try_cast: NULL on overflow under ANSI and non-ANSI
                # alike — the poison guard below turns any affected
                # frame into a NULL result
                narrowed = source.try_cast(f"decimal(18,{scale})")
                overflow = F.when(
                    source.isNotNull() & narrowed.isNull(), F.lit(1)
                ).otherwise(F.lit(0))
                source = narrowed
            else:
                source = source.cast("double")
        if fname in _REFERENCE_DEQUE:
            # the deque frame: rows whose raw non-null rank is within
            # N-1 of the current row's (see helper comment above)
            rank = _nn_rank(source_ref)
            if partition_by:
                w = Window.partitionBy(*partition_by).orderBy(rank)
            else:
                w = Window.orderBy(rank)
            w = w.rangeBetween(-(window_size - 1), 0)
        else:
            w = _base_window()
            if fname in _UNFRAMED:
                pass  # lag() needs the plain ordered window
            elif fname in _UNBOUNDED_PRECEDING:
                w = w.rowsBetween(Window.unboundedPreceding, 0)
            elif fname in _WHOLE_PARTITION:
                w = w.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing)
            else:
                w = w.rowsBetween(-(window_size - 1), 0)
        col = builder(source, w)
        if overflow is not None:
            col = F.when(F.sum(overflow).over(w) > 0,
                         F.lit(None).cast("double")).otherwise(col)
        new_cols[aggregate.name] = col
    if not new_cols:
        return df
    if helper_exprs:
        df = df.withColumns(helper_exprs)
    df = df.withColumns(new_cols)
    return df.drop(*helper_exprs) if helper_exprs else df


def calculate_scalar(fname: str, values: List[float]) -> Optional[float]:
    """Apply a calculator to a plain list of values — used for the
    summary row, which the reference feeds through the same stream
    (parity: query/browser.py:169-173)."""
    import math

    values = [v for v in values if v is not None]
    if not values:
        return None
    n = len(values)
    if fname == "sma":
        return round(sum(float(v) for v in values) / n, 2)
    if fname == "sms":
        return sum(values)
    if fname == "wma":
        denom = n * (n + 1) / 2
        total = sum(float(v) * (i + 1) for i, v in enumerate(values))
        return round(total / denom, 4)
    if fname == "ewma":
        total = sum(float(v) * 2.0 ** i for i, v in enumerate(values))
        return round(total / (2.0 ** n - 1.0), 4)
    mean = sum(float(v) for v in values) / n
    var = 0.0
    if n >= 2:
        var = sum((float(v) - mean) ** 2 for v in values) / (n - 1)
    if fname == "smvar":
        return round(var, 2)
    if fname == "smstd":
        return round(math.sqrt(var), 2)
    if fname == "smrsd":
        return round(math.sqrt(var) / mean, 4) if mean > 0 else 0
    if fname == "rsum":
        # the running total over the whole stream IS the plain sum
        return sum(values)
    if fname == "ptot":
        # the total's share of itself
        return 1.0 if sum(float(v) for v in values) != 0 else 0.0
    if fname == "pct_change":
        # no meaningful single-row summary for a first-difference
        return None
    if fname == "zscore":
        # the last value's z-score against the whole stream; NULL for
        # constant/short streams, like the window form
        std = math.sqrt(var)
        if std > 0:
            return round((float(values[-1]) - mean) / std, 4)
        return None
    raise KeyError(fname)
