"""Frequency sketches: count-min (Cormode & Muthukrishnan 2005).

The reference has no sketch support (its aggregate surface is
sum/count/min/max/avg/stddev/variance — SURVEY §2.4); Spark itself
exposes HLL (approx_count_distinct, driver-verified by
``agg_approx_distinct``) but no frequency sketch.  Count-min fills
the heavy-hitters gap: a (depth × width) grid of counters whose size
is FIXED regardless of key cardinality — the streaming/100 TB answer
to "top talkers" when a full groupBy of a billion distinct keys is
too big to hold or ship.

Scale shape: building the sketch is ``explode(depth hashes) →
groupBy(row, bucket) → count`` — one shuffle into depth×width cells,
map-side combinable, output size depth×width rows no matter the
input.  Point estimates are ``min`` over the value's depth cells —
never an underestimate, overestimate bounded by εN with
ε ≈ e/width at the standard depth ≈ ln(1/δ).

Hashes are the portable md5 hash, so a SQL oracle rebuilds the
identical grid and the estimates are integer-exact.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cubes_spark.llm.text import hash64

__all__ = ["countmin_sketch", "countmin_estimates",
           "bloom_build", "bloom_contains",
           "hll_rank_rows", "hll_registers", "hll_estimate",
           "histogram_quantiles",
    "quantiles_from_bucket_counts",
           "kmv_sketch", "kmv_estimate", "kmv_set_ops"]

#: 2^60 — the exclusive upper bound of the portable 60-bit hash space
_HASH_SPACE = 1 << 60


def _cell(value: Column, row: int, width: int) -> Column:
    return (hash64(F.concat(F.lit(f"cm{row}:"),
                            value.cast("string"))) % width).cast("int")


def countmin_sketch(df: DataFrame, col: str,
                    depth: int = 4, width: int = 256,
                    weight_col: Optional[str] = None,
                    window: Optional[str] = None,
                    ts_col: str = "ts",
                    watermark: str = "2 hours") -> DataFrame:
    """Build the count-min grid: ``(row, bucket, n)`` cells, at most
    ``depth × width`` rows.  ``weight_col`` aggregates a measure
    instead of row counts (weighted heavy hitters).

    With ``window`` (e.g. ``"1 day"``) the grid is built PER tumbling
    event-time window — ``(window_start, row, bucket, n)`` — and on a
    streaming frame it becomes a watermarked incremental aggregation:
    per-window sketch state is depth×width counters no matter how
    many distinct keys flow through, the fixed-size streaming
    heavy-hitters pattern."""
    value = F.col(col)
    src = df
    if window and src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    cells = src.select(
        *([F.window(F.col(ts_col), window).alias("__w0__")]
          if window else []),
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _cell(value, r, width).alias("bucket"))
            for r in range(depth)])).alias("__c__"),
        *( [F.col(weight_col).alias("__wt__")] if weight_col else []),
    )
    agg = (F.sum("__wt__") if weight_col else F.count(F.lit(1)))
    keys = (["__w0__"] if window else []) + ["row", "bucket"]
    out = (
        cells.select(*keys[:1] if window else [],
                     "__c__.row", "__c__.bucket",
                     *( ["__wt__"] if weight_col else []))
        .groupBy(*keys)
        .agg(agg.cast("long").alias("n"))
    )
    if window:
        out = out.select(
            F.col("__w0__.start").alias("window_start"),
            "row", "bucket", "n")
    return out


def countmin_estimates(sketch: DataFrame, values: DataFrame,
                       col: str, depth: int = 4,
                       width: int = 256) -> DataFrame:
    """Point-estimate each value in ``values[col]`` against a sketch
    built with the same (depth, width): joins the value's ``depth``
    cells (an equi-join on the grid — the sketch side is at most
    depth×width rows, broadcast-sized by construction) and takes the
    min.  Adds ``cm_estimate``; values whose cells never appeared
    estimate 0."""
    value = F.col(col)
    probes = values.select(
        *[F.col(c) for c in values.columns],
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _cell(value, r, width).alias("bucket"))
            for r in range(depth)])).alias("__c__"),
    ).select(*values.columns, "__c__.row", "__c__.bucket")
    cells = sketch.withColumnRenamed("n", "__cm_n__")
    joined = probes.join(F.broadcast(cells), ["row", "bucket"],
                         "left")
    return (
        joined.groupBy(*values.columns)
        .agg(F.min(F.coalesce(F.col("__cm_n__"), F.lit(0)))
             .cast("long").alias("cm_estimate"))
    )


def _bloom_positions(value: Column, num_hashes: int,
                     num_bits: int) -> list:
    return [
        (hash64(F.concat(F.lit(f"bl{i}:"),
                         value.cast("string"))) % num_bits)
        for i in range(num_hashes)
    ]


def bloom_build(df: DataFrame, col: str,
                num_bits: int = 4096,
                num_hashes: int = 5) -> DataFrame:
    """Bloom filter over a column, as ``(word, bits)`` rows of 32-bit
    words (``num_bits/32`` rows total) — the broadcastable membership
    summary for "have we seen this key" checks at corpus scale:
    incremental dedup against a reference set, benchmark-membership
    pre-filters, semi-join pruning before an expensive join.

    Building is one explode + groupBy(word) + bit_or — map-side
    combinable, output fixed at ``num_bits/32`` rows regardless of
    input.  32-bit words keep every mask positive in an int64, which
    both Spark and SQL oracles shift without overflow.  No false
    negatives ever; false-positive rate ≈ (1−e^(−kn/m))^k."""
    value = F.col(col)
    cells = df.select(F.explode(F.array(*[
        F.struct(
            (p / 32).cast("int").alias("word"),
            # pow(2, b) is exact for b<=31 and, unlike shiftleft,
            # takes a COLUMN shift amount
            F.pow(F.lit(2.0), (p % 32).cast("double"))
            .cast("long").alias("mask"),
        )
        for p in _bloom_positions(value, num_hashes, num_bits)
    ])).alias("__c__"))
    return (
        cells.select("__c__.word", "__c__.mask")
        .groupBy("word")
        .agg(F.bit_or("mask").cast("long").alias("bits"))
    )


def bloom_contains(bloom: DataFrame, probes: DataFrame, col: str,
                   num_bits: int = 4096,
                   num_hashes: int = 5,
                   out_col: str = "maybe_present") -> DataFrame:
    """Probe each value against a :func:`bloom_build` filter: adds
    ``out_col`` (true iff EVERY hash position's bit is set — possibly
    a false positive, never a false negative).  The filter side is at
    most ``num_bits/32`` rows and broadcasts; the probe side streams
    partition-parallel."""
    value = F.col(col)
    pos = probes.select(
        *[F.col(c) for c in probes.columns],
        F.explode(F.array(*[
            F.struct((p / 32).cast("int").alias("word"),
                     F.pow(F.lit(2.0), (p % 32).cast("double"))
                     .cast("long").alias("mask"))
            for p in _bloom_positions(value, num_hashes, num_bits)
        ])).alias("__c__"),
    ).select(*probes.columns, "__c__.word", "__c__.mask")
    words = bloom.withColumnRenamed("bits", "__bl_bits__")
    joined = pos.join(F.broadcast(words), "word", "left")
    hit = (F.coalesce(F.col("__bl_bits__"), F.lit(0))
           .bitwiseAND(F.col("mask")) != 0).cast("int")
    return (
        joined.groupBy(*probes.columns)
        .agg((F.sum(hit) == F.count(F.lit(1))).alias(out_col))
    )


def hll_rank_rows(df: DataFrame, col: str,
                  group_cols: Optional[list] = None,
                  m: int = 256, rank_bits: int = 40,
                  salt: str = "hll") -> DataFrame:
    """STATELESS per-row HLL staging: ``(group..., bucket, __rank__)``
    — the projection half of :func:`hll_registers` (md5-split bucket
    index + leading-1 rank, all integer arithmetic), exposed on its
    own so a STREAM can maintain a register cuboid: the rows are a
    narrow watermark-free projection, and the register state
    (max rank per bucket) is distributive — exactly
    ``maintain_aggregate``'s contract (streaming/stream.py), so
    ``maintain_aggregate(hll_rank_rows(stream), group_cols=[...,
    'bucket'], aggs={'register': ('max', '__rank__')})`` keeps an
    approx-distinct cuboid fresh per micro-batch, and merge-on-read
    max yields registers BIT-IDENTICAL to a batch sketch."""
    group_cols = list(group_cols or [])
    h = hash64(F.concat(F.lit(salt + ":"),
                        F.col(col).cast("string")))
    # stage the hash, then split with INTEGER `div`/`%` only — a
    # double `/` on a 60-bit hash would round above 2^53
    staged = df.select(*group_cols, h.alias("__h__"))
    bucket = (F.col("__h__") % m).cast("int")
    w = F.expr(f"(__h__ div {m}) % CAST({1 << rank_bits} AS BIGINT)")
    rank = F.when(w == 0, F.lit(rank_bits + 1)) \
        .otherwise(F.lit(rank_bits + 1) - F.length(F.bin(w)))
    return staged.select(*group_cols, bucket.alias("bucket"),
                         rank.cast("int").alias("__rank__"))


def hll_registers(df: DataFrame, col: str,
                  group_cols: Optional[list] = None,
                  m: int = 256, rank_bits: int = 40,
                  salt: str = "hll",
                  window: Optional[str] = None,
                  ts_col: str = "ts",
                  watermark: str = "2 hours") -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007) per group:
    ``(group..., bucket, register)`` with ``bucket`` in 0..m-1 and
    ``register`` = max leading-zero rank observed in that bucket.

    Distributed-sketch shape: ONE map-side-combinable ``max`` groupBy
    into m cells per group — registers are the mergeable state, so
    shards sketch independently and union by ``max`` (the 100 TB
    path: sketch per partition, merge m-sized states, never ship
    distinct keys).  The md5-derived hash splits into a bucket index
    (low ``log2 m`` bits) and a ``rank_bits``-bit window whose
    leading-1 position (1..rank_bits+1) is the rank — ALL integer
    arithmetic, so a SQL oracle rebuilds identical registers.
    """
    group_cols = list(group_cols or [])
    src = df
    if not window:
        ranked = hll_rank_rows(src, col, group_cols, m=m,
                               rank_bits=rank_bits, salt=salt)
        return (ranked.groupBy(*group_cols, "bucket")
                .agg(F.max("__rank__").cast("int").alias("register")))
    if src.isStreaming:
        # per-event-time-window registers over a watermarked stream:
        # state is m registers per open window no matter how many
        # distinct keys flow through — the streaming approx-distinct
        # pattern (mirrors countmin_sketch's windowed mode)
        src = src.withWatermark(ts_col, watermark)
    h = hash64(F.concat(F.lit(salt + ":"),
                        F.col(col).cast("string")))
    # stage the hash, then split with INTEGER `div`/`%` only — a
    # double `/` on a 60-bit hash would round above 2^53
    staged = src.select(
        *([F.window(F.col(ts_col), window).alias("__w0__")]
          if window else []),
        *group_cols, h.alias("__h__"))
    bucket = (F.col("__h__") % m).cast("int")
    w = F.expr(f"(__h__ div {m}) % CAST({1 << rank_bits} AS BIGINT)")
    # leading-1 position inside the rank window: bin() drops leading
    # zeros in both Spark and DuckDB, so rank = rank_bits+1 - bitlen
    rank = F.when(w == 0, F.lit(rank_bits + 1)) \
        .otherwise(F.lit(rank_bits + 1) - F.length(F.bin(w)))
    keys = (["__w0__"] if window else []) + group_cols + ["bucket"]
    out = (
        staged.select(*(["__w0__"] if window else []), *group_cols,
                      bucket.alias("bucket"),
                      rank.cast("int").alias("__rank__"))
        .groupBy(*keys)
        .agg(F.max("__rank__").cast("int").alias("register"))
    )
    if window:
        out = out.select(
            F.col("__w0__.start").alias("window_start"),
            *group_cols, "bucket", "register")
    return out


def hll_estimate(registers: DataFrame,
                 group_cols: Optional[list] = None,
                 m: int = 256, rank_bits: int = 40) -> DataFrame:
    """Raw HLL cardinality estimate per group from
    :func:`hll_registers` output: ``(group..., hll_est)``.

    Integer-exact evaluation: each register contributes
    ``2^(rank_bits+1-register)`` (an int64; absent buckets count as
    register 0), the harmonic sum S stays ≤ m·2^(rank_bits+1), and
    the estimate is ``alpha_m·m²·2^(rank_bits+1)/S`` computed with
    integer division (alpha in 1e-4 units) — no floats anywhere, so
    the SQL oracle reproduces the estimate bit-for-bit.  No
    small-range correction: intended for n ≳ 3m (use a bigger m or
    exact count_distinct below that).
    """
    group_cols = list(group_cols or [])
    alpha_e4 = int(round(10000 * 0.7213 / (1.0 + 1.079 / m)))
    unit = rank_bits + 1
    # absent buckets (register 0) contribute 2^unit each — added in
    # closed form, so the harmonic sum needs ONE aggregation of the
    # observed registers, no m-bucket spine join (which would also be
    # a self-join, illegal on fixed-attribute views like a streaming
    # memory sink)
    term = F.pow(F.lit(2.0),
                 (F.lit(unit) - F.col("register")).cast("double")) \
        .cast("long")
    s = registers.groupBy(*group_cols).agg(
        (F.sum(term)
         + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << unit))
        .cast("long").alias("__s__"))
    num = m * m * (1 << unit)
    # INTEGER division throughout — a double `/` would round above
    # 2^53 and diverge from the SQL oracle's exact `div`
    est = F.expr(f"(CAST({alpha_e4} AS BIGINT) "
                 f"* (CAST({num} AS BIGINT) div __s__)) div 10000")
    return s.select(*group_cols, est.cast("long").alias("hll_est"))


def histogram_quantiles(df: DataFrame, value_col: str,
                        qs_bp: Optional[list] = None,
                        width: int = 1,
                        group_cols: Optional[list] = None) -> DataFrame:
    """Mergeable fixed-width-histogram quantiles: bucket the (integer)
    value column into ``width``-sized bins, then read each requested
    quantile off the cumulative histogram.  Returns one row per group
    per quantile: ``(group..., q_bp, bucket, est_lo, est_hi, cum_count,
    total)`` where ``est_lo/est_hi`` bound the bucket CONTAINING the
    true rank-``ceil(q·N)`` value — the guarantee is exact by
    construction (resolution = ``width``), unlike probabilistic
    quantile sketches.

    Scale shape: the histogram is the mergeable state — ONE map-side-
    combinable groupBy of the facts into buckets; everything after
    (cumulative window, quantile pick) runs on bucket-count rows per
    group (grain, not facts).  All integer arithmetic (ranks compared
    as ``cum·10⁴ ≥ q_bp·total``), so a SQL oracle replays every row
    bit-for-bit.  Pre-scale non-integer values (e.g. money → cents)
    before calling.
    """
    from pyspark.sql import Window

    qs_bp = list(qs_bp or [2500, 5000, 7500, 9900])
    group_cols = list(group_cols or [])
    # FLOOR division (integer-exact): Spark's `div` truncates toward
    # zero, which would put -1 with width 2 into bucket 0 ([0, 1])
    # instead of bucket -1 ([-2, -1]) — caught by the hypothesis
    # bucket-containment property
    floor_div = (
        f"CASE WHEN CAST({value_col} AS BIGINT) >= 0 "
        f"THEN CAST({value_col} AS BIGINT) div {width} "
        f"ELSE -((-CAST({value_col} AS BIGINT) + {width} - 1) "
        f"div {width}) END")
    hist = (
        df.select(*group_cols,
                  F.expr(floor_div).alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("__n__"))
    )
    return quantiles_from_bucket_counts(hist, group_cols, qs_bp,
                                        width)


def quantiles_from_bucket_counts(hist: DataFrame, group_cols: list,
                                 qs_bp: list, width: int
                                 ) -> DataFrame:
    """Second phase of :func:`histogram_quantiles`, exposed so
    MERGED bucket counts from elsewhere — e.g. a replayed streaming
    per-window histogram — read their quantiles with the identical
    integer-exact walk.  ``hist`` must carry ``(group..., bucket,
    __n__)``; semantics and output schema match
    :func:`histogram_quantiles` exactly.
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(*group_cols) if group_cols
         else Window.partitionBy()).orderBy("bucket") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.withColumn("cum_count",
                          F.sum("__n__").over(w).cast("long"))
    totals = hist.groupBy(*group_cols).agg(
        F.sum("__n__").cast("long").alias("total"))
    cum = cum.join(totals, group_cols) if group_cols else \
        cum.crossJoin(totals)
    qdf = hist.sparkSession.createDataFrame(
        [(int(q),) for q in qs_bp], "q_bp long")
    # smallest bucket whose cumulative count reaches the rank —
    # min_by over the grain-sized cumulative histogram
    hit = cum.crossJoin(F.broadcast(qdf)).filter(
        F.col("cum_count") * 10000 >= F.col("q_bp") * F.col("total"))
    return (
        hit.groupBy(*group_cols, "q_bp")
        .agg(F.min("bucket").alias("bucket"),
             F.min_by("cum_count", "bucket").cast("long")
             .alias("cum_count"),
             F.min("total").alias("total"))
        .select(
            *group_cols, "q_bp", "bucket",
            (F.col("bucket") * width).alias("est_lo"),
            ((F.col("bucket") + 1) * width - 1).alias("est_hi"),
            "cum_count", "total")
    )

def kmv_sketch(df: DataFrame, col: str,
               group_cols: Optional[list] = None,
               k: int = 256, salt: str = "kmv",
               merge_buckets: int = 64) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002;
    Beyer et al. SIGMOD 2007): per group, the ``k`` smallest DISTINCT
    60-bit portable hashes of ``col``, as one ascending
    ``array<bigint>`` row — ``(group..., kmv)``.

    Unlike HLL registers (:func:`hll_registers`), a KMV synopsis
    supports SET OPERATIONS: union by merging arrays, intersection /
    Jaccard by counting shared hashes under the union threshold
    (:func:`kmv_set_ops`) — distinct counts of segment combinations
    without rescanning the facts.

    Scale shape (three bounded shuffles, no unbounded state):

    1. ``groupBy(group, hash)`` — map-side combine kills duplicate
       values inside each scan partition, so the shuffle carries
       distinct hashes only (the same unavoidable shuffle as an exact
       ``count_distinct``);
    2. bottom-k per ``(group, hash % merge_buckets)`` cell via a rank
       window — the bucket split bounds any one window partition to
       the cell's distinct count and spreads a giant group over
       ``merge_buckets`` reducers;
    3. final per-group merge of ≤ ``k × merge_buckets`` survivors
       into the sorted ``k``-prefix array.

    The hash is the md5-derived :func:`~cubes_spark.llm.text.hash64`
    — a SQL oracle rebuilds the identical array.
    """
    from pyspark.sql import Window

    group_cols = list(group_cols or [])
    h = hash64(F.concat(F.lit(salt + ":"),
                        F.col(col).cast("string")))
    distinct = (
        df.select(*group_cols, h.alias("__h__"))
        .groupBy(*group_cols, "__h__").agg(F.lit(1).alias("__one__"))
    )
    cell = (F.col("__h__") % merge_buckets).cast("int")
    w = Window.partitionBy(*group_cols, cell).orderBy("__h__")
    survivors = (
        distinct.withColumn("__r__", F.row_number().over(w))
        .filter(F.col("__r__") <= k)
    )
    return (
        survivors.groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_list("__h__")), 1, k)
             .alias("kmv"))
    )


def _kmv_estimate_expr(arr: str, k: int) -> Column:
    """Cardinality estimate from a KMV array: exact ``size`` when the
    sketch holds fewer than ``k`` hashes (it then holds ALL distinct
    hashes), else ``(k-1) · 2^60 div kth`` — computed in
    DECIMAL(38,0) so the 2^68-bit product never overflows and an
    integral-divide oracle (DuckDB HUGEINT ``//``) replays it
    bit-for-bit."""
    kth = F.element_at(F.col(arr), k)
    est = F.expr(
        f"CAST((CAST({k - 1} AS DECIMAL(38,0)) * "
        f"CAST({_HASH_SPACE} AS DECIMAL(38,0))) div "
        f"CAST(element_at({arr}, {k}) AS DECIMAL(38,0)) AS BIGINT)")
    return F.when(F.size(F.col(arr)) < k,
                  F.size(F.col(arr)).cast("long")) \
        .otherwise(est)


def kmv_estimate(sketch: DataFrame,
                 group_cols: Optional[list] = None,
                 k: int = 256) -> DataFrame:
    """Per-group distinct-count estimate ``(group..., kmv_est)`` from
    :func:`kmv_sketch` output.  Exact below ``k`` distinct; above,
    the unbiased KMV estimator ``(k-1)/θ`` with θ = kth smallest
    hash as a fraction of the hash space (σ ≈ 1/√(k-2)).  All
    integer/decimal arithmetic — SQL-oracle exact."""
    group_cols = list(group_cols or [])
    return sketch.select(
        *group_cols,
        _kmv_estimate_expr("kmv", k).alias("kmv_est"))


def kmv_set_ops(sketch: DataFrame, group_col: str,
                k: int = 256) -> DataFrame:
    """Pairwise set-operation estimates between every two groups of a
    :func:`kmv_sketch`: ``(group_a, group_b, union_est, inter_est,
    jaccard_bp)`` for ``group_a < group_b``.

    Theta-sketch-style combination (Beyer et al. 2007): the union
    synopsis is the ``k``-prefix of the merged hash arrays; with
    ``m = |merged|`` and θ its largest hash, ``union_est`` is the KMV
    estimate of the merged synopsis (exact when ``m < k``), ``c`` the
    number of merged hashes present in BOTH input sketches, and
    ``inter_est = c · union_est div m`` (Jaccard ``c/m`` in basis
    points).  Everything is array math over group-grain rows — the
    self-join is |groups|² sketch rows, never fact-sized — and
    integer-exact, so a SQL oracle replays every value.
    """
    a = sketch.select(F.col(group_col).alias("ga"),
                      F.col("kmv").alias("ka"))
    b = sketch.select(F.col(group_col).alias("gb"),
                      F.col("kmv").alias("kb"))
    pairs = a.join(b, F.col("ga") < F.col("gb"))
    merged = F.slice(F.array_sort(F.array_union("ka", "kb")), 1, k)
    joint = pairs.select(
        "ga", "gb", "ka", "kb", merged.alias("merged"))
    m = F.size("merged")
    c = F.size(F.array_intersect(
        "merged", F.array_intersect("ka", "kb")))
    union_est = _kmv_estimate_expr("merged", k)
    inter_est = F.expr(
        "CAST((CAST(__c__ AS DECIMAL(38,0)) * "
        "CAST(__u__ AS DECIMAL(38,0))) div "
        "CAST(__m__ AS DECIMAL(38,0)) AS BIGINT)")
    return (
        joint.select(
            F.col("ga").alias("group_a"), F.col("gb").alias("group_b"),
            m.cast("long").alias("__m__"), c.cast("long").alias("__c__"),
            union_est.alias("__u__"))
        .select(
            "group_a", "group_b",
            F.col("__u__").alias("union_est"),
            inter_est.alias("inter_est"),
            F.expr("(10000 * __c__) div __m__").alias("jaccard_bp"))
    )


def bitmap_distinct_rollup(df: DataFrame, group_col: str,
                           id_col: str, chunk_bits: int = 20,
                           all_label: str = "(all)") -> DataFrame:
    """EXACT distinct counting at two grains from one pass over the
    facts, via mergeable roaring-style bitmaps (the ClickHouse
    ``groupBitmap`` / Druid bitmap-index pattern): integer ids are
    chunked into ``2^chunk_bits``-wide ranges, each (group, chunk)
    builds a packed bit array with one Arrow-batched applyInPandas,
    and the GROUP rollup ORs chunk bitmaps across groups — so the
    global distinct count comes from the per-group bitmaps, never a
    second scan of the raw facts.

    Why it matters at 100 TB: ``count(distinct)`` at two grains
    normally costs two full shuffles of the fact table; here the
    facts shuffle once to the (group, chunk) grain — the heavy
    step — and the rollup merges KILOBYTE bitmaps (2^chunk_bits/8
    bytes each, dense ranges only), the same way a pre-aggregated
    bitmap index answers any slice's exact distinct by ORing
    segment bitmaps.  Unlike HLL/KMV this is exact; unlike
    collect_set it is bounded per task by the chunk width.

    Returns ``(group, n_distinct)`` with one extra ``all_label`` row
    for the across-groups rollup.  Ids must be non-negative.
    """
    import pandas as pd

    chunk_size = 1 << chunk_bits
    base = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(id_col).cast("long").alias("__id__"),
    ).filter(F.col("__id__").isNotNull())
    keyed = base.select(
        "g",
        F.expr(f"__id__ div {chunk_size}").alias("chunk"),
        (F.col("__id__") % chunk_size).alias("off"))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        bits = np.zeros(chunk_size, dtype=bool)
        bits[pdf["off"].to_numpy()] = True
        return pd.DataFrame({
            "g": [pdf["g"].iloc[0]],
            "chunk": [pdf["chunk"].iloc[0]],
            "bitmap": [np.packbits(bits).tobytes()],
            "n_bits": [int(bits.sum())],
        })

    chunked = keyed.groupBy("g", "chunk").applyInPandas(
        build, "g string, chunk long, bitmap binary, n_bits long")
    chunked = chunked.persist()
    per_group = (chunked.groupBy("g")
                 .agg(F.sum("n_bits").cast("long")
                      .alias("n_distinct")))

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        arrs = [np.frombuffer(b, dtype=np.uint8)
                for b in pdf["bitmap"]]
        merged = np.bitwise_or.reduce(arrs)
        n = int(np.unpackbits(merged).sum())
        return pd.DataFrame({"chunk": [pdf["chunk"].iloc[0]],
                             "n_bits": [n]})

    rolled = (chunked.groupBy("chunk")
              .applyInPandas(merge, "chunk long, n_bits long")
              .agg(F.sum("n_bits").cast("long").alias("n_distinct"))
              .select(F.lit(all_label).alias("g"), "n_distinct"))
    return (per_group.unionByName(rolled)
            .select(F.col("g").alias(group_col),
                    F.col("n_distinct")))


def frequent_items(df: DataFrame, col: str,
                   min_share_ppm: int = 10_000,
                   capacity: int = None) -> DataFrame:
    """EXACT frequent items above a global share threshold via the
    two-phase Misra–Gries pattern (Misra & Gries 1982; mergeability:
    Agarwal et al., PODS 2012): phase 1 runs a k-counter summary
    inside every partition (one Arrow ``mapInPandas`` stage, memory
    bounded by k regardless of the partition's distinct count) —
    since an MG summary under-counts by at most N_p/(k+1), any value
    with GLOBAL share ≥ threshold must survive in at least one
    partition, so the union of survivors is a complete candidate
    set.  Phase 2 recounts ONLY the candidates exactly (broadcast
    semi-join, then a map-side-combinable groupBy) and filters
    against the exact total.

    The result is therefore exact and partition-invariant — the
    sketch is only a pruning device.  This is the scale shape for
    "which values exceed 0.1% of 100 TB": the full-distinct groupBy
    never happens; only candidate rows (≤ k × partitions values)
    reach a shuffle.

    Returns ``(value, n, share_ppm)`` with ``share_ppm =
    10^6·n div N ≥ min_share_ppm``.
    """
    import pandas as pd

    if min_share_ppm <= 0:
        raise ValueError("min_share_ppm must be positive")
    k = capacity or (1_000_000 // min_share_ppm) + 2
    vals = (df.select(F.col(col).cast("string").alias("v"))
            .filter(F.col("v").isNotNull()))

    def summarize(batches):
        counts = {}
        for pdf in batches:
            for v, c in pdf["v"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > k:
                # batched MG merge: subtract the (k+1)-th largest
                # count from everyone, keep the survivors (> 0)
                m = sorted(counts.values(), reverse=True)[k]
                counts = {v: c - m for v, c in counts.items()
                          if c > m}
        yield pd.DataFrame({"v": list(counts.keys())})

    cand = vals.mapInPandas(summarize, "v string").distinct()
    total = vals.agg(F.count(F.lit(1)).cast("long").alias("__N__"))
    return (vals.join(F.broadcast(cand), "v")
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .crossJoin(F.broadcast(total))
            .withColumn("share_ppm",
                        F.expr("(1000000 * n) div __N__"))
            .filter(F.col("share_ppm") >= min_share_ppm)
            .select(F.col("v").alias("value"), "n", "share_ppm"))
