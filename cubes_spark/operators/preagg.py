"""Pre-aggregation aware query rewriting.

The reference can only *materialize* the full-grain cuboid
(/root/reference/cubes/sql/store.py:549-628) — browsing it again
requires pointing a new cube at the table by hand.  Here materialized
cuboids are first-class: register one with the browser
(``browser.materialize_cuboid`` / ``browser.add_cuboid``) and any
aggregation whose grain, cell and aggregates it covers is transparently
rewritten to scan the (small) cuboid instead of the fact star.

At 100 TB this is the difference between re-scanning the fact table and
reading a few thousand pre-aggregated rows: a day-grain cuboid of a
100 TB fact is typically 4-6 orders of magnitude smaller, and month/
year/summary queries re-aggregate it in milliseconds.

Rewrite rules (correctness first — anything not provably equivalent
falls back to the fact star):

* requested drilldown attributes and cell attributes must all exist in
  the cuboid grain;
* if the requested grain EQUALS the cuboid grain, any stored aggregate
  is served as-is (cell filters only remove whole groups);
* if the requested grain is COARSER, distributive aggregates
  re-aggregate: sum→sum, count→sum, count_nonempty→sum, min→min,
  max→max;
* ALGEBRAIC ``avg`` re-aggregates from stored partials when the cuboid
  also stores a ``sum`` and a ``count_nonempty`` of the SAME measure
  and the stored sum is decimal (exact partials):
  ``sum(sums)/sum(counts)`` is then bit-identical to the engine's
  decimal-exact direct avg (functions/aggregates.py ``_exact_avg``).
* ALGEBRAIC ``variance``/``stddev`` (and ``avg``) re-aggregate from
  partials RECORDED AT MATERIALIZATION: when the materialized aggregate
  list contains an avg/variance/stddev of a decimal measure,
  :meth:`Cuboid.materialize` additionally stores hidden
  (sum, count[, sum-of-squares]) partial columns in the same single
  aggregation pass and records them on the descriptor.  Variance is
  then served at ANY coarser grain as
  ``(Σs2 − (Σs1)²/Σn)/(Σn − 1)`` — the same formula over the same
  exact decimal sums as the direct path
  (functions/aggregates.py ``variance_from_sums``), hence
  bit-identical.  Gate: the measure must be decimal with scale ≤ 6
  (the ``_exact_var`` condition); otherwise the direct computation is
  itself order-dependent floating point and no partial set can
  reproduce it — those fall back to the fact star, as does
  double-measure avg.
* EXACT ``count_distinct`` at coarser grains is served from a
  COMPANION DISTINCT-KEY TABLE written at materialization (the
  distinct ``(grain..., key)`` set — the only state from which a
  distinct count re-aggregates exactly, by set union).  The companion
  is ≤ the deduplicated key volume, far below the fact table; the
  rewrite joins its coarser-grain count into the main cuboid result.
  Approximate alternatives live in :class:`HLLCuboid` and are
  deliberately NOT part of this transparent (exactness-preserving)
  rewrite.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

from pyspark.sql import functions as F

__all__ = ["Cuboid", "StreamAggregateCuboid", "HLLCuboid",
           "REAGGREGABLE", "reaggregation_column", "cuboid_sizes",
           "greedy_cuboid_selection", "advise_cuboids",
           "auto_materialize", "auto_maintain"]

#: aggregate function → re-aggregation over partial states
REAGGREGABLE = {
    "sum": F.sum,
    "count": F.sum,
    "count_nonempty": F.sum,
    "min": F.min,
    "max": F.max,
}

SAFE_SEP = "__"


def _safe(ref: str) -> str:
    return ref.replace(".", SAFE_SEP)


def reaggregation_column(aggregate: Any, exact_grain: bool):
    """Column expression re-aggregating a stored partial state."""
    col = F.col(f"`{aggregate.name}`")
    if exact_grain:
        # one cuboid row per output group — any aggregate passes through
        return F.first(col).alias(aggregate.name)
    return REAGGREGABLE[aggregate.function](col).alias(aggregate.name)


class Cuboid:
    """Descriptor of a materialized aggregate at a fixed grain.

    ``column_dtypes`` (stored column name → Spark dtype string, as
    recorded at materialization) gates the algebraic avg-from-partials
    rewrite: it fires only when the stored sum partial is decimal, the
    condition under which re-aggregated partials are bit-identical to
    the direct computation.  Without it (hand-built descriptors) avg
    conservatively falls back to the fact star."""

    def __init__(self, path: str, attribute_refs: Sequence[str],
                 aggregates: Sequence[Any],
                 column_dtypes: Optional[dict] = None,
                 rows: Optional[int] = None,
                 partials: Optional[dict] = None,
                 distinct_tables: Optional[dict] = None) -> None:
        self.path = path
        self.attribute_refs = list(attribute_refs)
        self.aggregates = {a.name: a for a in aggregates}
        self.column_dtypes = dict(column_dtypes or {})
        #: row count recorded at materialization (parquet metadata
        #: count — no data scan); lets the browser prefer the SMALLEST
        #: covering cuboid when several match
        self.rows = rows
        #: aggregate name → ("avg", sum, count) |
        #: ("variance"|"stddev", sum, count, sumsq) partial column
        #: names recorded (and exactness-gated) at materialization
        self.partials = dict(partials or {})
        #: count_distinct aggregate name → companion parquet path of
        #: the DISTINCT (grain..., __key__) table written at
        #: materialization — serves the aggregate EXACTLY at any
        #: coarser grain (distinct-set union), where per-grain exact
        #: counts cannot re-aggregate
        self.distinct_tables = dict(distinct_tables or {})

    def partials_for(self, aggregate: Any) -> Optional[tuple]:
        """Stored-partial recipe serving ``aggregate`` exactly at ANY
        coarser grain: ``("avg", sum_name, count_name)`` or
        ``("variance"|"stddev", sum_name, count_name, sumsq_name)``,
        else None.  Materialization-recorded partials (already
        exactness-gated at build time) win; an avg can also be derived
        from model-stored sum + count_nonempty aggregates of the same
        measure when their stored sum is decimal."""
        recorded = self.partials.get(getattr(aggregate, "name", None))
        if recorded is not None:
            return tuple(recorded)
        if getattr(aggregate, "function", None) != "avg" \
                or not getattr(aggregate, "measure", None):
            return None
        sum_name = count_name = None
        for stored in self.aggregates.values():
            if stored.measure != aggregate.measure:
                continue
            if stored.function == "sum":
                sum_name = stored.name
            elif stored.function == "count_nonempty":
                count_name = stored.name
        if not sum_name or not count_name:
            return None
        # exactness gate: decimal partial sums merge exactly; double
        # partials would differ from the direct avg in the last ulp
        if not self.column_dtypes.get(sum_name, "").startswith("decimal"):
            return None
        return "avg", sum_name, count_name

    @classmethod
    def materialize(cls, browser: Any, path: str, drilldown: Any,
                    aggregates: Optional[Sequence[str]] = None,
                    mode: str = "overwrite") -> "Cuboid":
        """Write the cuboid parquet (logical refs stored with ``__`` for
        dots) and return its descriptor.

        When the aggregate list contains an avg/variance/stddev of a
        measure, hidden ``(sum, count[, sum-of-squares])`` partial
        columns are computed IN THE SAME aggregation pass and recorded
        on the descriptor (``self.partials``) — that is what lets the
        rewriter serve those algebraic aggregates at coarser grains.
        Partials that fail the exactness gate (non-decimal measure, or
        scale > 6 for variance — the ``_exact_var`` condition) are
        dropped before the write and not recorded: the direct
        computation is order-dependent floating point there, so a
        coarse-grain reconstruction could not match it bit-for-bit."""
        from cubes_spark.functions.aggregates import _decimal_scale
        from cubes_spark.functions.calculators import (
            CALCULATED_AGGREGATIONS,
        )
        from cubes_spark.metadata.attributes import MeasureAggregate
        from cubes_spark.query.drilldown import Drilldown

        dd = Drilldown(drilldown, browser.prepare_cell(None))
        prepared = [
            a for a in browser.prepare_aggregates(aggregates)
            if a.function not in CALCULATED_AGGREGATIONS
        ]

        # -- partial requests: one (sum, count[, sumsq]) set per measure
        # with an algebraic aggregate, reusing model-stored sum/count
        # aggregates of the same measure when already in the list
        algebraic = [a for a in prepared
                     if a.function in ("avg", "variance", "stddev")
                     and a.measure]
        sums = {a.measure: a.name for a in prepared
                if a.function == "sum" and a.measure}
        counts = {a.measure: a.name for a in prepared
                  if a.function == "count_nonempty" and a.measure}
        sumsqs: dict = {}
        synthetic: List[Any] = []
        owned: set = set()
        for m in sorted({a.measure for a in algebraic}):
            if m not in sums:
                name = f"__psum__{m}"
                synthetic.append(MeasureAggregate(
                    name=name, function="sum", measure=m))
                sums[m] = name
                owned.add(name)
            if m not in counts:
                name = f"__pcount__{m}"
                synthetic.append(MeasureAggregate(
                    name=name, function="count_nonempty", measure=m))
                counts[m] = name
                owned.add(name)
        for m in sorted({a.measure for a in algebraic
                         if a.function in ("variance", "stddev")}):
            name = f"__psumsq__{m}"
            # squared at native decimal precision — the exact expression
            # the direct path sums (functions/aggregates.py _exact_var)
            synthetic.append(MeasureAggregate(
                name=name, expression=f"sum({m} * {m})"))
            sumsqs[m] = name
            owned.add(name)

        df, _, _ = browser._aggregation_plan(
            browser.prepare_cell(None), prepared + synthetic, dd, None)
        safe = df.select(
            *[F.col(f"`{c}`").alias(_safe(c)) for c in df.columns]
        )
        dtypes = {c: t for c, t in safe.dtypes}

        # -- exactness gate per algebraic aggregate; keep only partial
        # columns a gated recipe references
        partials: dict = {}
        keep: set = set()
        for a in algebraic:
            s, c = sums[a.measure], counts[a.measure]
            s_dtype = dtypes.get(_safe(s), "")
            if a.function == "avg":
                if not s_dtype.startswith("decimal"):
                    continue
                partials[a.name] = ("avg", s, c)
            else:
                q = sumsqs[a.measure]
                ps = _decimal_scale(s_dtype)  # sum preserves the scale
                if not ps or ps[1] > 6 \
                        or not dtypes.get(_safe(q), "").startswith(
                            "decimal"):
                    continue
                partials[a.name] = (a.function, s, c, q)
                keep.add(q)
            keep.add(s)
            keep.add(c)
        drop = owned - keep
        if drop:
            safe = safe.drop(*[_safe(n) for n in drop])
            dtypes = {c: t for c, t in safe.dtypes}

        safe.write.mode(mode).parquet(path)
        refs = [a.ref for a in dd.all_attributes]
        spark = df.sparkSession

        # -- companion DISTINCT tables for count_distinct aggregates:
        # the distinct (grain, key) set is the only state from which a
        # count_distinct re-aggregates EXACTLY at coarser grains
        # (distinct-set union); one extra star pass per measure, the
        # table is <= the deduplicated key volume — far below facts
        distinct_tables: dict = {}
        for a in prepared:
            if a.function != "count_distinct" or not a.measure:
                continue
            sub = f"{path}__distinct__{a.name}"
            context = browser.aggregation_context(
                set(refs) | {a.measure})
            proj = context.star.select(
                *[context.column(r).alias(_safe(r)) for r in refs],
                context.column(a.measure).alias("__key__"))
            proj.distinct().write.mode(mode).parquet(sub)
            distinct_tables[a.name] = sub

        # metadata-only count over the written files (row-group stats)
        rows = spark.read.parquet(path).count()
        recorded = [a.name for a in prepared] + sorted(
            n for n in owned - drop)
        return cls(path, refs, prepared,
                   column_dtypes={n: dtypes[_safe(n)] for n in recorded
                                  if _safe(n) in dtypes},
                   rows=rows, partials=partials,
                   distinct_tables=distinct_tables)

    def covers(self, attribute_refs: Sequence[str],
               aggregates: Sequence[Any],
               requested_grain_refs: Sequence[str],
               allow_partials: bool = True) -> bool:
        """Can this cuboid serve a query touching ``attribute_refs``
        (drilldown + cell attributes) with ``aggregates``?

        ``allow_partials=False`` disables the algebraic avg
        reconstruction (the browser passes this under
        ``coalesce_measures``, where avg ≠ sum/count_nonempty)."""
        if not set(attribute_refs) <= set(self.attribute_refs):
            return False
        exact = set(requested_grain_refs) == set(self.attribute_refs)

        def reconstructable(agg: Any) -> bool:
            if not allow_partials:
                return False
            if self.partials_for(agg) is not None:
                return True
            # exact coarser-grain count_distinct via the companion
            # distinct-key table written at materialization
            return getattr(agg, "function", None) == "count_distinct" \
                and agg.name in self.distinct_tables

        for agg in aggregates:
            stored = self.aggregates.get(agg.name)
            if stored is None:
                # not materialized itself — servable only if exact
                # partials reconstruct it (algebraic avg)
                if not reconstructable(agg):
                    return False
                continue
            if not exact and agg.function not in REAGGREGABLE \
                    and not reconstructable(agg):
                return False
        return True

    def is_exact(self, requested_grain_refs: Sequence[str]) -> bool:
        return set(requested_grain_refs) == set(self.attribute_refs)

    def load(self, spark: Any):
        """The cuboid table with SAFE column names (no dots)."""
        return spark.read.parquet(self.path)


class StreamAggregateCuboid(Cuboid):
    """A browser-servable cuboid over a STREAM-MAINTAINED partial log
    (streaming/stream.py ``maintain_aggregate``): the r13 seam closed —
    the same rewriter that serves batch-materialized parquet cuboids
    now serves a cuboid a stream keeps fresh, transparently.

    ``load()`` is the merge-on-read of ``read_aggregate``: one scan of
    the (tiny) per-batch partial log, re-aggregated to the cuboid
    grain and renamed to the browser's safe column names — after which
    every inherited rewrite rule applies unchanged (coarser-grain
    distributive rollup, smallest-covering pick, and the algebraic
    avg-from-partials path, since ``maintain_aggregate`` partials are
    distributive by construction and decimal sums stay decimal through
    the merge).  Each ``load()`` re-lists the log, so batches appended
    AFTER registration are visible to the next query; ``rows`` (the
    smallest-cuboid preference key) is the registration-time grain
    count.

    Scale: the browser-facing cost is O(partial log) = O(batches ×
    grain), never O(stream); ``compact_aggregate`` folds the log back
    to O(grain) as batches accumulate.
    """

    def __init__(self, path: str, attribute_refs: Sequence[str],
                 grain_cols: Sequence[str], aggregates: Sequence[Any],
                 aggs: dict, column_dtypes: Optional[dict] = None,
                 rows: Optional[int] = None) -> None:
        super().__init__(path, attribute_refs, aggregates,
                         column_dtypes=column_dtypes, rows=rows)
        self.grain_cols = list(grain_cols)
        self.aggs = dict(aggs)

    @classmethod
    def from_log(cls, browser: Any, path: str, aggs: dict,
                 column_map: dict) -> "StreamAggregateCuboid":
        """Descriptor over an existing ``maintain_aggregate`` log.

        ``aggs`` is the maintenance spec (output name → ``(function,
        column)``); each name must be a cube aggregate whose model
        function matches the maintained one — that is what guarantees
        the stored partial means what the browser will serve.
        ``column_map`` maps each logical attribute ref of the cuboid
        grain to its column name in the log.
        """
        from cubes_spark.errors import ArgumentError

        refs = list(column_map)
        grain_cols = [column_map[r] for r in refs]
        prepared = browser.prepare_aggregates(list(aggs))
        by_name = {a.name: a for a in prepared}
        for name, (fn, _col) in aggs.items():
            model_fn = getattr(by_name.get(name), "function", None)
            if model_fn != fn:
                raise ArgumentError(
                    f"Maintained aggregate '{name}' is '{fn}' but the "
                    f"cube model declares '{model_fn}' — the stored "
                    "partial would not mean what the browser serves")
        spark = browser.star_schema.fact_df.sparkSession
        merged = cls._merged(spark, path, aggs)
        missing = [c for c in grain_cols if c not in merged.columns]
        if missing:
            raise ArgumentError(
                f"Grain column(s) {missing} not in the partial log at "
                f"{path} (log grain: "
                f"{[c for c in merged.columns if c not in aggs]})")
        dtypes = dict(merged.dtypes)
        return cls(path, refs, grain_cols,
                   [by_name[n] for n in aggs],
                   aggs,
                   column_dtypes={n: dtypes[n] for n in aggs
                                  if n in dtypes},
                   rows=merged.count())

    @staticmethod
    def _merged(spark: Any, path: str, aggs: dict):
        from cubes_spark.streaming.stream import read_aggregate

        return read_aggregate(spark, path, aggs)

    def load(self, spark: Any):
        """Merge-on-read of the partial log, renamed to safe columns."""
        df = self._merged(spark, self.path, self.aggs)
        cols = [F.col(f"`{c}`").alias(_safe(ref))
                for ref, c in zip(self.attribute_refs, self.grain_cols)]
        cols += [F.col(f"`{n}`") for n in self.aggs]
        return df.select(*cols)


class HLLCuboid:
    """Materialized DISTINCT-COUNT sketch cuboid: HyperLogLog
    registers stored at a fixed grain, servable at ANY coarser grain
    without rescanning the fact star — the classic Druid/BigQuery
    materialized-sketch capability the exact cuboids cannot provide
    (count_distinct is not re-aggregable from per-grain exact counts).

    Registers are LOSSLESSLY max-mergeable: max-merging the stored
    per-grain registers to a coarser grain yields register-for-
    register the same state as sketching the raw rows at that grain,
    so the served estimate is BIT-IDENTICAL to a direct
    ``hll_registers``+``hll_estimate`` over the facts (both are pure
    integer arithmetic — functions/sketches.py).  This is an APPROX
    estimate by contract; it is deliberately NOT wired into the
    browser's transparent rewrite, which must never change the
    semantics of an exact ``count_distinct``.

    Storage: ``(grain..., bucket, register)`` long-format parquet —
    grain × m rows (a 100 TB fact's day-grain sketch cuboid is a few
    MB).  Rollup cost is one map-side-combinable max-groupBy over
    that table; the fact is never touched.
    """

    def __init__(self, path: str, attribute_refs: Sequence[str],
                 measure: str, m: int = 256, rank_bits: int = 40,
                 salt: str = "hll") -> None:
        self.path = path
        self.attribute_refs = list(attribute_refs)
        self.measure = measure
        self.m = m
        self.rank_bits = rank_bits
        self.salt = salt

    @classmethod
    def materialize(cls, browser: Any, path: str, drilldown: Any,
                    measure: str, m: int = 256, rank_bits: int = 40,
                    salt: str = "hll",
                    mode: str = "overwrite") -> "HLLCuboid":
        """ONE sketch pass over the fact star: project the grain
        attributes + measure, build per-(grain, bucket) max-rank
        registers (map-side combinable), write the register table."""
        from cubes_spark.functions.sketches import hll_registers
        from cubes_spark.query.drilldown import Drilldown

        dd = Drilldown(drilldown, browser.prepare_cell(None))
        refs = [a.ref for a in dd.all_attributes]
        context = browser.aggregation_context(set(refs) | {measure})
        projected = context.star.select(
            *[context.column(r).alias(_safe(r)) for r in refs],
            context.column(measure).alias("__m__"))
        regs = hll_registers(projected, "__m__",
                             group_cols=[_safe(r) for r in refs],
                             m=m, rank_bits=rank_bits, salt=salt)
        regs.write.mode(mode).parquet(path)
        return cls(path, refs, measure, m=m, rank_bits=rank_bits,
                   salt=salt)

    def covers(self, keep_refs: Sequence[str]) -> bool:
        return set(keep_refs) <= set(self.attribute_refs)

    def registers(self, spark: Any,
                  keep_refs: Sequence[str]):
        """Registers max-merged to the coarser ``keep_refs`` grain —
        identical to sketching the raw facts at that grain."""
        from cubes_spark.errors import ArgumentError

        if not self.covers(keep_refs):
            raise ArgumentError(
                f"HLL cuboid at grain {self.attribute_refs} cannot "
                f"serve {list(keep_refs)}")
        keep = [_safe(r) for r in keep_refs]
        df = spark.read.parquet(self.path)
        return (df.groupBy(*keep, "bucket")
                .agg(F.max("register").cast("int").alias("register")))

    def rollup(self, spark: Any, keep_refs: Sequence[str]):
        """Distinct-count estimate at any coarser grain:
        ``(keep_refs..., hll_est)`` — one scan of the register table,
        integer-exact estimate (oracle-replayable)."""
        from cubes_spark.functions.sketches import hll_estimate

        return hll_estimate(
            self.registers(spark, keep_refs),
            group_cols=[_safe(r) for r in keep_refs],
            m=self.m, rank_bits=self.rank_bits)


def cuboid_sizes(df: Any, dims: Sequence[str]) -> Any:
    """Exact row counts of ALL ``2^d`` cuboids of ``dims`` in ONE
    aggregation pass: ``(grouping_id, n_dims, size)`` where
    ``grouping_id`` bit ``i`` (from the LEFT, Spark/ANSI convention)
    is 1 when ``dims[i]`` is rolled away.

    The trick: ``cube(dims).count()`` emits each cuboid's groups as
    rows tagged by GROUPING_ID, so the size of every cuboid is a
    second tiny count over the cube result — one shuffle, map-side
    combinable, no per-cuboid jobs.  Map-side the cube multiplies
    each input row ×2^d, so keep ``d`` small (≤ ~8) or pre-aggregate
    to the base grain first; at very high d, estimate with
    :func:`~cubes_spark.functions.sketches.hll_registers` per cuboid
    instead.
    """
    dims = list(dims)
    cube = (
        df.cube(*dims)
        .agg(F.grouping_id(*dims).alias("grouping_id"))
        .select("grouping_id")
    )
    return (
        cube.groupBy("grouping_id")
        .agg(F.count(F.lit(1)).cast("long").alias("size"))
        .select(
            "grouping_id",
            (F.lit(len(dims))
             - F.bit_count(F.col("grouping_id")).cast("int"))
            .alias("n_dims"),
            "size")
    )


def greedy_cuboid_selection(sizes: dict, n_picks: int,
                            n_dims: int) -> list:
    """Greedy materialized-view selection (Harinarayan, Rajaraman &
    Ullman, SIGMOD 1996): given exact (or estimated) cuboid sizes —
    ``{grouping_id: rows}`` over the ``2^n_dims`` lattice — pick the
    ``n_picks`` cuboids (beyond the base) whose materialization
    maximizes the total row-scan saving, assuming every cuboid is
    queried equally often.

    Benefit of candidate ``c`` given the selected set ``S``: for each
    cuboid ``d`` answerable from ``c`` (``d``'s kept-dims ⊆ ``c``'s),
    the saving is ``cost_S(d) − size(c)`` when positive, where
    ``cost_S(d)`` is the smallest selected ancestor's size.  The HRU
    theorem guarantees ≥ (1−1/e) of the optimal saving.  Pure driver
    arithmetic over ``2^d`` numbers — the expensive part is
    :func:`cuboid_sizes`, one distributed pass.

    Returns the picked grouping_ids in pick order.  Deterministic
    tie-break: (benefit desc, size asc, grouping_id asc).
    """
    base = 0  # all dims kept
    selected = {base}
    picks = []
    ids = sorted(sizes)

    def answerable(d: int, c: int) -> bool:
        # d's kept-dims subset of c's kept-dims: c's rolled-away bits
        # must all be rolled away in d too
        return (d & c) == c

    def cost(d: int) -> int:
        return min(sizes[a] for a in selected if answerable(d, a))

    for _ in range(n_picks):
        best = None
        for c in ids:
            if c in selected:
                continue
            benefit = sum(
                max(cost(d) - sizes[c], 0)
                for d in ids if answerable(d, c))
            key = (-benefit, sizes[c], c)
            if best is None or key < best[0]:
                best = (key, c)
        if best is None or -best[0][0] <= 0:
            break
        selected.add(best[1])
        picks.append(best[1])
    return picks


def advise_cuboids(browser: Any, drilldowns: Sequence[str],
                   aggregates: Optional[Sequence[str]] = None,
                   n_picks: int = 2) -> list:
    """The ADVISOR half of :func:`auto_materialize`: size the full
    cuboid lattice over ``drilldowns`` in ONE pass
    (:func:`cuboid_sizes`) and greedy-pick the ``n_picks`` most
    valuable cuboids under the HRU benefit model
    (:func:`greedy_cuboid_selection`).

    Returns ``[(grouping_id, kept_drilldowns), ...]`` in pick order,
    grand-total pick excluded — ready for batch materialization
    (:func:`auto_materialize`) or streaming maintenance
    (:func:`auto_maintain`).
    """
    from cubes_spark.query.drilldown import Drilldown

    dims = list(drilldowns)
    dd = Drilldown(dims, browser.prepare_cell(None))
    refs = [a.ref for a in dd.all_attributes]
    if len(refs) != len(dims):
        from cubes_spark.errors import ArgumentError
        raise ArgumentError(
            "advise_cuboids needs single-attribute drilldowns (one "
            "lattice dimension per ref); a hierarchical drilldown "
            f"expanded to {len(refs)} attributes for {len(dims)} "
            "dimensions — drill each level separately instead")
    grain = browser.aggregation_dataframe(
        drilldown=dims, aggregates=aggregates)
    # logical refs contain dots — alias to SAFE names before the cube
    # pass (a dotted identifier parses as a struct field there)
    safe_refs = [_safe(ref) for ref in refs]
    sizes = {
        r["grouping_id"]: r["size"]
        for r in cuboid_sizes(
            grain.select(*[F.col(f"`{ref}`").alias(_safe(ref))
                           for ref in refs]),
            safe_refs).collect()
    }
    picks = greedy_cuboid_selection(sizes, n_picks, len(refs))
    out = []
    for gid in picks:
        kept = [dims[i] for i in range(len(dims))
                if not (gid >> (len(dims) - 1 - i)) & 1]
        if not kept:
            continue  # the grand total is not a useful cuboid
        out.append((gid, kept))
    return out


def auto_materialize(browser: Any, base_path: str,
                     drilldowns: Sequence[str],
                     aggregates: Optional[Sequence[str]] = None,
                     n_picks: int = 2) -> list:
    """END-TO-END materialized-view advisor: size the full cuboid
    lattice over ``drilldowns`` in ONE pass (:func:`cuboid_sizes`),
    greedy-pick the ``n_picks`` most valuable cuboids under the HRU
    benefit model (:func:`greedy_cuboid_selection`), materialize each
    at its grain and REGISTER it with the browser — after which the
    rewriter serves covered aggregations from the picks transparently
    (smallest first).

    ``drilldowns`` are single-attribute drilldown refs (one lattice
    dimension each); a pick with grouping_id bit ``i`` set ROLLS AWAY
    ``drilldowns[i]``.  The all-rolled-away pick (grand total) is
    excluded — the summary is one row off any cuboid.  Returns the
    registered :class:`Cuboid` descriptors in pick order.

    Scale: sizing is one ``cube()`` pass over the projected grain
    columns (keep the dimension count small, ≤ ~8 — map-side the cube
    multiplies rows by 2^d); each materialization is one aggregation
    write; everything else is driver arithmetic over 2^d numbers.
    """
    built = []
    for gid, kept in advise_cuboids(browser, drilldowns, aggregates,
                                    n_picks):
        cuboid = browser.materialize_cuboid(
            f"{base_path}/cuboid_{gid}", drilldown=kept,
            aggregates=aggregates)
        built.append(cuboid)
    return built


def auto_maintain(browser: Any, stream_df: Any, base_path: str,
                  drilldowns: Sequence[str], aggs: dict,
                  column_map: dict,
                  aggregates: Optional[Sequence[str]] = None,
                  n_picks: int = 2,
                  checkpoint_root: Optional[str] = None) -> list:
    """The full advisor → maintain → rewrite loop (r14 capstone):
    HRU-pick the most valuable cuboids from BATCH history
    (:func:`advise_cuboids` — one ``cube()`` sizing pass over the
    fact star), then keep each pick fresh FROM THE STREAM
    (streaming/stream.py :func:`maintain_aggregate`, one partial log
    per pick) and register it with the browser
    (:class:`StreamAggregateCuboid`) — covered aggregations are served
    from the maintained logs transparently from that point on.

    ``aggs`` is the maintenance spec shared by every pick (model
    aggregate name → ``(function, stream column)``, distributive
    only); ``column_map`` maps each drilldown's logical attribute ref
    to its stream-side column.  Each pick gets its own checkpoint
    under ``checkpoint_root`` (temp dirs when None) — pass a
    persistent root in production so later runs RESUME instead of
    replaying (see ``maintain_aggregate``'s idempotency contract).

    Returns the registered descriptors in pick order.  Scale: one
    sizing pass + one map-side-combinable groupBy per (pick × batch);
    query cost is O(smallest covering log), never O(stream).
    """
    import os

    from cubes_spark.query.drilldown import Drilldown
    from cubes_spark.streaming.stream import maintain_aggregate

    built = []
    for gid, kept in advise_cuboids(browser, drilldowns, aggregates,
                                    n_picks):
        dd = Drilldown(kept, browser.prepare_cell(None))
        refs = [a.ref for a in dd.all_attributes]
        sub_map = {ref: column_map[ref] for ref in refs}
        log = f"{base_path}/stream_cuboid_{gid}"
        ckpt = None if checkpoint_root is None else os.path.join(
            checkpoint_root, f"ckpt_{gid}")
        maintain_aggregate(stream_df, log,
                           [sub_map[ref] for ref in refs], aggs,
                           query_name=f"auto_maintain_{gid}",
                           checkpoint=ckpt)
        built.append(browser.register_stream_cuboid(
            log, aggs, sub_map))
    return built
