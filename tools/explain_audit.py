"""Plan audit: executed-plan shape for every driver entry.

For each `__spark_entry__.queries()` entry, count the plan's exchanges
(shuffles), broadcast exchanges and Arrow/Python stages, and flag
anti-patterns (cartesian products, one-partition global windows).
Writes EXPLAIN_AUDIT.md — the per-operator evidence that the 100 TB
design claims in SCALE.md match the plans Catalyst actually produces.

Usage: python tools/explain_audit.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _exchange_counts(spark, df) -> tuple:
    """(shuffle, broadcast) exchanges that will actually EXECUTE.

    ``executedPlan().toString()`` re-prints a persisted frame's child
    plan once per InMemoryTableScan REFERENCE, so text counts
    overstate any persisted composition by the reference count (the
    r11 audit's "71 shuffles" for part_assortativity was 23 real).
    Walk the plan tree instead: stop at cache boundaries, count each
    distinct InMemoryRelation's child plan ONCE, skip ReusedExchange
    subtrees (they execute nothing)."""
    jvm = spark._jvm
    seen: set = set()
    tot = {"ex": 0, "bc": 0}

    def walk(node):
        cls = node.getClass().getSimpleName()
        if "ReusedExchange" in cls or "ReusedSubquery" in cls:
            return
        if cls.startswith("AdaptiveSparkPlan"):
            walk(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            # materialized AQE stage (Shuffle/BroadcastQueryStageExec):
            # the wrapped exchange + its subtree live in .plan(), not
            # children() — unwrap like AdaptiveSparkPlan above
            walk(node.plan())
            return
        if cls.startswith("InMemoryTableScan"):
            rel = node.relation()
            # key on the shared cacheBuilder: each scan node holds its
            # own InMemoryRelation COPY, but all references to one
            # persist() share a single CachedRDDBuilder
            key = jvm.System.identityHashCode(rel.cacheBuilder())
            if key not in seen:
                seen.add(key)
                walk(rel.cachedPlan())
            return
        if "BroadcastExchange" in cls:
            tot["bc"] += 1
        elif "Exchange" in cls:
            tot["ex"] += 1
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))
        # scalar/IN/EXISTS subquery plans are expression children, not
        # plan children — toString() printed them (old counts included
        # their exchanges), so the tree walk must visit them too
        subs = node.subqueries()
        for i in range(subs.size()):
            walk(subs.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return tot["ex"], tot["bc"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", sf_dir)

    import __spark_entry__ as entrymod
    from cubes_spark.sources.workspace import default_session

    spark = default_session("explain_audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            n_shuf, n_bc = _exchange_counts(spark, df)
        except Exception as exc:           # audit must cover the rest
            rows.append((name, None, None, None,
                         f"ERROR: {type(exc).__name__}: {exc}"[:120]))
            continue
        n_ex = n_shuf + n_bc
        n_py = (plan.count("ArrowEvalPython")
                + plan.count("MapInPandas")
                + plan.count("FlatMapGroupsInPandas")
                + plan.count("PythonUDF"))
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "SinglePartition" in plan and "Window" in plan:
            flags.append("GLOBAL-WINDOW")
        if "LocalTableScan" in plan and n_ex == 0 and n_py == 0:
            flags.append("materialized")
        rows.append((name, n_ex - n_bc, n_bc, n_py,
                     " ".join(flags) or "-"))
        print(f"{name}: shuffles={n_ex - n_bc} broadcasts={n_bc} "
              f"python={n_py} {flags or ''} [{time.time()-t0:.1f}s]",
              file=sys.stderr)

    out = [
        "# EXPLAIN_AUDIT — executed-plan shape per driver entry",
        "",
        f"Generated against `{sf_dir}`.  Exchanges are counted by a",
        "plan-tree walk that dedups persisted subplans on their shared",
        "cacheBuilder (r12 fix — `toString()` re-prints a cached child",
        "plan once per reference, overstating persisted compositions",
        "several-fold) and that also visits subquery plans and unwraps",
        "materialized AQE query stages (r13 fix — scalar/IN subqueries",
        "are expression children, so their exchanges were silently",
        "missed by a children()-only walk).  *shuffles* = non-broadcast",
        "exchanges; *python* = Arrow/Pandas stages (the designated",
        "decode/ingest escape hatches); `materialized` = the entry",
        "executes eagerly (streaming replay, formatter round-trip,",
        "protocol materialization) and returns a local result, so the",
        "audited plan is the residual scan.  Flags: CARTESIAN would be",
        "a scale bug (none expected).  GLOBAL-WINDOW marks a",
        "single-partition window — for the `calc_*` post-calculators",
        "and the recall bridges this is over the GRAIN-SIZED drilldown",
        "/ bridge result (dozens of rows, documented in SCALE.md),",
        "never over fact-sized data.",
        "",
        "| entry | shuffles | broadcasts | python stages | flags |",
        "|---|---|---|---|---|",
    ]
    for name, ex, bc, py, flags in rows:
        if ex is None:
            out.append(f"| {name} | — | — | — | {flags} |")
        else:
            out.append(f"| {name} | {ex} | {bc} | {py} | {flags} |")
    cart = [r[0] for r in rows if r[4] and "CARTESIAN" in r[4]]
    total = len(entrymod.queries())
    out.append("")
    out.append(f"{len(rows)} entries audited; cartesian products: "
               f"{cart or 'none'}.")
    if not only:
        # round-end gate: the committed audit must cover EVERY
        # declared entry — a new entry without an audit row is a bug
        assert len(rows) == total, (
            f"audit covers {len(rows)} of {total} queries() entries")
        out.append(f"Coverage: {len(rows)}/{total} queries() entries "
                   "(asserted at generation time).")
    if only:
        # a filtered run is a spot check: print, never overwrite the
        # committed full-audit artifact with a subset
        print("\n".join(out))
        print(f"(filtered run: {len(rows)} entries, "
              "EXPLAIN_AUDIT.md left untouched)")
        return 0
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EXPLAIN_AUDIT.md")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path} ({len(rows)} entries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
