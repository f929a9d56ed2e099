"""Per-entry optimization profiler (rounds 14/15).

For each named entry: time the noop-sink execution (best-of-N, same
session config as bench.py), dump `.explain("formatted")` to
``plans/<round>/<name>_<tag>.txt``, and summarize where the time went
via the local UI REST API (per-stage executor run time, shuffle bytes,
python boundary nodes).

Usage:
  python tools/opt_profile.py [--tag before|after] [--reps 3]
         [--sf /root/testdata/sf0.1] entry [entry ...]

Interleaved A/B (round-15 addition, answering the r14 verdict's
"driver-host noise polluted the round's record"): time TWO code states
of the repo alternately (A B A B ...) inside ONE Spark session/JVM, so
session warmth, JIT state and host load hit both states equally.  The
alternate state is a plain checkout/worktree of the repo at the
comparison commit:

  git worktree add /tmp/ab_r13 <commit>
  python tools/opt_profile.py --interleave /tmp/ab_r13 --reps 3 entry...

Both states' modules are imported once each (module identity is kept
per state via sys.modules swapping) and their query builders run
against the same session.  Reports best-of per state plus the B/A
ratio; plan files are skipped in this mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("opt_profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.python.daemon.module", "cubes_spark.pydaemon")
        .config("spark.executorEnv.PYTHONPATH",
                os.pathsep.join(
                    [HERE] + ([os.environ["PYTHONPATH"]]
                              if os.environ.get("PYTHONPATH") else [])))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _ui(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return qe.explainString(mode)


class _CodeState:
    """One code state (repo checkout) for interleaved A/B.

    Query builders routinely import lazily AT CALL TIME (``from
    cubes_spark.llm import …`` inside the function), so merely holding
    a queries() dict is not enough — the state's module set must be
    ACTIVE in ``sys.modules`` (and its path first on ``sys.path``)
    while its queries build and run.  ``activate`` swaps the whole
    ``cubes_spark``/``__spark_entry__`` module family in;
    ``deactivate`` captures any newly-imported modules back into the
    state and removes them."""

    def __init__(self, label: str, path: str):
        self.label = label
        self.path = os.path.abspath(path)
        self.modules: dict = {}
        self.queries = None

    def activate(self):
        for m in list(sys.modules):
            if m == "__spark_entry__" or m.split(".")[0] == "cubes_spark":
                del sys.modules[m]
        sys.modules.update(self.modules)
        sys.path.insert(0, self.path)
        if self.queries is None:
            import __spark_entry__ as em
            self.queries = em.queries()

    def deactivate(self):
        sys.path.remove(self.path)
        for m in list(sys.modules):
            if m == "__spark_entry__" or m.split(".")[0] == "cubes_spark":
                self.modules[m] = sys.modules.pop(m)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plan", action="store_true",
                    help="skip writing plan files (timing only)")
    ap.add_argument("--stages", action="store_true",
                    help="print per-stage breakdown of the LAST rep")
    ap.add_argument("--plan-dir", default="r15",
                    help="subdirectory of plans/ for plan files")
    ap.add_argument("--interleave", metavar="ALT_PATH", default=None,
                    help="alternate code state (repo checkout path); "
                         "run A/B interleaved in one session")
    ap.add_argument("entries", nargs="+")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if args.interleave:
        states = [_CodeState("A(cwd)", HERE),
                  _CodeState("B(alt)", args.interleave)]
        queries = None
    else:
        import __spark_entry__ as entrymod
        queries = entrymod.queries()
        states = None

    plan_dir = os.path.join(HERE, "plans", args.plan_dir)
    os.makedirs(plan_dir, exist_ok=True)

    spark = build_session(cpus)
    # warm-up pass (same as bench light warm-up)
    for warm in ("agg_year", "preagg_year"):
        try:
            if states is not None:
                states[0].activate()
                try:
                    states[0].queries[warm](spark, args.sf) \
                        .write.format("noop").mode("overwrite").save()
                finally:
                    states[0].deactivate()
            else:
                queries[warm](spark, args.sf).write.format("noop") \
                    .mode("overwrite").save()
        except Exception:
            pass
        spark.catalog.clearCache()

    for name in args.entries:
        if states is not None:
            per = {s.label: [] for s in states}
            for rep in range(args.reps):
                for s in states:
                    s.activate()
                    try:
                        if name not in s.queries:
                            per[s.label].append(None)
                            continue
                        spark.sparkContext.setJobDescription(
                            f"{name} {s.label} rep{rep}")
                        t0 = time.perf_counter()
                        df = s.queries[name](spark, args.sf)
                        df.write.format("noop").mode("overwrite").save()
                        per[s.label].append(time.perf_counter() - t0)
                        spark.catalog.clearCache()
                    finally:
                        s.deactivate()
            spark.sparkContext.setJobDescription(None)
            va = [t for t in per[states[0].label] if t is not None]
            vb = [t for t in per[states[1].label] if t is not None]
            if not va or not vb:
                print(f"{name}: NOT FOUND in one state", file=sys.stderr)
                continue
            a, b = min(va), min(vb)
            print(f"{name}: A best={a:.3f}s B best={b:.3f}s "
                  f"B/A={b/a:.3f}")
            for s in states:
                print(f"    {s.label}: "
                      f"{[round(t, 3) for t in per[s.label] if t]}")
            continue
        fn = queries.get(name)
        if fn is None:
            print(f"{name}: NOT FOUND", file=sys.stderr)
            continue
        best, times = None, []
        stage_mark = None
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            if args.stages:
                stage_mark = max(
                    (s["stageId"] for s in _ui(spark, "/stages")), default=-1)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times.append(dt)
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

        if not args.no_plan:
            df = fn(spark, args.sf)
            plan = formatted_plan(df)
            path = os.path.join(plan_dir, f"{name}_{args.tag}.txt")
            with open(path, "w", encoding="utf-8") as f:
                f.write(plan)
            spark.catalog.clearCache()

        print(f"{name}: best={best:.3f}s reps={[round(t,3) for t in times]}")
        if args.stages and stage_mark is not None:
            stages = [s for s in _ui(spark, "/stages")
                      if s["stageId"] > stage_mark
                      and s["status"] == "COMPLETE"]
            stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
            for s in stages[:12]:
                print(f"    stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>4} "
                      f"run={s['executorRunTime']/1000:7.2f}s "
                      f"shufR={s.get('shuffleReadBytes',0)/1e6:8.1f}MB "
                      f"shufW={s.get('shuffleWriteBytes',0)/1e6:8.1f}MB  "
                      f"{(s.get('description') or s.get('name',''))[:70]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
