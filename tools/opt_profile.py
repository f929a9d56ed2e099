"""Per-entry optimization profiler (round 14).

For each named entry: time the noop-sink execution (best-of-N, same
session config as bench.py), dump `.explain("formatted")` to
``plans/r14/<name>_<tag>.txt``, and summarize where the time went via
the local UI REST API (per-stage executor run time, shuffle bytes,
python boundary nodes).

Usage:
  python tools/opt_profile.py [--tag before|after] [--reps 3]
         [--sf /root/testdata/sf0.1] entry [entry ...]
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
    ap.add_argument("entries", nargs="+")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    import __spark_entry__ as entrymod
    queries = entrymod.queries()

    plan_dir = os.path.join(HERE, "plans", "r14")
    os.makedirs(plan_dir, exist_ok=True)

    spark = build_session(cpus)
    # warm-up pass (same as bench light warm-up)
    for warm in ("agg_year", "preagg_year"):
        try:
            queries[warm](spark, args.sf).write.format("noop") \
                .mode("overwrite").save()
        except Exception:
            pass
        spark.catalog.clearCache()

    for name in args.entries:
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
