"""Scale sweep: time `__spark_entry__.queries()` entries at two
scale-factor directories and report the per-decade wall-clock ratio.

A correct-at-sf0.01 operator can still be wrong-at-scale (quadratic
candidate growth, one-partition windows, driver-side materialization)
— the ratio between sf0.1 and a 10x replica (tools/make_scale_data.py
-> /tmp/sf1) is the cheapest detector: a scalable plan grows ~linearly
(ratio ~<=10, modulo fixed overheads amortizing), a quadratic one
shows ~100x.

Usage:
    python tools/scale_sweep.py [--small DIR] [--big DIR] [query ...]

Defaults: small=/root/testdata/sf0.1, big=/tmp/sf1, queries=the OLAP
browser core (the LLM/events side was swept in round 6).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the OLAP browser core: star/snowflake joins, role-playing, top-k
#: with high-cardinality guard, rollup/cube/grouping-sets, pivot,
#: window calculators, pagination and the summary single-pass
OLAP_CORE = [
    "agg_year",
    "agg_summary",
    "agg_snowflake",
    "agg_roleplay",
    "topk_customers",
    "rollup_ym",
    "cube_flags",
    "grouping_sets",
    "crosstab",
    "calc_sma",
    "agg_order_page",
    "facts_page",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sf1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or OLAP_CORE

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = (
        SparkSession.builder.appName("scale_sweep")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    def run(name: str, sf_dir: str) -> float:
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        return best

    # warm-up on the small side
    for name in names[:2]:
        try:
            run(name, args.small)
        except Exception:
            pass

    print(f"{'query':24s} {'small':>8s} {'big':>8s} {'ratio':>7s}")
    worst = 0.0
    for name in names:
        if name not in queries:
            print(f"{name:24s}  MISSING")
            continue
        try:
            t_small = run(name, args.small)
            t_big = run(name, args.big)
        except Exception as exc:
            print(f"{name:24s}  FAILED: {exc}")
            worst = float("inf")
            continue
        ratio = t_big / t_small if t_small else float("inf")
        worst = max(worst, ratio)
        print(f"{name:24s} {t_small:8.2f} {t_big:8.2f} {ratio:6.1f}x")
    print(f"worst ratio: {worst:.1f}x per decade")
    return 0


if __name__ == "__main__":
    sys.exit(main())
