"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

The FINAL stdout line is ONE compact JSON object:
``{"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {headline: sec, ...}, "sf": ..., "queries_n": N,
   "geomean_vs_baseline": r, "regressions": {...}, "full": path}``
sized to survive a tail-capture of ~2000 characters (the driver
records only the tail of stdout — BENCH_r12 was unparseable because
the full 318-entry timing dict overflowed it).  The COMPLETE
per-query timing dict is written to ``BENCH_FULL.json`` next to this
script and referenced by the ``full`` key.

Each query is forced end-to-end with a noop sink (full execution, no
driver-side result transfer), timed wall-clock after a shared session
warm-up, best-of-3.  Robustness against transient host noise (the
r12 story: 26 false >2x flags from a hypervisor-steal episode):

* the SparkSession is restarted every ~100 measured entries so JVM
  aging (GC heap growth, code-cache pressure) can't drift the tail
  of a 318-entry run;
* any entry landing >1.4x its committed baseline is RE-RUN
  (best-of-3 again) in a fresh session at the end, up to two retry
  rounds, and the minimum across all runs is recorded — a transient
  stall window can't flag unchanged code, while a genuine plan
  regression reproduces in every session and stays flagged.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: benchmark set: one per engine pillar (star agg, snowflake join,
#: role-playing join, window calculators, rollup, events, text stats,
#: MinHash dedup, SimHash dedup, ANN) plus the heavy LLM-pipeline
#: flagships (span dedup, decontamination, sequence packing, BPE,
#: duplicate clustering, sessionization, WARC ingest) — names match
#: __spark_entry__.
BENCH_QUERIES = [
    "agg_year",
    "preagg_year",
    "agg_point_cut",
    "agg_snowflake",
    "agg_roleplay",
    "topk_customers",
    "calc_sma",
    "rollup_ym",
    "crosstab",
    "events_hourly",
    "doc_text_stats",
    "doc_minhash",
    "doc_simhash",
    "emb_topk",
    "emb_ann",
    "doc_span_docs",
    "doc_decontam",
    "doc_pack",
    "doc_bpe_encode",
    "doc_dup_clusters",
    "events_sessions_native",
    "doc_warc_pipeline",
    # codec + curation flagships (tracked since round 7)
    "doc_jpeg_roundtrip",
    "doc_video_pipeline",
    "events_funnel",
    "emb_semdedup_greedy",
    "doc_line_dedup",
    "emb_pq",
    "fuzzy_names",
    # second-wave operators (tracked since round 8): set-similarity
    # join, TWAP, hierarchy flattening, SCD2, as-of join, bucketed
    # join — each had scale sweeps but no regression tripwire
    "doc_ssjoin",
    "events_twap",
    "parent_child",
    "events_scd2",
    "events_asof",
    "bucketed_join",
    # round-8 operators: sketches, affinity, chunk dedup, triangles
    "lineitem_hll",
    "basket_pairs",
    "doc_cdc_dedup",
    "part_triangles",
    "orders_quantiles",
    "orders_kmv",
    "orders_psample",
    "lineitem_zorder",
    "cuboid_greedy",
    "part_links",
    "dq_orders",
    # round-8 late waves: segmentation/attribution/graph/time-series
    # plus the new sketch + frequent-items scale patterns
    "rfm_customers",
    "events_attribution",
    "doc_hits",
    "lineitem_hilbert",
    "events_holt",
    "events_bitmap",
    "doc_rake",
    "events_semiadd",
    "events_acf",
    "doc_freq_tokens",
    "events_burstiness",
    "orders_benford",
    "part_ra",
    # round-9 statistics + retrieval operators
    "orders_ks",
    "orders_emd",
    "orders_mwu",
    "lineitem_spearman",
    "doc_postings",
    "doc_textrank",
    "events_km",
    "events_drawdown",
    "events_concurrency",
    "orders_skyline",
    "doc_vocab_growth",
    # TPC-H-shaped benchmark parity
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q7",
    "tpch_q10",
    "tpch_q13",
    "tpch_q18",
    "tpch_q22",
    "tpch_q6",
    "tpch_q8",
    "tpch_q14",
    "events_mase",
    "doc_rrf",
    # round-10 TPC-H: correlated subqueries, anti/semi chains,
    # disjunctive pushdown
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    # round-10 OLAP time-intelligence / hierarchy shapes
    "orders_yoy",
    "nation_share",
    "topn_customers_nation",
    # round-10 post-close statistics / retrieval additions
    "orders_kruskal",
    "orders_bootstrap",
    "emb_mmr",
    "events_binseg",
    "orders_hill",
    "part_assortativity",
    # round-11: previously-unbenched family representatives (k-sample
    # ANOVA, QQ, window-parity distribution, ratio CI, Zipf rank) and
    # the round-11 additions (deque-null calculators, MMR-over-ANN
    # scale path, TPC-H Q4/Q12)
    "orders_anova",
    "orders_qq",
    "window_dist",
    "lineitem_ratio_ci",
    "doc_zipf",
    "calc_nulls",
    "emb_mmr_ann",
    "tpch_q4",
    "tpch_q12",
    # round-11 continuation: bridge/SCD2 OLAP shapes, stream-static
    # join, C4 cleaning, ANN hard-negative mining, EXIF triage
    "bridge_campaign",
    "scd2_pit",
    "events_stream_enrich",
    "doc_c4_filter",
    "doc_gopher",
    "emb_hard_negatives",
    "doc_exif",
    "doc_urls",
    "orders_melt",
    "doc_rag_topk",
    "doc_keep_best",
    "doc_id3",
    "doc_line_dedup_intra",
    "lineitem_wquantiles",
    "doc_cluster_terms",
    "orders_coverage",
    "customer_upsert",
    "doc_shard_bytes",
    "calc_zscore",
    "doc_fertility",
    "events_new_users",
]


#: headline subset printed inline in the final compact stdout line
#: (the complete timing dict lives in BENCH_FULL.json) — the engine
#: pillars from the top of BENCH_QUERIES
HEADLINE_N = 28

#: restart the SparkSession after this many measured entries so a
#: 318-entry run doesn't accumulate JVM aging into its tail
RESTART_EVERY = 100

#: re-run threshold: anything landing above this vs baseline gets a
#: fresh-session retry (the flag threshold proper stays 1.5)
RETRY_RATIO = 1.4


def _build_session(cpus: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("cubes_spark_bench")
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
        # preload numpy/pandas/pyarrow in the worker daemon so forked
        # Python workers inherit them (COW) instead of importing per
        # worker (~0.5 s each) — engine config, not a timing change
        .config("spark.python.daemon.module", "cubes_spark.pydaemon")
        .config("spark.executorEnv.PYTHONPATH",
                os.pathsep.join(
                    [os.path.dirname(os.path.abspath(__file__))]
                    + ([os.environ["PYTHONPATH"]]
                       if os.environ.get("PYTHONPATH") else [])))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warm(spark, queries, sf_dir, names) -> None:
    """One un-timed pass so measured runs see parquet footers in page
    cache and tiered-up JIT, not compile time."""
    for warm in names:
        fn = queries.get(warm)
        if fn is None:
            continue
        try:
            fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        except Exception as exc:  # a broken query must not kill the run
            print(f"  warm-up {warm} failed: {exc}", file=sys.stderr)
        spark.catalog.clearCache()


def _time_query(spark, fn, sf_dir, reps: int = 3):
    """(best_sec, error) — best of ``reps`` noop-sink executions."""
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:
            spark.catalog.clearCache()
            return None, f"{type(exc).__name__}: {exc}"[:300]
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        # drop caches persisted inside operators (LSH signature
        # tables) so runs are measured independently
        spark.catalog.clearCache()
    return best, None


def compact_line(timings: dict, total: float, sf_val, geomean,
                 regressions: dict, errors: dict,
                 max_len: int = 1900) -> str:
    """The FINAL stdout line: compact, driver-parseable (the driver's
    tail capture keeps ~2000 chars, so the line must stay under
    ``max_len`` no matter how many entries regressed or broke).
    Headline queries inline; the complete dict lives in
    BENCH_FULL.json.  Regressions capped worst-first, errors capped
    and truncated; if still too long, regressions shed in batches —
    ``regressions_n``/``errors_n`` always carry the true counts."""
    head = {n: timings.get(n) for n in BENCH_QUERIES[:HEADLINE_N]}
    out = {
        "metric": "total_query_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": head,
        "sf": sf_val,
        "queries_n": len(timings),
        "geomean_vs_baseline": geomean,
        "regressions_n": len(regressions),
        "errors_n": len(errors),
        "full": "BENCH_FULL.json",
    }
    worst = sorted(regressions.items(), key=lambda kv: -kv[1])
    out["regressions"] = dict(worst[:25])
    if errors:
        out["errors"] = {k: str(v)[:80]
                         for k, v in list(errors.items())[:5]}
    line = json.dumps(out)
    while len(line) > max_len and out["regressions"]:
        out["regressions"] = dict(
            list(out["regressions"].items())[:-5])
        line = json.dumps(out)
    while len(line) > max_len and out.get("errors"):
        out["errors"] = dict(list(out["errors"].items())[:-1])
        line = json.dumps(out)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    here = os.path.dirname(os.path.abspath(__file__))

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # FULL coverage: every queries() entry is benched — the curated
    # BENCH_QUERIES list leads (stable output ordering for
    # round-over-round diffs), then every remaining entry in
    # queries() order.  A new entry therefore gets a regression
    # tripwire the round it lands, without a manual list edit.
    curated = set(BENCH_QUERIES)
    bench_names = list(BENCH_QUERIES) + [
        n for n in queries if n not in curated]

    full_warm = ("agg_year", "preagg_year", "doc_minhash", "doc_simhash",
                 "emb_ann")
    light_warm = ("agg_year", "preagg_year")

    spark = _build_session(cpus)
    _warm(spark, queries, sf_dir, full_warm)

    # failure isolation: one broken query yields one null timing (and an
    # "errors" entry), never a dead run — a bench that aborts loses
    # every other measurement for the round
    timings: dict = {}
    errors: dict = {}
    measured = 0
    for name in bench_names:
        fn = queries.get(name)
        if fn is None:
            # a renamed/removed entry must cost ONE timing, not the run
            timings[name] = None
            errors[name] = "not in __spark_entry__.queries()"
            print(f"  {name}: MISSING from queries()", file=sys.stderr)
            continue
        if measured and measured % RESTART_EVERY == 0:
            spark.stop()
            spark = _build_session(cpus)
            _warm(spark, queries, sf_dir, light_warm)
        # best of 3: suppress scheduler/GC/JIT noise so round-over-round
        # comparisons reflect plan changes, not jitter (observed spread
        # on a shared host is >2x between reps of the same plan)
        best, failed = _time_query(spark, fn, sf_dir)
        measured += 1
        if failed is not None:
            timings[name] = None
            errors[name] = failed
            print(f"  {name}: FAILED ({failed})", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"  [{measured}/{len(bench_names)}] {name}: "
              f"{timings[name]:.3f}s", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    # regression tracking vs the committed baseline (bench_baseline.json).
    # Entries above RETRY_RATIO are re-measured in a FRESH session (up
    # to two rounds) before being flagged: a transient host stall hits
    # one session window, a real plan regression reproduces in all of
    # them.  Set SPARK_GRAFT_BENCH_STRICT=1 to exit non-zero on
    # regression (CI use); the default records the measurement.
    baseline_queries: dict = {}
    baseline_path = os.path.join(here, "bench_baseline.json")
    if os.path.exists(baseline_path) and str(sf_val) != "0.01":
        with open(baseline_path, encoding="utf-8") as f:
            baseline = json.load(f)
        if baseline.get("sf") == sf_val:
            baseline_queries = baseline.get("queries", {})

    def _flagged(threshold: float) -> list:
        out = []
        for name, secs in timings.items():
            base = baseline_queries.get(name)
            if base and secs is not None and secs / base > threshold:
                out.append(name)
        return out

    retries_used: dict = {}
    # pre-retry timings preserved so a persistent small (1.4-1.5x)
    # drift stays visible even when the one-sided extra sampling pulls
    # the recorded min back under the flag threshold (ADVICE r13)
    pre_retry: dict = {}
    for retry_round in (1, 2):
        to_retry = _flagged(RETRY_RATIO)
        if not to_retry:
            break
        print(f"  retry round {retry_round}: {len(to_retry)} entries "
              f">{RETRY_RATIO}x baseline -> fresh session",
              file=sys.stderr)
        spark.stop()
        spark = _build_session(cpus)
        _warm(spark, queries, sf_dir, light_warm)
        for name in to_retry:
            best, failed = _time_query(spark, queries[name], sf_dir)
            if failed is None and best is not None:
                old = timings[name]
                pre_retry.setdefault(name, old)
                timings[name] = round(min(old, best), 3)
                retries_used[name] = retries_used.get(name, 0) + 1
                print(f"  retry {name}: {old:.3f}s -> "
                      f"{timings[name]:.3f}s", file=sys.stderr)
    spark.stop()

    total = sum(v for v in timings.values() if v is not None)

    regressions: dict = {}
    ratios: list = []
    for name, secs in sorted(timings.items()):
        base = baseline_queries.get(name)
        if not base or secs is None:
            continue
        ratio = secs / base
        ratios.append(ratio)
        marker = " <-- REGRESSION" if ratio > 1.5 else ""
        print(f"  {name}: {secs:.3f}s vs baseline {base:.3f}s "
              f"({ratio:.2f}x){marker}", file=sys.stderr)
        if ratio > 1.5:
            regressions[name] = round(ratio, 2)
    geomean = (round(math.exp(sum(map(math.log, ratios)) / len(ratios)), 3)
               if ratios else None)

    full = {
        "metric": "total_query_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "geomean_vs_baseline": geomean,
        "regressions": regressions,
        "errors": errors,
        "retries": retries_used,
        "pre_retry": pre_retry,
    }
    full_path = os.path.join(here, "BENCH_FULL.json")
    with open(full_path, "w", encoding="utf-8") as f:
        json.dump(full, f, indent=1, sort_keys=True)

    print(compact_line(timings, total, sf_val, geomean, regressions,
                       errors))
    # strict mode fails on ERRORS too: a broken query shrinks the
    # total, so exiting 0 would record a broken round as a speed-up
    if (regressions or errors) \
            and os.environ.get("SPARK_GRAFT_BENCH_STRICT"):
        sys.exit(1)


if __name__ == "__main__":
    main()
