"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
``{"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}``

Each query is forced end-to-end with a noop sink (full execution, no
driver-side result transfer), timed wall-clock after a shared session
warm-up.
"""

from __future__ import annotations

import json
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

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
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # FULL coverage: every queries() entry is benched — the curated
    # BENCH_QUERIES list leads (stable output ordering for
    # round-over-round diffs), then every remaining entry in
    # queries() order.  A new entry therefore gets a regression
    # tripwire the round it lands, without a manual list edit.
    bench_names = list(BENCH_QUERIES) + [
        n for n in queries if n not in set(BENCH_QUERIES)]

    # warm-up: JVM + parquet footer reads + cuboid materialization for
    # the preagg query, plus one pass over the codegen-heavy LSH
    # pipelines so measured runs see tiered-up JIT, not compile time
    for warm in ("agg_year", "preagg_year", "doc_minhash", "doc_simhash",
                 "emb_ann"):
        try:
            queries[warm](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        except Exception as exc:  # a broken query must not kill the run
            print(f"  warm-up {warm} failed: {exc}", file=sys.stderr)
        spark.catalog.clearCache()

    # failure isolation: one broken query yields one null timing (and an
    # "errors" entry), never a dead run — a bench that aborts loses
    # every other measurement for the round
    timings: dict = {}
    errors: dict = {}
    total = 0.0
    for name in bench_names:
        fn = queries.get(name)
        if fn is None:
            # a renamed/removed entry must cost ONE timing, not the run
            timings[name] = None
            errors[name] = "not in __spark_entry__.queries()"
            print(f"  {name}: MISSING from queries()", file=sys.stderr)
            continue
        # best of 3: suppress scheduler/GC/JIT noise so round-over-round
        # comparisons reflect plan changes, not jitter (observed spread
        # on a shared host is >2x between reps of the same plan)
        best = None
        failed = None
        for _ in range(3):
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:
                failed = f"{type(exc).__name__}: {exc}"[:300]
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # drop caches persisted inside operators (LSH signature
            # tables) so runs are measured independently
            spark.catalog.clearCache()
        if failed is not None:
            timings[name] = None
            errors[name] = failed
            print(f"  {name}: FAILED ({failed})", file=sys.stderr)
            spark.catalog.clearCache()
            continue
        timings[name] = round(best, 3)
        total += timings[name]

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    # regression tracking vs the committed baseline (bench_baseline.json):
    # per-query deltas to stderr, >1.5x regressions also in the JSON.
    # STDOUT stays exactly ONE JSON line.  Set SPARK_GRAFT_BENCH_STRICT=1
    # to exit non-zero on regression (CI use); the default records the
    # measurement rather than suppressing it.
    regressions: dict = {}
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    if os.path.exists(baseline_path) and str(sf_val) != "0.01":
        with open(baseline_path, encoding="utf-8") as f:
            baseline = json.load(f)
        if baseline.get("sf") == sf_val:
            for name, secs in timings.items():
                base = baseline.get("queries", {}).get(name)
                if not base or secs is None:
                    continue
                ratio = secs / base
                marker = " <-- REGRESSION" if ratio > 1.5 else ""
                print(f"  {name}: {secs:.3f}s vs baseline {base:.3f}s "
                      f"({ratio:.2f}x){marker}", file=sys.stderr)
                if ratio > 1.5:
                    regressions[name] = round(ratio, 2)

    out = {
        "metric": "total_query_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if regressions:
        out["regressions"] = regressions
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    # strict mode fails on ERRORS too: a broken query shrinks the
    # total, so exiting 0 would record a broken round as a speed-up
    if (regressions or errors) \
            and os.environ.get("SPARK_GRAFT_BENCH_STRICT"):
        sys.exit(1)


if __name__ == "__main__":
    main()
