"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` in DuckDB on the same parquet, compares row count,
column names and exact values (columns sorted by name, rows sorted),
and prints a per-query verdict.  Strictly exact float comparison by
default — if it passes here, any tolerance scheme passes.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), na_position="first")
    return df.reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rows: spark={len(spark_df)} oracle={len(oracle_df)}")
    scols, ocols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if scols != ocols:
        problems.append(f"cols: spark={scols} oracle={ocols}")
        return problems
    if problems:
        return problems
    s, o = normalize(spark_df), normalize(oracle_df)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        # the driver hashes serialized values, so int64 3549 vs float64
        # 3549.0 is a driver-red even when numerically identical (DuckDB
        # HUGEINT sums land in pandas as float64) — mirror that here
        s_int = np.issubdtype(sv.dtype, np.integer)
        o_int = np.issubdtype(ov.dtype, np.integer)
        s_flt = np.issubdtype(sv.dtype, np.floating)
        o_flt = np.issubdtype(ov.dtype, np.floating)
        if (s_int and o_flt) or (s_flt and o_int):
            problems.append(
                f"col {c}: dtype mismatch spark={sv.dtype} vs "
                f"oracle={ov.dtype} (driver value-hash would differ; "
                f"CAST the oracle aggregate)"
            )
            continue
        if s_flt or o_flt:
            sv = sv.astype(float)
            ov = ov.astype(float)
            both_nan = np.isnan(sv) & np.isnan(ov)
            exact = (sv == ov) | both_nan
            if not exact.all():
                bad = np.where(~exact)[0][:3]
                close = np.allclose(sv, ov, rtol=1e-9, atol=1e-12, equal_nan=True)
                problems.append(
                    f"col {c}: {int((~exact).sum())} exact mismatches "
                    f"(close={close}); first: "
                    + "; ".join(f"[{i}] {sv[i]!r} vs {ov[i]!r}" for i in bad)
                )
        else:
            eq = (s[c].fillna("__null__") == o[c].fillna("__null__"))
            if not eq.all():
                bad = eq[~eq].index[:3]
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches; first: "
                    + "; ".join(f"[{i}] {s[c][i]!r} vs {o[c][i]!r}" for i in bad)
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # data-dependent oracles (emb_ivf centroids, emb_ann dims) must be
    # generated against the SAME scale factor the comparison runs at
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    import __spark_entry__ as entrymod
    from cubes_spark.sources.workspace import default_session

    spark = default_session("check_correctness")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # an unknown name in the filter must be an ERROR — a typo that
    # matches nothing would print '0 pass, 0 fail' and exit 0, a
    # false green from the correctness gate
    unknown = only - set(queries)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2
    n_pass = n_fail = n_noracle = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"----  {name}: no oracle (rows-only): {len(sdf)} rows "
                  f"[{time.time()-t0:.1f}s]")
            n_noracle += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
