"""Scale sweep for the AUTO-nlist SemDeDup path (VERDICT r7 item 3).

The driver entries pin ``nlist=16`` so their oracles replay; the
production default is ``nlist=None`` → ``max(16, N/128)`` cells
(``llm/similarity.py:_auto_nlist``, bounded expected cell size since
r11), which keeps within-cell pair work LINEAR in the corpus instead
of N²/nlist.  This times ``semantic_dedup_greedy`` at two scales
under BOTH settings to show the auto default is the one that
survives the decade.

Usage: python tools/semdedup_autonlist_sweep.py [small_dir] [big_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"

    from cubes_spark.llm.similarity import (
        _auto_nlist,
        semantic_dedup_greedy,
    )
    from cubes_spark.sources.workspace import ParquetStore, \
        default_session

    spark = default_session("semdedup_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    def run(sf_dir: str, nlist):
        emb = ParquetStore(spark, sf_dir).table("embeddings")
        t0 = time.perf_counter()
        out = semantic_dedup_greedy(emb, threshold=0.35, nlist=nlist,
                                    seed=42, max_rounds=6)
        n_kept = out.filter("is_kept").count()
        dt = time.perf_counter() - t0
        resolved = nlist if nlist is not None else _auto_nlist(
            emb, None, 4096)
        return dt, n_kept, resolved

    rows = []
    for label, nlist in (("fixed nlist=16", 16),
                         ("auto nlist", None)):
        t_small, k_small, n_small = run(small, nlist)
        t_big, k_big, n_big = run(big, nlist)
        ratio = t_big / t_small if t_small else float("inf")
        rows.append((label, n_small, t_small, n_big, t_big, ratio))
        print(f"{label}: {small} nlist={n_small} {t_small:.2f}s "
              f"(kept {k_small}) | {big} nlist={n_big} "
              f"{t_big:.2f}s (kept {k_big}) | "
              f"ratio/decade {ratio:.2f}x", flush=True)

    print("| variant | small nlist | small sec | big nlist | "
          "big sec | ratio/decade |")
    print("|---|---|---|---|---|---|")
    for label, ns, ts, nb, tb, r in rows:
        print(f"| {label} | {ns} | {ts:.2f} | {nb} | {tb:.2f} "
              f"| {r:.2f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
