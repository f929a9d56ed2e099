"""Merge fresh-JVM best-of-N bench runs into bench_baseline.json.

Usage: python tools/record_baselines.py LOG [LOG ...] -- QUERY [QUERY ...]

Each LOG is a full ``bench.py`` output file (one JSON line inside).
For every named QUERY the tool takes the MINIMUM time across the
logs (best-of-N on an idle host — the same protocol as the round-7/9
baseline recordings) and writes it into ``bench_baseline.json``,
refusing to overwrite an existing baseline unless ``--update`` is
given (deliberate re-baselining after a plan change).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = sys.argv[1:]
    update = "--update" in args
    args = [a for a in args if a != "--update"]
    split = args.index("--")
    logs, queries = args[:split], args[split + 1:]

    runs = []
    for path in logs:
        with open(path, encoding="utf-8") as f:
            text = f.read()
        try:
            # BENCH_FULL.json (the complete dict since r13 — the
            # stdout line only carries the headline subset)
            doc = json.loads(text)
            if "queries" in doc:
                runs.append(doc["queries"])
                continue
        except ValueError:
            pass
        for line in text.splitlines():
            if line.startswith("{") and '"metric"' in line:
                runs.append(json.loads(line)["queries"])
                break
    if len(runs) != len(logs):
        print(f"only {len(runs)}/{len(logs)} logs had a bench line",
              file=sys.stderr)
        return 1

    path = os.path.join(ROOT, "bench_baseline.json")
    with open(path, encoding="utf-8") as f:
        base = json.load(f)
    for q in queries:
        times = [r[q] for r in runs if q in r]
        if not times:
            print(f"SKIP {q}: not present in any log", file=sys.stderr)
            continue
        best = round(min(times), 3)
        old = base["queries"].get(q)
        if old is not None and not update:
            print(f"KEEP {q}: existing baseline {old} "
                  f"(best-of-{len(times)} now {best}); use --update")
            continue
        base["queries"][q] = best
        print(f"{'UPDATE' if old is not None else 'RECORD'} {q}: "
              f"{best} (best of {len(times)}"
              f"{'' if old is None else f', was {old}'})")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(base, f, indent=1)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
