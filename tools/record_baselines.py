"""Merge fresh-JVM best-of-N bench runs into bench_baseline.json —
with MACHINE-READABLE provenance and a lucky-baseline guard.

Usage::

    python tools/record_baselines.py [--update --reason "..."]
        [--tag rN] [--baseline PATH] LOG [LOG ...] -- QUERY [QUERY ...]

Each LOG must be a COMPLETE per-query dict — a ``BENCH_FULL.json``
(or any JSON document whose ``queries`` dict covers every benched
entry).  A compact bench stdout line (the ≤1900-char final line with
the ``full`` pointer and a headline-subset ``queries`` dict) is
REFUSED: recording baselines from the headline subset silently
changes the min-of-N population (ADVICE r13).

For every named QUERY the tool takes the MINIMUM time across the logs
(best-of-N on an idle host — the protocol of every recording since
round 7) and writes it into ``bench_baseline.json``.  Guards:

* an existing baseline is only overwritten under ``--update``, which
  REQUIRES ``--reason`` — the adjudication stops being prose in git
  history and becomes part of the baseline file;
* a new value may not undercut the sum of the entry's declared
  components' baselines (the ``components`` map in
  bench_baseline.json) — the exact argument that exposed the r12/r13
  lucky baselines (``emb_mmr_ann_recall`` < ``emb_mmr`` +
  ``emb_mmr_ann``) now runs automatically;
* every RECORD/UPDATE writes a ``provenance[query]`` entry: value,
  min-of-N population, source log names, tag and reason.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_run(path: str) -> dict:
    """The complete per-query timing dict of one bench log, or raise
    ValueError with the reason it is unusable."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    doc = None
    try:
        doc = json.loads(text)
    except ValueError:
        # a raw stdout/stderr capture: find the final JSON line
        for line in text.splitlines():
            if line.startswith("{") and '"metric"' in line:
                doc = json.loads(line)
                break
    if not isinstance(doc, dict) or "queries" not in doc:
        raise ValueError(f"{path}: no bench JSON with a 'queries' dict")
    queries_n = doc.get("queries_n")
    if doc.get("full") and queries_n is not None \
            and queries_n != len(doc["queries"]):
        raise ValueError(
            f"{path}: compact bench stdout line (headline subset, "
            f"{len(doc['queries'])}/{queries_n} entries) — pass the "
            f"referenced {doc['full']} instead")
    return doc["queries"]


def main() -> int:
    args = sys.argv[1:]
    update = "--update" in args
    args = [a for a in args if a != "--update"]

    def _opt(name: str):
        if name in args:
            i = args.index(name)
            value = args[i + 1]
            del args[i:i + 2]
            return value
        return None

    reason = _opt("--reason")
    tag = _opt("--tag")
    baseline_path = _opt("--baseline") or os.path.join(
        ROOT, "bench_baseline.json")
    if update and not reason:
        print("--update requires --reason \"...\" (machine-readable "
              "re-baseline adjudication)", file=sys.stderr)
        return 1

    split = args.index("--")
    logs, queries = args[:split], args[split + 1:]

    runs = []
    for path in logs:
        try:
            runs.append(load_run(path))
        except ValueError as e:
            print(f"ERROR: {e}", file=sys.stderr)
            return 1

    with open(baseline_path, encoding="utf-8") as f:
        base = json.load(f)
    components = base.get("components", {})
    provenance = base.setdefault("provenance", {})

    for q in queries:
        times = [r[q] for r in runs if q in r and r[q] is not None]
        if not times:
            print(f"SKIP {q}: not present (non-null) in any log",
                  file=sys.stderr)
            continue
        best = round(min(times), 3)
        old = base["queries"].get(q)
        if old is not None and not update:
            print(f"KEEP {q}: existing baseline {old} "
                  f"(best-of-{len(times)} now {best}); use --update")
            continue
        # lucky-baseline guard: an entry that RUNS its declared
        # components cannot honestly be faster than their sum
        comp = components.get(q)
        if comp:
            missing = [c for c in comp if c not in base["queries"]]
            floor = sum(base["queries"][c] for c in comp
                        if c in base["queries"])
            if not missing and best < floor:
                print(f"REFUSE {q}: {best} undercuts the sum of its "
                      f"declared components' baselines ({floor:.3f} = "
                      f"{' + '.join(comp)}) — a lucky-run artifact, "
                      "not a baseline", file=sys.stderr)
                return 1
        base["queries"][q] = best
        entry = {
            "value": best,
            "min_of": len(times),
            "logs": [os.path.basename(p) for p in logs],
        }
        if tag:
            entry["tag"] = tag
        if old is not None:
            entry["was"] = old
            entry["reason"] = reason
        provenance[q] = entry
        print(f"{'UPDATE' if old is not None else 'RECORD'} {q}: "
              f"{best} (best of {len(times)}"
              f"{'' if old is None else f', was {old}'})")
    with open(baseline_path, "w", encoding="utf-8") as f:
        json.dump(base, f, indent=1)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
