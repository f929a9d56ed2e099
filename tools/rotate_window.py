"""Rotate the driver correctness window.

The driver's per-round gate verifies only the FIRST 50
``__spark_entry__.queries()`` entries, so coverage must rotate:
never-driver-checked entries (new this round) go first, then all
remaining entries ordered by STALEST last driver-green round
ascending (stable by current dict order within a round).  The tool
rewrites the ``return {...}`` literal in ``__spark_entry__.py`` in
that order, with window markers, and prints the round-by-round
last-green census.

Green = rows_match AND schema_match AND hash_match in the newest
CORRECTNESS_r*.json that contains the entry.

Usage: python tools/rotate_window.py [--dry-run]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def last_green_rounds() -> dict:
    """entry -> newest round number with a fully-green driver row."""
    last: dict = {}
    for path in sorted(glob.glob(os.path.join(ROOT,
                                              "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        for name, row in data.items():
            if (row.get("rows_match") and row.get("schema_match")
                    and row.get("hash_match")):
                last[name] = max(last.get(name, 0), rnd)
    return last


def main() -> int:
    dry = "--dry-run" in sys.argv
    entry_path = os.path.join(ROOT, "__spark_entry__.py")
    src = open(entry_path, encoding="utf-8").read()
    m = re.search(r"(def queries\(\).*?return \{)(.*?)(\n    \})", src,
                  re.S)
    if not m:
        print("queries() dict not found", file=sys.stderr)
        return 1
    pairs = re.findall(r'"([a-z0-9_]+)":\s*(q_[a-z0-9_]+),',
                       m.group(2))
    names = [n for n, _ in pairs]
    value = dict(pairs)
    green = last_green_rounds()

    fresh = [n for n in names if n not in green]
    stale = sorted((n for n in names if n in green),
                   key=lambda n: (green[n], names.index(n)))
    order = fresh + stale

    print(f"{len(fresh)} never-driver-green entries lead the window:")
    for n in fresh:
        print(f"  NEW {n}")
    census: dict = {}
    for n in stale:
        census.setdefault(green[n], []).append(n)
    for rnd in sorted(census):
        print(f"  r{rnd}: {len(census[rnd])} entries "
              f"({', '.join(census[rnd][:6])}"
              f"{'...' if len(census[rnd]) > 6 else ''})")
    in_window = order[:WINDOW]
    oldest_next = [n for n in order[WINDOW:]][:5]
    print(f"window = {len(fresh)} new + "
          f"{WINDOW - len(fresh)} stalest; first beyond window: "
          f"{oldest_next}")

    lines = []
    for i, n in enumerate(order):
        if i == 0:
            lines.append(f"        # ---- DRIVER WINDOW (first "
                         f"{WINDOW}; rotated by tools/"
                         "rotate_window.py) ----")
        if i == len(fresh) and fresh:
            lines.append("        # -- stalest last-driver-green "
                         "entries, ascending --")
        if i == WINDOW:
            lines.append("        # ---- beyond the window (driver-"
                         "green more recently; full local sweep "
                         "covers all) ----")
        lines.append(f'        "{n}": {value[n]},')
    new_body = "\n" + "\n".join(lines)
    new_src = src[:m.start(2)] + new_body + src[m.end(2):]
    if dry:
        print("(dry run, file unchanged)")
        return 0
    open(entry_path, "w", encoding="utf-8").write(new_src)
    print(f"rewrote queries() with {len(order)} entries "
          f"({len(fresh)} new first)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
