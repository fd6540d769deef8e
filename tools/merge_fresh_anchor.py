#!/usr/bin/env python
"""Merge fresh per-key minima into the committed bench_full.json anchor.

Usage: python tools/merge_fresh_anchor.py run1.json run2.json [...]

Each input is a bench_partial.json / bench_last.json shaped file (raw
per-key times from a SPARK_GRAFT_KEYS-filtered bench run).  For every
key present in the inputs, the MINIMUM across the inputs REPLACES the
bench_full.json anchor entry (the SPARK_GRAFT_FRESH_KEYS discipline:
keys whose implementation changed must not keep a stale faster min,
and a single contended full run must not poison the anchor upward —
repeated filtered runs + min is the BASELINE.md minima policy applied
to fresh keys).  Prints the per-key before/after table.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    full_path = os.path.join(here, "bench_full.json")
    with open(full_path) as f:
        full = json.load(f)
    mins: dict[str, float] = {}
    for path in sys.argv[1:]:
        with open(path) as f:
            q = json.load(f).get("queries", {})
        for k, v in q.items():
            mins[k] = min(v, mins.get(k, v))
    for k in sorted(mins):
        old = full["queries"].get(k)
        full["queries"][k] = mins[k]
        print(f"{k:40s} {old if old is not None else float('nan'):8.3f} "
              f"-> {mins[k]:8.3f}")
    full["value"] = round(sum(full["queries"].values()), 3)
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    print(f"anchor total: {full['value']} / {len(full['queries'])} keys")


if __name__ == "__main__":
    main()
