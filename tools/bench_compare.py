"""Mechanical mover report: BENCH_LOCAL.json vs the warm reference.

Round 7's VERDICT flagged x09/x21 as ">1.3x movers" and round 8 spent a
turn re-deriving that both were ambient noise; with the LRU gate
rotation reordering the catalog every round (first-touch costs migrate
between rows), eyeballing raw per-row deltas is now actively misleading.
This tool is the institutional replacement: it compares the latest
bench run against BENCH_WARM.json's [cold, warm] bands and prints only
rows that exceed BOTH their cold and warm reference by the threshold —
i.e. slower than even a first-touch run should be — plus rows missing a
reference (new queries, renamed rows).

Usage: python tools/bench_compare.py [threshold]   (default 1.3)
Exit code 1 when any row breaches, so it can gate a round-close check.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 1.3
    with open(os.path.join(here, "BENCH_LOCAL.json")) as f:
        local = json.load(f)["queries"]
    with open(os.path.join(here, "BENCH_WARM.json")) as f:
        warm = json.load(f)["queries"]

    breaches, missing = [], []
    for name, t in sorted(local.items()):
        band = warm.get(name)
        if band is None:
            missing.append(name)
            continue
        cold_ref, warm_ref = band
        # floor tiny references: sub-100ms rows jitter multiplicatively
        ref = max(cold_ref, warm_ref, 0.1)
        if t > threshold * ref:
            breaches.append((name, t, cold_ref, warm_ref, round(t / ref, 2)))

    for name, t, c, w, r in sorted(breaches, key=lambda x: -x[4]):
        print(f"BREACH {name}: {t:.2f}s vs ref [{c:.2f} cold / {w:.2f} warm] = {r}x")
    for name in missing:
        print(f"NO-REF {name}: {local[name]:.2f}s (not in BENCH_WARM.json — "
              f"rerun tools/bench_warm.py)")
    if not breaches and not missing:
        print(f"OK: no row exceeds {threshold}x its cold/warm reference "
              f"({len(local)} rows)")
    return 1 if breaches else 0


if __name__ == "__main__":
    raise SystemExit(main())
