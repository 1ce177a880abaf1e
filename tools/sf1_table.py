"""Render the full-suite sf0.1 → sf1 growth table for SCALING.md
(VERDICT r8 task #1) from the two committed bench artifacts:

- ``BENCH_full.json`` — bench.py's sidecar from the latest sf0.1 run
- ``BENCH_sf1.json``  — the same 30-query suite at the synthetic sf1
  (``tools/bench_sf1.py``)

Prints the markdown table (steady best-of-2 seconds, ×10 growth factor,
sorted by growth) plus totals, ready to paste/embed; keeping the table a
function of committed JSON means it cannot rot by hand.

Usage::

    python tools/sf1_table.py [sf01_json] [sf1_json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    p01 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_full.json")
    p1 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH_sf1.json")
    with open(p01) as fh:
        b01 = json.load(fh)
    with open(p1) as fh:
        b1 = json.load(fh)
    s01, s1 = b01["steady_queries"], b1["steady_queries"]
    rows = []
    for q in s1:
        if q in s01 and s01[q] > 0:
            rows.append((q, s01[q], s1[q], s1[q] / s01[q]))
    rows.sort(key=lambda r: -r[3])
    print("| query | sf0.1 | sf1 | ×10 growth |")
    print("|---|---|---|---|")
    for q, a, b, g in rows:
        print(f"| {q} | {a:.2f} | {b:.2f} | ×{g:.1f} |")
    t01 = sum(a for _, a, _, _ in rows)
    t1 = sum(b for _, _, b, _ in rows)
    print(
        f"| **total ({len(rows)} queries)** | **{t01:.1f}** | **{t1:.1f}** "
        f"| **×{t1 / t01:.1f}** |"
    )
    la01 = b01.get("loadavg_1min", {})
    la1 = b1.get("loadavg_1min", {})
    if la01 and la1:
        print(
            f"\n(loadavg_1min ranges: sf0.1 {min(la01.values())}-{max(la01.values())},"
            f" sf1 {min(la1.values())}-{max(la1.values())};"
            f" setup raw+clean: sf0.1 {b01['setup_raw_sec']}+{b01['setup_clean_sec']}s,"
            f" sf1 {b1['setup_raw_sec']}+{b1['setup_clean_sec']}s)"
        )


if __name__ == "__main__":
    main()
