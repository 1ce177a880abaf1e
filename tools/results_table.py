"""Render SCALING.md's 3-SF Results table from three bench.py JSONs.

Usage::

    python tools/results_table.py <sf0.001.json> <sf0.01.json> <sf0.1.json>

Prints the markdown table (steady best-of-2 per SF, plus the sf0.1
cold lap), sorted by the sf0.01 -> sf0.1 x10 growth — the step where
data cost starts to beat fixed overhead. The committed sf0.1 artifact
is BENCH_full.json; the smaller-SF artifacts are transient (rerun
them: ``SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_BENCH_OUT=... python
bench.py``).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    p001, p01, p1 = sys.argv[1:4]
    runs = []
    for p in (p001, p01, p1):
        with open(p) as fh:
            runs.append(json.load(fh))
    a, b, c = runs
    names = [q for q in c["steady_queries"] if q in a["steady_queries"]]
    rows = []
    for q in names:
        s001 = a["steady_queries"][q]
        s01 = b["steady_queries"][q]
        s1 = c["steady_queries"][q]
        cold = c["queries"][q]
        rows.append((q, s001, s01, s1, cold, s1 / s01 if s01 else float("inf")))
    rows.sort(key=lambda r: -r[5])
    print("| query | sf0.001 | sf0.01 | sf0.1 | sf0.1 cold | ×10 growth |")
    print("|---|---|---|---|---|---|")
    for q, s001, s01, s1, cold, g in rows:
        print(f"| {q} | {s001:.2f} | {s01:.2f} | {s1:.2f} | {cold:.2f} | {g:.2f} |")
    t = [sum(r[i] for r in rows) for i in (1, 2, 3, 4)]
    print(
        f"| **total ({len(rows)} queries)** | **{t[0]:.1f}** | **{t[1]:.1f}** "
        f"| **{t[2]:.1f}** | **{t[3]:.1f}** | **{t[2] / t[1]:.2f}** |"
    )
    la = lambda d: d.get("loadavg", {})  # noqa: E731
    for label, d in (("sf0.001", a), ("sf0.01", b), ("sf0.1", c)):
        vals = list(la(d).values())
        if vals:
            print(f"<!-- {label} loadavg {min(vals)}-{max(vals)} -->")


if __name__ == "__main__":
    main()
