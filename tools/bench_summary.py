#!/usr/bin/env python3
"""Render bench-latest.json with per-run variance.

Usage: python3 tools/bench_summary.py [bench-latest.json] [--top N]

Shows, per query: best time, every attempt, and the spread ratio
(max/min). High-spread queries are flagged — in-suite contention
(e.g. round-9 q5_region_revenue: all attempts slow in-suite, fast
solo) shows up as EITHER high spread or a uniformly-slow runs list
vs the committed previous round, and this rendering makes both
readable straight from the artifact.
"""
import json, sys

path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "bench-latest.json"
top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 20

d = json.load(open(path))
runs = d.get("runs", {})
qs = d.get("queries", {})
print(f"total={d.get('value')}s load={d.get('load')} cpu_util={d.get('cpu_util')} sf={d.get('sf')}")
if not runs:
    print("(no runs block — produced by a pre-round-10 Bench)")
rows = []
for name, best in qs.items():
    rs = runs.get(name, [])
    spread = (max(rs) / min(rs)) if rs and min(rs) > 0 else float("nan")
    rows.append((best, spread, name, rs))
rows.sort(reverse=True)
print(f"{'best':>8}  {'spread':>6}  query / runs")
for best, spread, name, rs in rows[:top]:
    flag = " <== high spread" if spread == spread and spread > 2.5 else ""
    print(f"{best:8.3f}  {spread:6.2f}  {name}  {rs}{flag}")
errs = d.get("errors", {})
if errs:
    print("ERRORS:", errs)
