#!/usr/bin/env python3
"""Compare two Bench JSON outputs and report per-query scaling ratios.

Usage: scale_compare.py SMALL.json BIG.json [DATA_FACTOR=10]

Flags queries whose runtime ratio exceeds DATA_FACTOR * log2(DATA_FACTOR)
(the "worse than ~linear x log" bar from the round-3 verdict) and sorts
the report by ratio descending. Queries with sub-0.2 s small-side times
are reported but not flagged (fixed overheads dominate them).
"""
import json, math, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
bar = factor * math.log2(max(factor, 2))

sq, bq = small["queries"], big["queries"]
rows = []
for k in sorted(bq):
    s, b = sq.get(k), bq[k]
    if s is None or s <= 0:
        continue
    rows.append((b / s, s, b, k))
rows.sort(reverse=True)
flagged = 0
for ratio, s, b, k in rows:
    flag = " <-- SUPERLINEAR" if ratio > bar and s >= 0.2 else ""
    if flag:
        flagged += 1
    print(f"{k:28s} {s:8.2f}s -> {b:8.2f}s  x{ratio:6.1f}{flag}")
print(f"\ntotal: {small['value']:.1f}s -> {big['value']:.1f}s "
      f"(x{big['value']/small['value']:.1f} at data x{factor:g}; "
      f"bar=x{bar:.0f}); flagged={flagged}")
