#!/usr/bin/env python3
"""Merge two Bench JSON lines into per-query minimums (round-5 bench
hygiene): single-JVM interference (GC, page cache, leftover shuffle
files) shows up as one-sided noise, so min-of-2 is the stable estimator
the round-over-round comparison should use. Also reports queries whose
run-to-run spread exceeds 25% (only where the faster run is >0.5s —
sub-second queries are all jitter).

Usage: bench_min.py RUN_A.json RUN_B.json
"""
import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    assert set(qa) == set(qb), "query sets differ between runs"
    merged = {k: min(qa[k], qb[k]) for k in qa}
    over = {
        k: round(abs(qa[k] - qb[k]) / min(qa[k], qb[k]), 2)
        for k in qa
        if min(qa[k], qb[k]) > 0.5
        and abs(qa[k] - qb[k]) / min(qa[k], qb[k]) > 0.25
    }
    out = {
        "metric": "total",
        "unit": "sec",
        "sf": a["sf"],
        "queries": merged,
        "runs": [round(a["value"], 2), round(b["value"], 2)],
        "spread_over_25pct": over,
        "value": sum(merged.values()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
