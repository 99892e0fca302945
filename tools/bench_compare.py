#!/usr/bin/env python3
"""Round-over-round bench regression tracker (round-5 verdict item 8).

Compares two Bench JSON files (raw single runs OR bench_min.py merges)
per query, applying the repo's measurement rules so regressions are
machine-detected instead of judge-eyeballed:

  - box noise is ±25% run-to-run, so a delta only counts when the query
    is slower by MORE than the noise band;
  - sub-second queries are all jitter: a query is only flagged when the
    BASELINE side is >= 0.5 s (same floor as bench_min.py);
  - queries present on one side only are listed as added/removed, never
    as regressions (surface growth is not a slowdown);
  - min-of-N awareness: pass additional CURRENT run files and the
    per-query minimum across them is compared (one-sided interference
    never inflates a min).

Usage: bench_compare.py BASELINE.json CURRENT.json [CURRENT2.json ...]
Exit status: 0 = no regressions beyond noise, 1 = regressions found.
"""
import json
import sys

NOISE = 0.25      # documented run-to-run spread on this box
FLOOR_SEC = 0.5   # below this, deltas are jitter, not signal


def load(path):
    """Accept either a raw Bench line ({"queries": {...}}) or the driver's
    BENCH_r{N}.json wrapper ({"parsed": {...}} or, when the line was
    truncated in capture, only a "tail" string — recover what per-query
    pairs survive, dropping the first pair since it may be clipped)."""
    import re
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    meta = {"metric", "value", "unit", "sf", "n", "rc", "cpus"}
    pairs = re.findall(r'"([A-Za-z0-9_]+)":([0-9][0-9.eE+-]*)', d.get("tail", ""))
    queries = {k: float(v) for k, v in pairs[1:] if k not in meta}
    if not queries:
        sys.exit(f"{path}: no per-query timings recoverable")
    return {"queries": queries, "sf": d.get("sf")}


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    base = load(sys.argv[1])
    currents = [load(p) for p in sys.argv[2:]]
    qb = base["queries"]
    qc = {}
    for cur in currents:
        for k, v in cur["queries"].items():
            qc[k] = min(qc[k], v) if k in qc else v

    added = sorted(set(qc) - set(qb))
    removed = sorted(set(qb) - set(qc))
    shared = sorted(set(qb) & set(qc))

    regressions = {}
    improvements = {}
    for k in shared:
        b, c = qb[k], qc[k]
        if b < FLOOR_SEC:
            continue
        ratio = c / b
        if ratio > 1 + NOISE:
            regressions[k] = {"base": round(b, 3), "cur": round(c, 3),
                              "x": round(ratio, 2)}
        elif ratio < 1 - NOISE:
            improvements[k] = {"base": round(b, 3), "cur": round(c, 3),
                               "x": round(ratio, 2)}

    tot_b = sum(qb[k] for k in shared)
    tot_c = sum(qc[k] for k in shared)
    report = {
        "baseline": sys.argv[1],
        "current": sys.argv[2:],
        "shared_queries": len(shared),
        "shared_total_base_sec": round(tot_b, 1),
        "shared_total_cur_sec": round(tot_c, 1),
        "shared_total_x": round(tot_c / tot_b, 2) if tot_b else None,
        "added": added,
        "removed": removed,
        "regressions": regressions,
        "improvements": improvements,
    }
    print(json.dumps(report, indent=2))
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
