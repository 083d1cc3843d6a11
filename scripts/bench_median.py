#!/usr/bin/env python3
"""Merge >= 2 clean Bench captures into one per-metric-MEDIAN record.

VERDICT r11 #8: single-capture records ride one host window — identical
code measured 230-271 s total across five clean captures (±15% window
drift), so round-over-round deltas could read as engine drift. This tool
takes the per-metric LOWER MEDIAN across N captures (an actual measured
value, so the paired `exec` signature stays coherent) and emits a record
of the same shape plus:

  captures          N
  capture_totals    each input's total
  capture_files     provenance
  spread            per metric: max/min across the per-capture REPORTED
                    values (cross-WINDOW spread, replacing the in-capture
                    steady-state spread)
  contaminated      metrics flagged in EVERY capture (a flag in one
                    window is exactly what the median heals; unanimity
                    means the metric itself is unstable)
  contaminated_any  union of the inputs' flags, for the audit trail
  canary            list of the inputs' canaries

Inputs carrying invalid_capture:true are refused (the refresh script's
rule, applied before merging instead of after).

Usage: bench_median.py CAPTURE.json CAPTURE2.json [...] > BENCH_LOCAL.json
"""
import json
import statistics
import sys


def lower_median(xs):
    s = sorted(xs)
    return s[(len(s) - 1) // 2]


def main(paths):
    if len(paths) < 2:
        sys.exit("need >= 2 capture files to median")
    caps = []
    for p in paths:
        with open(p) as f:
            c = json.load(f)
        if c.get("invalid_capture"):
            sys.exit(f"{p} carries invalid_capture:true — discard it and "
                     "re-capture in a quiet window")
        caps.append(c)
    keys = set(caps[0]["queries"])
    for i, c in enumerate(caps[1:], 2):
        if set(c["queries"]) != keys:
            sys.exit(f"capture {paths[i-1]} has a different metric set — "
                     "merge only captures of the same code")
    queries, runs, exec_, all_runs, spread = {}, {}, {}, {}, {}
    for k in sorted(keys):
        vals = [c["queries"][k] for c in caps]
        # median over CLEAN values only: a -1 failure sentinel in half the
        # captures must not outvote a clean measurement (with [-1, 231.4]
        # the raw lower median is -1 — a metric blessed as failed even
        # though it ran). All-failed stays -1. ADVICE r12.
        clean = [v for v in vals if v > 0]
        med = lower_median(clean) if clean else -1.0
        # guard the source lookup (ADVICE r13): when clean is empty the
        # sentinel med may not literally appear in vals (e.g. a 0.000
        # from %.3f rounding), and vals.index would raise ValueError
        src = caps[vals.index(med)] if med in vals else caps[0]
        queries[k] = med
        runs[k] = src.get("runs", {}).get(k)
        if k in src.get("exec", {}):
            exec_[k] = src["exec"][k]
        all_runs[k] = [t for c in caps for t in c.get("allRuns", {}).get(k, [])]
        good = [v for v in vals if v > 0]
        spread[k] = round(max(good) / min(good), 2) if len(good) >= 2 else 1.0
    flags = [set(c.get("contaminated", [])) for c in caps]
    merged = {
        "metric": "total",
        "value": round(sum(v for v in queries.values() if v >= 0), 3),
        "unit": "sec",
        "captures": len(caps),
        "capture_totals": [c["value"] for c in caps],
        "capture_files": paths,
        "queries": queries,
        "runs": runs,
        "allRuns": all_runs,
        "spread": spread,
        "contaminated": sorted(set.intersection(*flags)),
        "contaminated_any": sorted(set.union(*flags)),
        "invalid_capture": False,
        "canary": [c.get("canary") for c in caps],
        "exec": exec_,
        "sf": caps[0].get("sf"),
    }
    json.dump(merged, sys.stdout)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main(sys.argv[1:])
