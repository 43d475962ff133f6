#!/usr/bin/env python3
"""Machine-readable bench summary for the round artifacts.

graft.Bench writes full-precision per-query medians to bench_full.json
(gitignored — it is a run artifact) and prints a tail-safe truncated
line to stdout for the driver. This script normalizes bench_full.json
into a committed BENCH_SUMMARY.json so each round's exact total and
per-query medians survive without reconstruction (VERDICT r9 item 7:
BENCH_r09.json's truncated tail cost the verdict an exact total).

Usage:
    python3 scripts/bench_summary.py [bench_full.json] [BENCH_SUMMARY.json]
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
dst = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SUMMARY.json"

with open(src) as f:
    d = json.load(f)

queries = {k: round(v, 3) for k, v in sorted(d["queries"].items())}
total = round(sum(d["queries"].values()), 3)
summary = {
    "metric": "total",
    "value": total,
    "unit": "sec",
    "n_queries": len(queries),
    "sec_per_query": round(total / len(queries), 3) if queries else None,
    "reps": d.get("reps"),
    "sf": d.get("sf"),
    # graft.Bench's machine-state self-diagnosis (round 17): loadavg at
    # run start/end + the fixed calibration query's time, so any future
    # comparison can normalize environment drift
    "loadavg": d.get("loadavg"),
    "calibration_sec": d.get("calibration_sec"),
    "slowest": sorted(d["queries"].items(), key=lambda kv: -kv[1])[:10],
    "queries": queries,
}
with open(dst, "w") as f:
    json.dump(summary, f, indent=1, sort_keys=False)
    f.write("\n")
print(f"{dst}: total={total}s over {len(queries)} queries "
      f"({summary['sec_per_query']}s/query)")
