#!/usr/bin/env python3
"""Fit per-query scaling exponents from graft.tools.ScalingCurve output.

Usage: python3 tools/fit_scaling.py /tmp/scaling_curve.log

Takes the MIN time per (query, m) across iterations, then fits the
log-log least-squares slope over the m >= 3 slices (the m=1 point is
job-overhead-dominated at this corpus size and would bias every
exponent toward 0). Prints a markdown table ready for BASELINE.md.

Column set is the UNION of m values across all queries: a query that
failed at one slice (ScalingCurve prints no SCALING line for failures)
gets an explicit "-" cell there instead of silently misaligning the
table against a header derived from some other query's slices.
"""
import math
import re
import sys
from collections import defaultdict

FIT_MIN_M = 3

def main(path):
    times = defaultdict(dict)  # name -> m -> min seconds
    for line in open(path, encoding="utf-8", errors="replace"):
        mt = re.search(r"SCALING (\S+) m=(\d+) iter=\d+ ([0-9.]+) s", line)
        if not mt:
            continue
        name, m, sec = mt.group(1), int(mt.group(2)), float(mt.group(3))
        times[name][m] = min(sec, times[name].get(m, float("inf")))

    if not times:
        print(f"no SCALING lines found in {path}", file=sys.stderr)
        sys.exit(1)

    all_ms = sorted({m for per_q in times.values() for m in per_q})
    print("| query | " + " | ".join(f"{m}x" for m in all_ms) + " | exponent |")
    print("| --- |" + " --- |" * (len(all_ms) + 1))
    for name in sorted(times):
        per_q = times[name]
        pts = [(math.log(m), math.log(per_q[m]))
               for m in sorted(per_q) if m >= FIT_MIN_M]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts); sxy = sum(x * y for x, y in pts)
        denom = n * sxx - sx * sx
        row = " | ".join(
            f"{per_q[m]:.2f}" if m in per_q else "-" for m in all_ms)
        if n >= 2 and denom != 0:
            slope = (n * sxy - sx * sy) / denom
            flag = "" if slope <= 1.3 else " ⚠"
            missing = "" if len(per_q) == len(all_ms) else " (partial)"
            print(f"| `{name}` | {row} | **{slope:.2f}**{flag}{missing} |")
        else:
            print(f"| `{name}` | {row} | (need >=2 slices >= {FIT_MIN_M}x) |")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_curve.log")
