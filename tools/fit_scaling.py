#!/usr/bin/env python3
"""Fit per-query scaling exponents from graft.tools.ScalingCurve output.

Usage: python3 tools/fit_scaling.py /tmp/scaling_curve.log

Takes the MIN time per (query, m) across iterations, then fits the
log-log least-squares slope over the m >= 3 slices (the m=1 point is
job-overhead-dominated at this corpus size and would bias every
exponent toward 0). Prints a markdown table ready for BASELINE.md.
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

    print("| query | " + " | ".join(
        f"{m}x" for m in sorted(next(iter(times.values())))) + " | exponent |")
    print("| --- |" + " --- |" * (len(next(iter(times.values()))) + 1))
    for name in sorted(times):
        ms = sorted(times[name])
        pts = [(math.log(m), math.log(times[name][m])) for m in ms if m >= FIT_MIN_M]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts); sxy = sum(x * y for x, y in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        row = " | ".join(f"{times[name][m]:.2f}" for m in ms)
        flag = "" if slope <= 1.3 else " ⚠"
        print(f"| `{name}` | {row} | **{slope:.2f}**{flag} |")

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_curve.log")
