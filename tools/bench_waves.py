#!/usr/bin/env python3
"""Adjudicate a suspect bench artifact against one or more counterparts.

The box this project measures on intermittently enters ~20-minute
"stall waves": per-stage driver scheduling latency inflates queries
30-120x regardless of their plans (constant-work scans included),
then recedes. Waves move between runs, so a single artifact cannot
distinguish a plan regression from a wave — but a PAIR can: a plan
regression reproduces in both runs; a wave hits different spans.

Usage: bench_waves.py <baseline.json> <run.json> [run2.json ...]

Prints per-query medians, the min-across-runs total, queries whose
MINIMUM across all runs still exceeds the ratio threshold (the real
suspects worth profiling), and each run's wave spans (maximal
alphabetical stretches of >=3 consecutive queries over 5x baseline).
"""
import json, sys, statistics

RATIO_SUSPECT = 5.0
WAVE_RATIO = 5.0
WAVE_MIN_RUN = 3

def load(p):
    d = json.load(open(p))
    return d["queries"], d

if len(sys.argv) < 3:
    print(__doc__)
    sys.exit(2)

base, _ = load(sys.argv[1])
runs = [(p, *load(p)) for p in sys.argv[2:]]

common = set(base)
for _, q, _ in runs:
    common &= set(q)
comp = sorted(k for k in common if base[k] > 0.05)

for path, q, full in runs:
    ratios = {k: q[k] / base[k] for k in comp}
    med = statistics.median(ratios.values())
    total = sum(q[k] for k in common)
    print(f"\n== {path}")
    print(f"   total {total:.1f}s over {len(common)} common queries; "
          f"median ratio {med:.2f}x; contended={full.get('contended')}")
    # wave spans: stretches contiguous IN EXECUTION ORDER over the
    # threshold. Bench emits its queries map in run order (alphabetical
    # before r15, descending recorded cost after the heavy-first
    # reorder), and json.load preserves file order — so each run's own
    # key order IS its timeline, whatever protocol produced it.
    run_order = [k for k in q if k in common and base[k] > 0.05]
    spans, cur = [], []
    for k in run_order:
        if ratios[k] > WAVE_RATIO:
            cur.append(k)
        else:
            if len(cur) >= WAVE_MIN_RUN:
                spans.append(cur)
            cur = []
    if len(cur) >= WAVE_MIN_RUN:
        spans.append(cur)
    for s in spans:
        excess = sum(q[k] - base[k] for k in s)
        print(f"   wave {s[0]}..{s[-1]} ({len(s)} queries, "
              f"+{excess:.0f}s excess)")
    if not spans:
        print("   no wave spans")

mins = {k: min(q[k] for _, q, _ in runs) for k in common}
print(f"\n== min-across-runs")
print(f"   total {sum(mins.values()):.1f}s; median ratio "
      f"{statistics.median(mins[k]/base[k] for k in comp):.2f}x")
suspects = sorted((mins[k] / base[k], k) for k in comp
                  if mins[k] / base[k] > RATIO_SUSPECT)
if suspects:
    print("   REAL suspects (slow in EVERY run — profile these):")
    for r, k in reversed(suspects):
        print(f"     {r:6.1f}x  {k}  (min {mins[k]:.2f}s vs base {base[k]:.2f}s)")
else:
    print("   no query is slow in every run — the deltas are waves, "
          "not plan regressions")
