#!/usr/bin/env python3
"""Per-query scaling report between two Bench JSON outputs (builder tooling).

Usage: python3 tools/scaling_report.py bench_sf01.json bench_sf1.json [factor]

Prints queries sorted by ratio (worst first) with a super-linear flag:
ratio > 1.2 * factor for queries whose small-scale time is large enough for
the ratio to mean anything (>= 0.2 s — below that, stage-scheduling constants
dominate and a "ratio" is noise over noise).
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
qa, qb = a["queries"], b["queries"]
rows = []
for name in sorted(qa):
    ta, tb = qa.get(name, -1), qb.get(name, -1)
    if ta is None or tb is None or ta < 0 or tb < 0:
        rows.append((float("inf"), name, ta, tb, "MISSING/FAILED"))
        continue
    ratio = tb / ta if ta > 0 else float("inf")
    flag = ""
    if ta >= 0.2 and ratio > 1.2 * factor:
        flag = "SUPER-LINEAR"
    elif ta < 0.2 and tb >= 2.0:
        flag = "grew-from-noise"
    rows.append((ratio, name, ta, tb, flag))
rows.sort(reverse=True)
print(f"{'query':34s} {'small':>8s} {'large':>8s} {'ratio':>7s}  flag")
for ratio, name, ta, tb, flag in rows:
    r = f"{ratio:7.2f}" if ratio != float("inf") else "    inf"
    print(f"{name:34s} {ta:8.3f} {tb:8.3f} {r}  {flag}")
ta_tot = sum(v for v in qa.values() if v and v > 0)
tb_tot = sum(v for v in qb.values() if v and v > 0)
print(f"\ntotal {ta_tot:.1f}s -> {tb_tot:.1f}s = {tb_tot/ta_tot:.2f}x "
      f"for {factor:.0f}x data; loadavg {a.get('loadavg1')} -> {b.get('loadavg1')}")
