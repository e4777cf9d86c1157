#!/usr/bin/env python3
"""Round-17 sf1 scaling report: compare the full-suite sparse-sf1 bench
against the same code's sf0.1 capture and flag super-linear queries.

The sf1 fixture carries 10x the rows of sf0.1 (key-offset star tables via
gen_sf1_star.py; sparse-Zipf documents/embeddings via gen_sf1.py), so a
query scaling linearly in data should grow <= ~10x in wall; the verdict's
flag line is >15x (headroom for fixed-cost amortization differences and
single-run noise). Queries BELOW the floor (too fast to scale-read,
<0.15 s at sf0.1) are reported separately rather than ratio-flagged.

Usage: python3 tools/sf1_scaling_report.py <sf01_bench.json> <sf1_bench.json> [out_md]
"""
import json
import sys

sf01 = json.load(open(sys.argv[1]))
sf1 = json.load(open(sys.argv[2]))
out = sys.argv[3] if len(sys.argv) > 3 else "docs/perf/SF1_SCALING_r17.md"

FLAG = 15.0
FLOOR = 0.15

rows = []
for q, t1 in sorted(sf1["queries"].items()):
    t0 = sf01["queries"].get(q)
    if t0 is None or t0 < 0 or t1 < 0:
        rows.append((q, t0, t1, None))
    else:
        rows.append((q, t0, t1, (t1 / t0) if t0 >= FLOOR else None))

flagged = [r for r in rows if r[3] is not None and r[3] > FLAG]
small = [r for r in rows if r[3] is None and r[2] >= 0
         and r[1] is not None and 0 <= r[1] < FLOOR]
failed = sf1.get("failed", [])

with open(out, "w") as f:
    f.write("# SF1 full-suite scaling report (round 17)\n\n")
    f.write(f"- sf0.1 capture: `{sys.argv[1]}` (total {sf01['value']:.1f} s, "
            f"{len(sf01['queries'])} queries)\n")
    f.write(f"- sf1 capture: `{sys.argv[2]}` (total {sf1['value']:.1f} s, "
            f"{len(sf1['queries'])} queries, fixture = 10x rows)\n")
    f.write(f"- failed at sf1: {failed if failed else 'none'}\n")
    f.write(f"- flag threshold: wall ratio > {FLAG}x on queries >= {FLOOR}s at sf0.1\n\n")
    f.write(f"## Flagged super-linear ({len(flagged)})\n\n")
    if flagged:
        f.write("| query | sf0.1 s | sf1 s | ratio |\n|---|---|---|---|\n")
        for q, t0, t1, r in sorted(flagged, key=lambda x: -x[3]):
            f.write(f"| {q} | {t0:.2f} | {t1:.2f} | {r:.1f}x |\n")
    else:
        f.write("none\n")
    f.write(f"\n## All queries by ratio (sub-{FLOOR}s sf0.1 walls ratio-exempt)\n\n")
    f.write("| query | sf0.1 s | sf1 s | ratio |\n|---|---|---|---|\n")
    for q, t0, t1, r in sorted(rows, key=lambda x: -(x[3] or 0)):
        rs = f"{r:.1f}x" if r is not None else "-"
        t0s = f"{t0:.2f}" if t0 is not None and t0 >= 0 else "-"
        t1s = f"{t1:.2f}" if t1 >= 0 else "FAILED"
        f.write(f"| {q} | {t0s} | {t1s} | {rs} |\n")

print(f"wrote {out}: {len(flagged)} flagged, {len(small)} ratio-exempt (tiny), "
      f"{len(failed)} failed")
for q, t0, t1, r in sorted(flagged, key=lambda x: -x[3]):
    print(f"  FLAG {q}: {t0:.2f} -> {t1:.2f} s ({r:.1f}x)")
