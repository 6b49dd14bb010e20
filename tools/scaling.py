#!/usr/bin/env python3
"""Per-query scale-up ratio table: two full Bench artifacts in, a
markdown table out. Usage: scaling.py <bench_small.json> <bench_big.json>
[factor] — factor is the data-size ratio between the two runs (default
10); queries scaling worse than ~linear+shuffle (ratio > 1.2x factor)
are flagged."""
import json, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
flag_at = 1.2 * factor

qs = sorted(set(small["queries"]) & set(big["queries"]))
missing = sorted(set(small["queries"]) ^ set(big["queries"]))
if missing:
    print(f"<!-- WARNING: unmatched queries dropped: {missing} -->")

rows = []
for q in qs:
    a, b = small["queries"][q], big["queries"][q]
    ratio = (b / a) if a > 0 else float("inf")
    rows.append((q, a, b, ratio))

# column labels from the artifacts themselves (their "sf" field is the
# data dir the run measured), not hardcoded scale points
def label(art, fallback):
    sf = str(art.get("sf", fallback))
    return sf.rstrip("/").rsplit("/", 1)[-1] or fallback

la, lb = label(small, "small"), label(big, "big")
print(f"| query | {la} min (s) | {lb} min (s) | ratio (target <= ~{factor:.0f}x) |")
print("| --- | --- | --- | --- |")
for q, a, b, r in sorted(rows, key=lambda t: -t[3]):
    mark = " **SUPER-LINEAR**" if r > flag_at else ""
    print(f"| {q} | {a:.3f} | {b:.3f} | {r:.1f}x{mark} |")

ta, tb = small["value"], big["value"]
print(f"\ntotal: {ta:.1f} s -> {tb:.1f} s ({tb/ta:.1f}x on {factor:.0f}x data); "
      f"{sum(1 for *_, r in rows if r > flag_at)} queries over {flag_at:.0f}x")
