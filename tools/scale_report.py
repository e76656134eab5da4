#!/usr/bin/env python3
"""Generate the scaling-trio exponent table for docs/SCALE.md.

Usage: python3 tools/scale_report.py BENCH_sf0.1.json BENCH_sf0.2.json BENCH_sf1.json

Reads the three bench JSONs (per-query MEDIANS — the spread-aware
aggregate), buckets queries into the SURVEY families, and prints a
markdown table of per-family totals at 1x/2x/10x with the fitted
exponent (log-log slope between the 1x and 10x points). Queries cheaper
than FLOOR seconds at sf1 are still counted in family totals but are
excluded from the per-query worst-ratio line (a 0.04 s query's ratio is
fixed-overhead noise, not a scaling signal).
"""
import json, math, re, sys

FLOOR = 0.4
FAMS = [
    ("scan_|project|filter_|limit_|sort_", "Scans/order"),
    ("agg_", "Aggregation"),
    ("join_|subquery_|merge_", "Joins"),
    ("tpch_", "TPC-H"),
    ("window_|sessionize_|resample_", "Windows"),
    ("events_|retention_|scd2_|lm_|rfm_", "Analytics/LM"),
    ("graph_|basket_", "Graph"),
    ("dedup_", "Dedup"),
    ("sim_|embedding_|cluster_profile", "Similarity"),
    ("text_|corpus_|sample_|pack_|decontaminate|quality_|split_|data_profile|curation_|shard_",
     "Text/curation"),
    ("mm_", "Multimodal"),
    ("stream_", "Streaming"),
    ("", "Other"),
]

runs = [json.load(open(p)) for p in sys.argv[1:4]]
qs = [r.get("queries_median", r["queries"]) for r in runs]
names = [n for n in qs[0] if all(n in q and q[n] >= 0 for q in qs)]
errored = [n for n in qs[0] if any(q.get(n, -1) < 0 for q in qs)]

def fam(n):
    for pat, title in FAMS:
        if pat and re.match(f"^({pat})", n):
            return title
    return "Other"

rows = []
for _, title in FAMS:
    members = [n for n in names if fam(n) == title]
    if not members:
        continue
    t = [sum(q[n] for n in members) for q in qs]
    expo = math.log(t[2] / t[0]) / math.log(10) if t[0] > 0 else float("nan")
    rows.append((title, len(members), t[0], t[1], t[2], expo))

print("| Family | n | sf0.1 s | sf0.2 s | sf1 s | exponent (1x→10x) |")
print("|---|---|---|---|---|---|")
for title, n, a, b, c, e in sorted(rows, key=lambda r: -r[4]):
    print(f"| {title} | {n} | {a:.1f} | {b:.1f} | {c:.1f} | {e:.2f} |")
tot = [sum(q[n] for n in names) for q in qs]
print(f"| **suite** | {len(names)} | **{tot[0]:.1f}** | **{tot[1]:.1f}** "
      f"| **{tot[2]:.1f}** | **{math.log(tot[2]/tot[0])/math.log(10):.2f}** |")

big = [(qs[2][n] / max(qs[0][n], 1e-3), n) for n in names if qs[2][n] >= FLOOR]
big.sort(reverse=True)
print()
print(f"Worst per-query 10x ratios (sf1 >= {FLOOR}s; 10.0 = linear):")
for r, n in big[:12]:
    print(f"- {n}: {qs[0][n]:.2f} -> {qs[2][n]:.2f} s (x{r:.1f}, "
          f"exponent {math.log(max(r,1e-9))/math.log(10):.2f})")
above = [n for r, n in big if r > 10.5]
print()
print(f"Queries above linear (ratio > 10.5): {above if above else 'none'}")
if errored:
    print(f"ERRORED somewhere in the trio: {errored}")
