#!/usr/bin/env python3
"""Generate the scaling-ladder exponent table for docs/SCALE.md.

Usage: python3 tools/scale_report.py BENCH_sf0.1.json BENCH_sf0.2.json BENCH_sf1.json [BENCH_sf2.json]
       ... --inject   # also splice the output into docs/SCALE.md between
                      # the SCALE_LADDER_TABLE / SCALE_LADDER_NOTES markers

Reads the bench JSONs (per-query MEDIANS — the spread-aware aggregate),
buckets queries into the SURVEY families, and prints a markdown table of
per-family totals at 1x/2x/10x[/20x] with the fitted exponent (log-log
slope between the 1x and 10x points) and, when the 20x point is given,
the sf2/sf1 ratio — the post-threshold discriminator (a ~2.0 ratio after
a >10 sf1/sf0.1 ratio is a topology/memory STEP followed by linear
growth, not a superlinear term). Queries cheaper than FLOOR seconds at
sf1 are excluded from the per-query worst-ratio list (fixed-overhead
noise, not scaling signal).
"""
import io, json, math, re, sys

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
    ("text_|corpus_|sample_|pack_|decontaminate|quality_|split_|data_profile|curation_|shard_|tokenizer_",
     "Text/curation"),
    ("mm_", "Multimodal"),
    ("stream_|watermark_", "Streaming"),
    ("", "Other"),
]

args = sys.argv[1:]
inject = "--inject" in args
force = "--force-cross-generation" in args
paths = [a for a in args if not a.startswith("--")]
runs = [json.load(open(p)) for p in paths]

# Generation gate (round-11 verdict #2): every rung records the fixture
# generation it was measured on — fixture_src_fp for ScaleFixture-derived
# ladder fixtures (the SOURCE generation), fixture_fp for the sf0.1 rung
# itself. Rungs from different generations are not comparable (the r11
# regeneration made the graph ~2x denser and read as a phantom 2-5x
# regression); refuse to fit exponents across them.
gens = [r.get("fixture_src_fp") or r.get("fixture_fp") for r in runs]
unstamped = [p for p, g in zip(paths, gens) if g is None]
if unstamped:
    print(f"WARNING: unstamped rung(s) (pre-fingerprint bench files) — "
          f"generation cannot be verified: {unstamped}", file=sys.stderr)
stamped = sorted(set(g for g in gens if g))
if len(stamped) > 1 and not force:
    print("GENERATION MISMATCH — refusing to fit a ladder across fixture "
          "generations:", file=sys.stderr)
    for p, g in zip(paths, gens):
        print(f"  {p}: {g or 'unstamped'}", file=sys.stderr)
    print("Re-measure every rung on the current generation (ScaleFixture + "
          "Bench), or pass --force-cross-generation to override.",
          file=sys.stderr)
    sys.exit(2)

if inject:
    _buf = io.StringIO()
    _stdout, sys.stdout = sys.stdout, _buf
qs = [r.get("queries_median", r["queries"]) for r in runs]
has20 = len(qs) >= 4
names = [n for n in qs[0] if all(n in q and q[n] >= 0 for q in qs)]
errored = sorted(set(n for q in qs for n in q if q.get(n, 0) < 0))

def fam(n):
    for pat, title in FAMS:
        if pat and re.match(f"^({pat})", n):
            return title
    return "Other"

cols = ["sf0.1 s", "sf0.2 s", "sf1 s"] + (["sf2 s"] if has20 else [])
print("| Family | n | " + " | ".join(cols) +
      " | exp (1x→10x) |" + (" sf2/sf1 |" if has20 else ""))
print("|---" * (len(cols) + 3) + ("|---|" if has20 else "|"))
rows = []
for _, title in FAMS:
    members = [n for n in names if fam(n) == title]
    if not members:
        continue
    t = [sum(q[n] for n in members) for q in qs]
    expo = math.log(t[2] / t[0]) / math.log(10) if t[0] > 0 else float("nan")
    rows.append((title, len(members), t, expo))
for title, n, t, e in sorted(rows, key=lambda r: -r[2][2]):
    vals = " | ".join(f"{x:.1f}" for x in t)
    extra = f" {t[3]/t[2]:.2f} |" if has20 else ""
    print(f"| {title} | {n} | {vals} | {e:.2f} |{extra}")
tot = [sum(q[n] for n in names) for q in qs]
vals = " | ".join(f"**{x:.1f}**" for x in tot)
extra = f" **{tot[3]/tot[2]:.2f}** |" if has20 else ""
print(f"| **suite** | {len(names)} | {vals} | "
      f"**{math.log(tot[2]/tot[0])/math.log(10):.2f}** |{extra}")

big = [(qs[2][n] / max(qs[0][n], 1e-3), n) for n in names if qs[2][n] >= FLOOR]
big.sort(reverse=True)
print()
print(f"Worst per-query 1x→10x ratios (sf1 >= {FLOOR}s; 10.0 = linear):")
for r, n in big[:12]:
    post = f", sf2/sf1 {qs[3][n]/qs[2][n]:.2f}" if has20 else ""
    print(f"- {n}: {qs[0][n]:.2f} -> {qs[2][n]:.2f} s (x{r:.1f}{post})")
above = [n for r, n in big if r > 10.5]
print()
print(f"Queries above linear at 10x (ratio > 10.5): {above if above else 'none'}")
if has20 and above:
    print("Post-10x growth for those (2.0 = linear): " +
          ", ".join(f"{n} {qs[3][n]/qs[2][n]:.2f}x" for n in above))
if errored:
    print(f"ERRORED somewhere in the ladder: {errored}")
if stamped:
    print(f"\nFixture generation: {stamped[0]}"
          + (" (some rungs unstamped)" if unstamped else ""))

if inject:
    sys.stdout = _stdout
    out = _buf.getvalue().rstrip()
    table_end = out.index("\n\n")
    table, notes = out[:table_end], out[table_end + 2:]
    doc = open("docs/SCALE.md").read()
    def splice(doc, marker, body):
        begin = f"<!-- {marker} -->"
        end = f"<!-- {marker}_END -->"
        block = begin + "\n" + body + "\n" + end
        if end in doc:
            import re as _re
            return _re.sub(_re.escape(begin) + ".*?" + _re.escape(end),
                           lambda _: block, doc, flags=_re.S)
        return doc.replace(begin, block)
    doc = splice(doc, "SCALE_LADDER_TABLE", table)
    doc = splice(doc, "SCALE_LADDER_NOTES", notes)
    open("docs/SCALE.md", "w").write(doc)
    print(out)
    print("\n[injected into docs/SCALE.md]")
