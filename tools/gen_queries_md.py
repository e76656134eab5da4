#!/usr/bin/env python3
"""Regenerate docs/QUERIES.md from a Verify dump.

Usage: python3 tools/gen_queries_md.py <verifyOutDir>
(run `sbt 'runMain graft.Verify <sfDir> <verifyOutDir>'` first)
"""
import json, glob, os, re, sys
import duckdb

out = sys.argv[1]
oracle = json.load(open(f'{out}/oracle_sql.json'))
names = sorted(os.path.basename(p) for p in glob.glob(f'{out}/*')
               if os.path.isdir(p))
con = duckdb.connect()
fams = [
    ('scan_|project|filter_|limit_|sort_limit|sort_global', 'Scans, filters & ordering'),
    ('agg_', 'Aggregation'),
    ('join_|tpch_|subquery_|merge_', 'Joins, subqueries & merge'),
    ('window_|sessionize_|resample_', 'Windows & time series'),
    ('events_|retention_|scd2_|lm_|rfm_|session_stats|profile_key_skew|privacy_',
     'Product analytics & LM statistics'),
    ('graph_|basket_', 'Graph analytics'),
    ('set_|distinct_|pivot_|unpivot_|explode_|array_|json_|scalar_|result_|source_|compact_|layout_|table_checksum|catalog_checksum',
     'Relational scalars, reshaping & sources'),
    ('dedup_', 'Deduplication'),
    ('sim_|embedding_|cluster_profile', 'Similarity & embeddings'),
    ('text_|corpus_|sample_|pack_|decontaminate|quality_|split_|data_profile|curation_|tokenizer_|lang_id_',
     'Text analysis & corpus curation'),
    ('shard_', 'Sharding & export'),
    ('mm_', 'Multimodal'),
    ('stream_|watermark_', 'Structured Streaming'),
]
lines = ["# Query inventory", "",
         "One row per `SparkEntry.queries` entry; every query is DuckDB-oracle-checked",
         "(`rows` = result rows at sf0.01). Self-validating queries embed their own",
         "tolerance contract (sketch vs exact) in the result. Regenerate:",
         "`sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/v'` then",
         "`python3 tools/gen_queries_md.py /tmp/v`.", ""]
used = set()
for pat, title in fams:
    rx = re.compile(f'^({pat})')
    members = [n for n in names if rx.match(n) and n not in used]
    used.update(members)
    if not members:
        continue
    lines += [f"## {title}", "", "| query | rows @ sf0.01 |", "|---|---|"]
    for n in members:
        c = con.execute(f"SELECT count(*) FROM '{out}/{n}/*.parquet'").fetchone()[0]
        lines.append(f"| `{n}` | {c} |")
    lines.append("")
left = [n for n in names if n not in used]
assert not left, f"unclassified queries: {left}"
lines.append(f"**Total: {len(names)} queries, {len(oracle)} with declared SQL oracles.**")
open('docs/QUERIES.md', 'w').write("\n".join(lines) + "\n")
print(f"{len(names)} queries written to docs/QUERIES.md")
