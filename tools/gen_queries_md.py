#!/usr/bin/env python3
"""Regenerate QUERIES.md from the query sources: one row per QueryDef with
its group, check kind, and the first sentence of its leading comment."""
import re, glob

rows = []
for f in sorted(glob.glob('src/main/scala/graft/queries/*.scala')):
    lines = open(f).read().split('\n')
    for i, ln in enumerate(lines):
        m = re.search(r'QueryDef(?:\.rowsOnly)?\(\s*"(q\d+_[a-z0-9_]+)"', ln)
        if not m:
            continue
        name = m.group(1)
        rows_only = '.rowsOnly' in ln
        desc = []
        j = i - 1
        while j >= 0 and lines[j].strip().startswith('//'):
            desc.insert(0, lines[j].strip().lstrip('/ '))
            j -= 1
        first = ' '.join(desc)
        # protect abbreviation periods ("et al. 2021") from the sentence split
        guarded = first.replace('et al. ', 'et al.\x00')
        sent = re.split(r'(?<=[.;]) ', guarded)[0] if first else ''
        sent = sent.replace('\x00', ' ').rstrip('.;,')
        mod = f.split('/')[-1].replace('.scala', '')
        rows.append((name, mod, sent, 'rows-only' if rows_only else 'oracle'))

rows.sort()
with open('QUERIES.md', 'w') as out:
    out.write('# QUERIES — full catalog\n\n')
    out.write(f'{len(rows)} named queries (SparkEntry.queries). "oracle" = hash-compared'
              ' against DuckDB at sf0.01 (the t2 gate); "rows-only" = driver rows>0 check.\n'
              'Generated from the query sources — regenerate with tools/gen_queries_md.py.\n\n')
    out.write('| query | group | check | what it does |\n|---|---|---|---|\n')
    for name, mod, sent, chk in rows:
        out.write(f'| `{name}` | {mod} | {chk} | {sent} |\n')
print(f'{len(rows)} rows written')
