#!/usr/bin/env python3
"""Split an ExplainDump all-queries file into per-query plan files.

Usage: extract_plans.py <dump.txt> <outdir> <suffix> q1 q2 ...
Writes <outdir>/<query>_<suffix>.txt for each requested query.
"""
import sys, os, re

dump, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
wanted = set(sys.argv[4:])
os.makedirs(outdir, exist_ok=True)
text = open(dump, errors="replace").read()
sections = re.split(r"^==== (\S+) ====\s*$", text, flags=re.M)
# sections: [prefix, name1, body1, name2, body2, ...]
found = set()
for i in range(1, len(sections) - 1, 2):
    name, body = sections[i], sections[i + 1]
    if name in wanted:
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"==== {name} ====\n{body.strip()}\n")
        found.add(name)
missing = wanted - found
if missing:
    print(f"MISSING: {sorted(missing)}")
print(f"wrote {len(found)} plans to {outdir} (suffix {suffix})")
