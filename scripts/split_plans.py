#!/usr/bin/env python3
"""Split an ExplainDump output file into per-query plan files.

Usage: split_plans.py <dump.txt> <outdir> <suffix> q_a q_b ...
Writes <outdir>/<query>_<suffix>.txt for each requested query.
"""
import sys
import os
import re


def main() -> None:
    dump, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    wanted = set(sys.argv[4:])
    os.makedirs(outdir, exist_ok=True)
    with open(dump, encoding="utf-8") as fh:
        text = fh.read()
    parts = re.split(r"^==== (q_[a-z0-9_]+) ====", text, flags=re.M)
    # parts = [prefix, name1, body1, name2, body2, ...]
    found = set()
    for i in range(1, len(parts) - 1, 2):
        name, body = parts[i], parts[i + 1]
        if name in wanted:
            out = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(out, "w", encoding="utf-8") as o:
                o.write(f"==== {name} ({suffix}) ====\n{body.strip()}\n")
            found.add(name)
    missing = wanted - found
    if missing:
        print(f"WARNING: not found in {dump}: {sorted(missing)}")
    print(f"wrote {len(found)} plan files to {outdir}")


if __name__ == "__main__":
    main()
