#!/usr/bin/env python3
"""Split an ExplainAll dump into per-query plan files.

Usage: extract_plans.py DUMP OUTDIR SUFFIX q1,q2,...
Writes OUTDIR/<query>_<SUFFIX>.txt for each named query.
"""
import sys, os, re

dump, outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4].split(",")
os.makedirs(outdir, exist_ok=True)
text = open(dump).read()
sections = re.split(r"^(?:\[info\] )?===== (\S+) =====$", text, flags=re.M)
# sections: [prefix, name1, body1, name2, body2, ...]
found = {}
for i in range(1, len(sections) - 1, 2):
    found[sections[i]] = sections[i + 1]
missing = [n for n in names if n not in found]
if missing:
    sys.exit(f"missing plans for: {missing}")
for n in names:
    body = found[n].strip("\n")
    # strip sbt [info] prefixes if present
    body = re.sub(r"^\[info\] ?", "", body, flags=re.M)
    with open(os.path.join(outdir, f"{n}_{suffix}.txt"), "w") as f:
        f.write(body + "\n")
print(f"wrote {len(names)} plans to {outdir} (*_{suffix}.txt)")
