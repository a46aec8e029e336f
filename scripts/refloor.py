#!/usr/bin/env python3
"""Re-seed BASELINE.md's per-query floors from same-day quiet passes.

Usage:
  python3 scripts/refloor.py pass1.json pass2.json pass3.json

The r8 verdict's diagnosis: ratchet-down-only all-time-min floors
accumulate lucky minima, so the false-flag rate grows every round
(6 flags in r7, 46 in r8). The fix (r9 protocol): the FLOOR a query
is gated against is the MEDIAN of >=3 same-day passes on the round's
final code; the all-time minimum is kept as a separate history column
(min of the old floor and today's fastest pass). A persistent >2x
flag against a median floor is then a real signal and triggers an A/B
against the previous round's commit instead of a judgment call.

Rewrites the `| query | floor ... | all-time min | note |` table rows
in BASELINE.md in place; everything else in the file is untouched.
Queries present in the table but absent from every pass keep their
old floor. New queries found in the passes are appended with an empty
note.
"""
import json
import re
import statistics
import sys

ROW = re.compile(r"^\| (q\d+\w*) \| ([\d.]+) \|(?: ([\d.]+) \|)? ?(.*?) ?\|$")
HEADER = re.compile(r"^\| query \| (floor|min best-of-3)[^|]*\|")


def main() -> int:
    passes = []
    for p in sys.argv[1:]:
        with open(p) as f:
            passes.append(json.load(f)["queries"])
    if len(passes) < 3:
        print("need >=3 pass JSON files", file=sys.stderr)
        return 1

    with open("BASELINE.md", encoding="utf-8") as f:
        lines = f.readlines()

    seen = set()
    out = []
    in_floor_table = False
    for line in lines:
        if HEADER.match(line):
            in_floor_table = True
            out.append("| query | floor (median of same-day passes) | all-time min | note |\n")
            continue
        if in_floor_table and line.startswith("|---"):
            out.append("|---|---|---|---|\n")
            continue
        m = ROW.match(line.rstrip("\n")) if in_floor_table else None
        if in_floor_table and not line.startswith("|"):
            # table ended: append queries the passes know but the table lacks
            for q in sorted({k for ps in passes for k in ps} - seen):
                vals = [ps[q] for ps in passes if ps.get(q, -1) >= 0]
                if vals:
                    out.append(f"| {q} | {statistics.median(vals):.2f} | {min(vals):.2f} |  |\n")
            in_floor_table = False
        if m:
            q, old_floor, old_min, note = m.groups()
            seen.add(q)
            vals = [ps[q] for ps in passes if ps.get(q, -1) >= 0]
            alltime = min([float(old_min if old_min else old_floor)] + vals)
            floor = statistics.median(vals) if vals else float(old_floor)
            out.append(f"| {q} | {floor:.2f} | {alltime:.2f} | {note} |\n")
        else:
            out.append(line)

    with open("BASELINE.md", "w", encoding="utf-8") as f:
        f.writelines(out)
    print(f"re-floored {len(seen)} queries from {len(passes)} passes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
