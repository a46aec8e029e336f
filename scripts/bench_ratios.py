#!/usr/bin/env python3
"""Compare a graft.Bench JSON line against BASELINE.md's per-query floors.

Usage:
  SPARK_GRAFT_SF_DIR=... sbt -batch "runMain graft.Bench" | grep metric | python3 scripts/bench_ratios.py
  python3 scripts/bench_ratios.py < bench_line.json

Prints the worst floor ratios and exits non-zero if any query exceeds
the 2x gate — the per-round check the driver's judge applies.
"""
import json
import re
import sys


def main() -> int:
    line = sys.stdin.read()
    start = line.index("{")
    bench = json.loads(line[start:])
    floors = {}
    with open("BASELINE.md") as f:
        for row in f:
            m = re.match(r"\| (q\d+\w+) \| ([\d.]+) \|", row)
            if m:
                floors[m.group(1)] = float(m.group(2))
    rows = []
    missing = []
    for q, v in bench["queries"].items():
        if q in floors:
            rows.append((v / floors[q], q, v, floors[q]))
        else:
            missing.append(q)
    rows.sort(reverse=True)
    print(f"total {bench['value']:.1f}s  queries {len(bench['queries'])}  "
          f"failed {bench.get('failed')}")
    for r, q, v, f in rows[:10]:
        print(f"  {r:5.2f}x  {q}  {v:.2f}s vs floor {f:.2f}s")
    over = [q for r, q, _, _ in rows if r > 2.0]
    if missing:
        print("no floor recorded (add to BASELINE.md):", ", ".join(sorted(missing)))
    if over:
        print("OVER 2x GATE:", ", ".join(over))
        return 1
    print("all queries within the 2x gate")
    return 0


if __name__ == "__main__":
    sys.exit(main())
