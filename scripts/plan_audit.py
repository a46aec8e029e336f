#!/usr/bin/env python3
"""Plan-smell audit over graft.Explain output (r13 optimization round).

Splits the combined Explain log into per-query plans and flags, per
query: Exchange count, SinglePartition exchanges, SortMergeJoin /
ShuffledHashJoin / BroadcastHashJoin / BroadcastNestedLoopJoin counts,
scans with an empty PushedFilters next to a Filter above them, and
CartesianProduct. Output is one summary row per query, sorted by
(cartesian, smj, exchanges) so the smelliest plans surface first.

Usage: python3 scripts/plan_audit.py /tmp/explain_all.log [--save plans/r13 SUFFIX]
"""
import re
import sys
import os


def split(log_path):
    plans = {}
    name = None
    buf = []
    with open(log_path, errors="replace") as f:
        for line in f:
            m = re.match(r"^========== (\S+) ==========", line)
            if m:
                if name:
                    plans[name] = "".join(buf)
                name = m.group(1)
                buf = []
            elif name:
                buf.append(line)
    if name:
        plans[name] = "".join(buf)
    return plans


def audit(plans):
    rows = []
    for name, p in sorted(plans.items()):
        ex = len(re.findall(r"\bExchange ", p))
        single = len(re.findall(r"Exchange SinglePartition", p))
        smj = len(re.findall(r"\bSortMergeJoin\b", p))
        shj = len(re.findall(r"\bShuffledHashJoin\b", p))
        bhj = len(re.findall(r"\bBroadcastHashJoin\b", p))
        bnl = len(re.findall(r"BroadcastNestedLoopJoin", p))
        cart = len(re.findall(r"CartesianProduct", p))
        scans = len(re.findall(r"Scan parquet", p))
        rdd = len(re.findall(r"Scan ExistingRDD", p))
        nofilt = len(re.findall(r"PushedFilters: \[\]", p))
        failed = "EXPLAIN FAILED" in p
        rows.append((name, ex, single, smj, shj, bhj, bnl, cart, scans, rdd,
                     nofilt, failed))
    return rows


def main():
    log = sys.argv[1]
    plans = split(log)
    if "--save" in sys.argv:
        i = sys.argv.index("--save")
        outdir, suffix = sys.argv[i + 1], sys.argv[i + 2]
        os.makedirs(outdir, exist_ok=True)
        for name, p in plans.items():
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(p)
        print(f"saved {len(plans)} plans to {outdir}/*_{suffix}.txt")
    rows = audit(plans)
    rows.sort(key=lambda r: (-r[7], -r[6], -r[3], -r[1]))
    hdr = ("query", "Exch", "1Part", "SMJ", "SHJ", "BHJ", "BNLJ", "Cart",
           "pqScan", "rddScan", "noPush", "FAILED")
    print(("%-34s" + "%6s" * 10 + " %s") % hdr)
    for r in rows:
        print(("%-34s" + "%6d" * 10 + " %s") % (r[:11] + ("FAIL" if r[11] else "",)))
    print(f"\n{len(rows)} plans; totals: exchanges={sum(r[1] for r in rows)} "
          f"smj={sum(r[3] for r in rows)} cart={sum(r[7] for r in rows)} "
          f"failed={sum(1 for r in rows if r[11])}")


if __name__ == "__main__":
    main()
