#!/usr/bin/env python3
"""Per-query scaling report: sf1 (10x) bench vs the sf0.1 record.

Usage: scaling_report.py BENCH_DETAIL_sf1.json BENCH_DETAIL_sf01.json
Reads the min-of-two per-query series from both detail files and
prints a table of ratios, flagging anything > 15x (the VERDICT r6
threshold for "possibly corpus-quadratic").
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d["queries_min"]


def main():
    sf1, sf01 = load(sys.argv[1]), load(sys.argv[2])
    rows = []
    for q in sorted(sf01):
        if q in sf1:
            r = sf1[q] / sf01[q] if sf01[q] > 0 else float("inf")
            rows.append((q, sf01[q], sf1[q], r))
    rows.sort(key=lambda x: -x[3])
    print(f"{'query':28s} {'sf0.1 s':>9s} {'sf1 s':>9s} {'ratio':>7s}")
    flagged = 0
    for q, a, b, r in rows:
        flag = " <-- >15x" if r > 15 else ""
        flagged += r > 15
        print(f"{q:28s} {a:9.3f} {b:9.3f} {r:7.2f}{flag}")
    t0, t1 = sum(sf01[q] for q, *_ in rows), sum(sf1[q] for q, *_ in rows)
    print(f"\ntotal: sf0.1 {t0:.2f} s -> sf1 {t1:.2f} s = {t1 / t0:.2f}x "
          f"on a 10x data decade; {flagged} queries above 15x")


if __name__ == "__main__":
    main()
