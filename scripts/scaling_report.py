#!/usr/bin/env python3
"""Per-query scaling report across one 10x data decade.

Usage: scaling_report.py SCALED_DETAIL.json BASE_DETAIL.json [scaledLabel baseLabel]
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
    hi, lo = load(sys.argv[1]), load(sys.argv[2])
    hi_label = sys.argv[3] if len(sys.argv) > 3 else "scaled"
    lo_label = sys.argv[4] if len(sys.argv) > 4 else "base"
    # a query present on only one side means the comparison is NOT the
    # full surface — say so loudly instead of silently shrinking the
    # table and totals (the dropped row could be exactly the regression
    # this tool exists to catch)
    for q in sorted(set(lo) - set(hi)):
        print(f"WARNING: {q} missing from {hi_label} — excluded from table and totals")
    for q in sorted(set(hi) - set(lo)):
        print(f"WARNING: {q} missing from {lo_label} — excluded from table and totals")
    shared = sorted(set(lo) & set(hi))
    if not shared:
        sys.exit("no shared queries between the two detail files")
    rows = []
    for q in shared:
        r = hi[q] / lo[q] if lo[q] > 0 else float("inf")
        rows.append((q, lo[q], hi[q], r))
    rows.sort(key=lambda x: -x[3])
    print(f"{'query':28s} {lo_label + ' s':>9s} {hi_label + ' s':>9s} {'ratio':>7s}")
    flagged = 0
    for q, a, b, r in rows:
        flag = " <-- >15x" if r > 15 else ""
        flagged += r > 15
        print(f"{q:28s} {a:9.3f} {b:9.3f} {r:7.2f}{flag}")
    t0, t1 = sum(lo[q] for q, *_ in rows), sum(hi[q] for q, *_ in rows)
    ratio = f"{t1 / t0:.2f}x" if t0 > 0 else "n/a"
    print(f"\ntotal ({len(rows)} shared queries): {lo_label} {t0:.2f} s -> "
          f"{hi_label} {t1:.2f} s = {ratio} "
          f"on a 10x data decade; {flagged} queries above 15x")


if __name__ == "__main__":
    main()
