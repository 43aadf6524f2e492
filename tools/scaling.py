#!/usr/bin/env python3
"""Scaling-ratio table between two bench JSONs (e.g. sf1 -> sf10).

Usage: python3 tools/scaling.py BENCH_sf1.json BENCH_sf10.json [growth]

Prints per-query seconds at both scales and the ratio, sorted by ratio
descending, plus the median ratio and the count exceeding `growth`
(default 10 = linear-in-data budget for a 10x step).
"""
import json, sys
from statistics import median


def main():
    a, b = json.load(open(sys.argv[1])), json.load(open(sys.argv[2]))
    growth = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa, qb = a["queries"], b["queries"]
    # floor zero/near-zero baselines instead of dividing by them: a query
    # recorded as 0.0 s at the low scale would otherwise crash the whole
    # report inside the sort key; flag the floored ones explicitly
    def ratio(q):
        return qb[q] / max(qa[q], 1e-3)
    common = sorted(set(qa) & set(qb), key=lambda q: -ratio(q))
    ratios = [ratio(q) for q in common]
    print(f"{'query':30s} {'lo_s':>8s} {'hi_s':>8s} {'ratio':>7s}")
    for q in common:
        flag = " <-- superlinear" if ratio(q) > growth else ""
        if qa[q] < 1e-3:
            flag += " [zero baseline floored]"
        print(f"{q:30s} {qa[q]:8.2f} {qb[q]:8.2f} {ratio(q):7.2f}{flag}")
    print(f"\nqueries={len(common)} median_ratio={median(ratios):.2f} "
          f"over_{growth:g}x={sum(r > growth for r in ratios)}")


if __name__ == "__main__":
    main()
