#!/usr/bin/env python3
"""Per-query diff of two graft bench_full artifacts.

Usage: bench_diff.py BEFORE.json AFTER.json [topN]
Prints total/median ratio and the biggest movers in both directions.
"""
import json
import statistics
import sys


def load(p):
    with open(p) as f:
        return json.load(f)["queries"]


def main():
    before, after = load(sys.argv[1]), load(sys.argv[2])
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    shared = sorted(set(before) & set(after))
    ratios = {q: after[q] / before[q] for q in shared if before[q] > 0}
    tb, ta = sum(before[q] for q in shared), sum(after[q] for q in shared)
    print(f"shared={len(shared)}  total {tb:.1f}s -> {ta:.1f}s "
          f"(ratio {ta / tb:.3f})  median ratio "
          f"{statistics.median(ratios.values()):.3f}")
    movers = sorted(ratios.items(), key=lambda kv: kv[1])
    print(f"\n-- top {top} improvements --")
    for q, r in movers[:top]:
        print(f"{r:6.3f}  {before[q]:7.3f} -> {after[q]:7.3f}  {q}")
    print(f"\n-- top {top} regressions --")
    for q, r in movers[-top:][::-1]:
        print(f"{r:6.3f}  {before[q]:7.3f} -> {after[q]:7.3f}  {q}")
    gain = sum(before[q] - after[q] for q in shared if after[q] < before[q])
    loss = sum(after[q] - before[q] for q in shared if after[q] > before[q])
    print(f"\nimprovement mass {gain:.1f}s vs regression mass {loss:.1f}s")


if __name__ == "__main__":
    main()
