#!/usr/bin/env python3
"""Dev-only: like-for-like comparison of two bench_out.json anchors
(3-rep medians). Prints total deltas, queries whose median moved more
than the given factor, and queries present on only one side.

Usage: bench_compare.py <old.json> <new.json> [factor=1.3]
"""
import json
import sys


def main(old_path, new_path, factor=1.3):
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    shared = sorted(set(old) & set(new))
    tot_old = sum(old[q] for q in shared)
    tot_new = sum(new[q] for q in shared)
    print(f"shared queries: {len(shared)}")
    print(f"like-for-like total: {tot_old:.1f} s -> {tot_new:.1f} s "
          f"({tot_new / tot_old - 1:+.1%} vs old)")
    movers = [(new[q] / old[q], q) for q in shared
              if new[q] > 0.3 and old[q] > 0.3
              and (new[q] / old[q] > factor or old[q] / new[q] > factor)]
    for r, q in sorted(movers, reverse=True):
        print(f"  {'SLOWER' if r > 1 else 'faster'} {r:5.2f}x  {q}: "
              f"{old[q]:.2f} -> {new[q]:.2f} s")
    for q in sorted(set(new) - set(old)):
        print(f"  NEW   {q}: {new[q]:.2f} s")
    for q in sorted(set(old) - set(new)):
        print(f"  GONE  {q}: {old[q]:.2f} s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.3)
