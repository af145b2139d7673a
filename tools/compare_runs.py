#!/usr/bin/env python3
"""Compare two graft.Verify output dirs query-by-query (driver-side tool,
like check_oracle.py — python/duckdb are driver-only, never library deps).

Used for the round-15 multi-JVM gate: the same 297 queries run once under
local[*] and once under local-cluster[n,c,m] (real executor JVMs) must be
VALUE-IDENTICAL, not merely both-oracle-passing. The compare mirrors the
driver's discipline: per query, an order-insensitive aggregate hash over
name-sorted columns plus the row count.

Usage: compare_runs.py <dirA> <dirB>
"""
import sys, os
import duckdb

def main() -> int:
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(d for d in os.listdir(a)
                   if os.path.isdir(os.path.join(a, d)))
    con = duckdb.connect()

    def sig(path: str):
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{path}/*.parquet')"
        ).fetchall()]
        cl = ", ".join(f'"{c}"' for c in sorted(cols))
        n, h = con.execute(
            f"SELECT count(*), sum(hash(ROW({cl}))) "
            f"FROM read_parquet('{path}/*.parquet')").fetchone()
        return tuple(sorted(cols)), n, h

    differ = 0
    for name in names:
        pb = os.path.join(b, name)
        if not os.path.isdir(pb):
            print(f"MISSING   {name}: absent in {b}")
            differ += 1
            continue
        sa, sb = sig(os.path.join(a, name)), sig(pb)
        if sa == sb:
            print(f"IDENTICAL {name} ({sa[1]} rows)")
        else:
            print(f"DIFFER    {name}: {sa} vs {sb}")
            differ += 1
    print(f"\n{len(names) - differ} identical / {differ} differ")
    return 1 if differ else 0

if __name__ == "__main__":
    sys.exit(main())
