#!/usr/bin/env python3
"""Dev-only checker that mimics the driver's DuckDB-oracle compare:
runs each oracle SQL from Verify's oracle_sql.json against the same sf
parquet tables, loads the Spark result parquet, sorts columns by name,
and value-compares. NOT part of the Spark library (driver-side python).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    # sort columns by name (driver behavior), then normalize values
    df = df[sorted(df.columns)]
    def fix(v):
        if isinstance(v, float):
            return round(v, 6)
        return v
    return [tuple(fix(v) for v in row) for row in df.itertuples(index=False)]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            sp = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
            du = con.sql(sql).df()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        a, b = norm(sp), norm(du)
        if sorted(map(str, a)) == sorted(map(str, b)):
            print(f"PASS     {name} ({len(a)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL     {name}: spark {len(a)} rows vs oracle {len(b)} rows")
            sa, sb = set(map(str, a)), set(map(str, b))
            for x in list(sa - sb)[:3]:
                print(f"  spark only:  {x}")
            for x in list(sb - sa)[:3]:
                print(f"  oracle only: {x}")
            if sorted(sp.columns) != sorted(du.columns):
                print(f"  spark cols:  {sorted(sp.columns)}")
                print(f"  oracle cols: {sorted(du.columns)}")
    # queries without oracle get a rows-only check
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(d)
        if name not in oracle and os.path.isdir(d):
            files = glob.glob(f"{d}/*.parquet")
            n = len(con.sql(f"SELECT * FROM '{d}/*.parquet'").df()) if files else 0
            print(f"{'ROWS-OK' if n > 0 else 'EMPTY!'}  {name} ({n} rows, no oracle)")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
