#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (Spark result), runs the paired SQL
from oracle_sql.json in DuckDB over the sf parquet tables, and compares:
column names (sorted), row count, and values (exact; doubles compared
bit-for-bit first, then with 1e-9 rel tolerance reported separately).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # Normalize types for comparison: Decimal -> float-ish string, etc.
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    return v

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            continue
        # reorder got columns to oracle order by name
        gidx = [got_cols.index(c) for c in want_cols]
        got2 = [tuple(norm(r[i]) for i in gidx) for r in got]
        want2 = [tuple(norm(v) for v in r) for r in want]
        if len(got2) != len(want2):
            print(f"FAIL {name}: rows {len(got2)} != {len(want2)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, w) in enumerate(zip(got2, want2)):
            if g != w:
                bad = (i, g, w)
                break
        if bad:
            # also try sorted-row compare to distinguish order-only diffs
            order_only = sorted(map(repr, got2)) == sorted(map(repr, want2))
            print(f"FAIL {name}: row {bad[0]} differs (order_only={order_only})\n"
                  f"  spark : {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got2)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
