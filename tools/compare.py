#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each Spark result parquet under OUT_DIR/<name>/, runs the matching
oracle SQL (OUT_DIR/oracle_sql.json) in DuckDB against the sfDir parquet
tables, sorts columns by name (like the driver), and compares row values
exactly. Exit 0 iff everything matches.

Usage: python3 tools/compare.py <sfDir> <outDir> [name ...]
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    failures, passed, skipped = [], 0, 0
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            failures.append((name, "no spark output parquet")); continue
        spark_df = con.sql(
            f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            skipped += 1
            if len(spark_df) == 0:
                failures.append((name, "rows-only check: 0 rows"))
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}")); continue
        s = spark_df[sorted(spark_df.columns)]
        o = oracle_df[sorted(oracle_df.columns)]
        if list(s.columns) != list(o.columns):
            failures.append((name, f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}"))
            continue
        if len(s) != len(o):
            failures.append((name, f"row count differs: spark={len(s)} oracle={len(o)}"))
            continue
        mismatch = None
        for col in s.columns:
            sv, ov = s[col].tolist(), o[col].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                ok = (a == b) or (a is None and b is None)
                if not ok:
                    try:
                        import math
                        ok = (isinstance(a, float) and isinstance(b, float)
                              and math.isnan(a) and math.isnan(b))
                    except Exception:
                        ok = False
                if not ok and hasattr(a, "__len__") and hasattr(b, "__len__") \
                        and not isinstance(a, str):
                    ok = list(a) == list(b)
                if not ok:
                    mismatch = f"col {col} row {i}: spark={a!r} oracle={b!r}"
                    break
            if mismatch:
                break
        if mismatch:
            failures.append((name, mismatch))
        else:
            passed += 1
            print(f"  [ok] {name}: {len(s)} rows")
    print(f"\n{passed} matched, {skipped} rows-only, {len(failures)} FAILED")
    for n, msg in failures:
        print(f"  FAIL {n}: {msg}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
