#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each Spark result parquet under OUT_DIR/<name>/, runs the matching
oracle SQL (OUT_DIR/oracle_sql.json) in DuckDB against the sfDir parquet
tables, sorts columns by name (like the driver), and compares row values
exactly AND result types. Exit 0 iff everything matches.

The type check is the round-5 lesson: the driver's hash is type-sensitive,
so a DuckDB HUGEINT (e.g. from an un-cast sum()) vs Spark BIGINT fails the
driver even when every value matches. Both sides are read through DuckDB
here, so we compare DuckDB type names column-by-column, modulo equivalences
that the driver's own canonicalization tolerates (see TYPE_NORM).

Usage: python3 tools/compare.py <sfDir> <outDir> [name ...]
"""
import sys, os, json, glob, re, struct
import duckdb


def _float_bits_eq(a, b):
    """Bit-exact double compare — the round-13 lesson: the driver hashes a
    STRING render, so -0.0 vs +0.0 (Python ==-equal) is a driver FAIL.
    NaN-vs-NaN is handled by the null canonicalization path, not here."""
    return struct.pack("<d", a) == struct.pack("<d", b)

# Equivalences the driver tolerates (pandas canonicalization makes these
# indistinguishable to its hash). Anything NOT listed — notably
# HUGEINT vs BIGINT — is a real driver-visible divergence.
#  - Spark writes timestamps as UTC-adjusted int64 → DuckDB reads
#    TIMESTAMP WITH TIME ZONE; DuckDB computes plain TIMESTAMP. Sessions
#    are UTC on both sides, so the instants are identical.
#  - Spark FLOAT[] embeddings vs DuckDB list_transform output DOUBLE[]
#    only appear inside value-compared array columns.
#  - TINYINT/SMALLINT/INTEGER/BIGINT all land in pandas int64 (Spark
#    rank() is INT, DuckDB's is BIGINT — r5-green queries prove the
#    driver tolerates it). HUGEINT does NOT fold: pandas widens it to
#    float64/object, which is exactly the pack_chunks r5 failure.
#  - DATE folds into TIMESTAMP (datetime64 either way; fn_date was
#    r5-green with a DATE month_start vs Spark's TIMESTAMP).
def _norm(t):
    t = str(t)
    t = t.replace("TIMESTAMP WITH TIME ZONE", "TIMESTAMP")
    t = t.replace("TIMESTAMP_NS", "TIMESTAMP")
    t = re.sub(r"\bFLOAT\b", "DOUBLE", t)
    t = re.sub(r"\b(TINYINT|SMALLINT|INTEGER)\b", "BIGINT", t)
    t = re.sub(r"\bDATE\b", "TIMESTAMP", t)
    return t

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Pin the oracle session zone: the Spark side runs a UTC-pinned
    # session, and any oracle SQL touching TIMESTAMPTZ rendering must not
    # inherit whatever zone the host happens to be in.
    con.execute("SET TimeZone='UTC'")
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
        spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        spark_types = dict(zip(spark_rel.columns,
                               [_norm(t) for t in spark_rel.types]))
        spark_df = spark_rel.df()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            skipped += 1
            if len(spark_df) == 0:
                failures.append((name, "rows-only check: 0 rows"))
            continue
        try:
            oracle_rel = con.sql(oracles[name])
            oracle_types = dict(zip(oracle_rel.columns,
                                    [_norm(t) for t in oracle_rel.types]))
            oracle_df = oracle_rel.df()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}")); continue
        s = spark_df[sorted(spark_df.columns)]
        o = oracle_df[sorted(oracle_df.columns)]
        if list(s.columns) != list(o.columns):
            failures.append((name, f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}"))
            continue
        type_diffs = [f"{c}: spark={spark_types[c]} oracle={oracle_types[c]}"
                      for c in s.columns if spark_types[c] != oracle_types[c]]
        if type_diffs:
            failures.append((name, "result TYPES differ (driver hash would fail): "
                             + "; ".join(type_diffs)))
            continue
        if len(s) != len(o):
            failures.append((name, f"row count differs: spark={len(s)} oracle={len(o)}"))
            continue
        mismatch = None
        for col in s.columns:
            sv, ov = s[col].tolist(), o[col].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                ok = (a == b) or (a is None and b is None)
                if ok and isinstance(a, float) and isinstance(b, float):
                    # == passed but the driver's string-hash is stricter:
                    # require identical IEEE bits (catches -0.0 vs +0.0).
                    ok = _float_bits_eq(a, b)
                if not ok:
                    # Null canonicalization: pandas renders SQL NULL as NaN
                    # (numeric), None (object), or NaT (timestamp) — the
                    # driver's hash treats them all as the same null, so a
                    # scalar-null pair on both sides matches. Arrays keep
                    # element-wise comparison below (pd.isna on an array
                    # returns an array, hence the __len__ guard).
                    try:
                        import pandas as pd
                        ok = (not hasattr(a, "__len__")) and \
                             (not hasattr(b, "__len__")) and \
                             bool(pd.isna(a)) and bool(pd.isna(b))
                    except Exception:
                        ok = False
                if not ok and hasattr(a, "__len__") and hasattr(b, "__len__") \
                        and not isinstance(a, str):
                    la, lb = list(a), list(b)
                    ok = la == lb and not any(
                        isinstance(x, float) and isinstance(y, float)
                        and not _float_bits_eq(x, y)
                        for x, y in zip(la, lb))
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
