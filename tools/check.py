#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>'s
tables, and compares: schema (column names), row count, and a hash of the
value matrix with columns sorted by name and rows sorted by all columns.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def frame_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        for v in df[c].tolist():
            if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NA:
                h.update(b"\x00NULL")
            elif isinstance(v, float):
                h.update(repr(v).encode())
            else:
                h.update(str(v).encode())
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted([os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
                    if os.path.isdir(d)])
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            status = "ROWS-ONLY" if len(spark_df) > 0 else "ROWS-ONLY-EMPTY"
            print(f"{status} {name}: rows={len(spark_df)}")
            n_rows_only += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        ha, hb = frame_hash(a), frame_hash(b)
        if ha != hb:
            print(f"FAIL {name}: hash mismatch ({len(a)} rows)")
            # show first differing cells
            diffs = 0
            for c in a.columns:
                av, bv = a[c], b[c]
                neq = ~((av == bv) | (av.isna() & bv.isna()))
                if neq.any():
                    i = int(np.argmax(neq.values))
                    print(f"    col {c}: row {i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r} "
                          f"(n_diff={int(neq.sum())})")
                    diffs += 1
                    if diffs >= 4:
                        break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
