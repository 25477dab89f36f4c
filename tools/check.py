#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ (Spark parquet result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB against views over the
sfDir parquet tables, and compares: columns sorted by name, rows sorted,
values exact. Exit code = number of mismatched queries.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    failures = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in sorted(files)], ignore_index=True)
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        # The driver's hash compare is dtype-sensitive across the
        # int/float divide (it normalizes int widths and datetime units,
        # not int-vs-float): a DuckDB HUGEINT column (sum of BIGINT)
        # reaching pandas as float64 hash-fails even when every value is
        # integral. Mirror that here so the local gate catches it.
        mixed = [c for c in g.columns
                 if pd.api.types.is_integer_dtype(g[c]) != pd.api.types.is_integer_dtype(w[c])
                 and pd.api.types.is_numeric_dtype(g[c]) and pd.api.types.is_numeric_dtype(w[c])]
        if mixed:
            print(f"FAIL {name}: int-vs-float dtype mismatch {[(c, str(g[c].dtype), str(w[c].dtype)) for c in mixed]}"
                  " (driver hash would differ; CAST the oracle column)")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"OK   {name} ({len(g)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else 'value mismatch'}")
            # show first diff
            neq = (g != w) & ~(g.isna() & w.isna())
            if neq.any().any():
                idx = neq.any(axis=1).idxmax()
                print(f"     first diff row {idx}:\n  got  {g.loc[idx].to_dict()}\n  want {w.loc[idx].to_dict()}")
            failures += 1
    print(f"{len(names) - failures}/{len(names)} queries match")
    sys.exit(failures)


if __name__ == "__main__":
    main()
