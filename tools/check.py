#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate: for each query output
parquet written by `graft.Verify`, run the matching oracle SQL in DuckDB over
views of the same testdata tables and compare (column set, row count, values
with columns sorted by name). Usage: check.py <sfDir> <outDir>."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize lists/arrays to tuples for comparability
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        if str(df[c].dtype).startswith("datetime64[ns"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype in (np.int32, np.uint32, np.int16):
            df[c] = df[c].astype(np.int64)
        if str(df[c].dtype) == "date32[day][pyarrow]":
            df[c] = df[c].astype(object)
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if name not in oracle:
            results[name] = f"rows_only({len(got)})"
            continue
        try:
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        if list(got.columns) != list(want.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(got.columns)} duck={list(want.columns)}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(got)} duck={len(want)}"
            continue
        bad = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    eq = ((a.isna() & b.isna()) | (a == b)).all()
                else:
                    eq = ((a.isna() & b.isna()) | (a == b)).all()
            except Exception:
                eq = list(map(str, a)) == list(map(str, b))
            if not eq:
                i = next(j for j in range(len(a))
                         if not ((pd.isna(a.iloc[j]) and pd.isna(b.iloc[j])) or
                                 str(a.iloc[j]) == str(b.iloc[j])))
                bad.append(f"{c}[row{i}]: spark={a.iloc[i]!r} duck={b.iloc[i]!r}")
        results[name] = "OK" if not bad else "VALUE_MISMATCH " + "; ".join(bad[:3])
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows_only"))
    for k, v in results.items():
        print(f"{'PASS' if v == 'OK' else 'ROWS' if v.startswith('rows_only') else 'FAIL':4} {k}: {v}")
    print(f"\n{n_ok}/{len(results)} green")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
