#!/usr/bin/env python3
"""Dev-only determinism gate: compare two graft.Verify output dirs
(query-by-query, column-sorted, stringified cells) and report any query
whose two runs differ — run-to-run determinism, which the DuckDB oracle
compare alone does not prove. Usage: determinism.py <dirA> <dirB>."""
import sys, glob, os
import pandas as pd


def load(d):
    files = sorted(glob.glob(f"{d}/*.parquet"))
    if not files:
        return None
    df = pd.concat([pd.read_parquet(f) for f in files])
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    return df.astype(str)


def main(a, b):
    names = sorted(n for n in os.listdir(a) if os.path.isdir(os.path.join(a, n)))
    bad = []
    for n in names:
        da, db = load(os.path.join(a, n)), load(os.path.join(b, n))
        if da is None or db is None:
            bad.append(f"{n}: missing output ({da is None}/{db is None})")
            continue
        if list(da.columns) != list(db.columns) or len(da) != len(db):
            bad.append(f"{n}: shape {da.shape} vs {db.shape}")
            continue
        if not da.equals(db):
            bad.append(f"{n}: values differ")
    if bad:
        print("\n".join(bad))
        print(f"\n{len(bad)}/{len(names)} NON-DETERMINISTIC")
        sys.exit(1)
    print(f"{len(names)}/{len(names)} bit-identical across runs")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
