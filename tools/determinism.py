#!/usr/bin/env python3
"""Dev-only determinism gate: compare two graft.Verify output dirs
(query-by-query, column-sorted, stringified cells) and report any query
whose two runs differ — run-to-run determinism, which the DuckDB oracle
compare alone does not prove. Usage: determinism.py <dirA> <dirB>.

Equality is INTENTIONALLY row-order sensitive: outputs concatenate in
sorted part-file-name order with in-file row order preserved, mirroring
the driver's compare. A benign repartition between runs therefore reports
as NON-DETERMINISTIC — that is the point: every catalog query must end in
a total-order sort, so any ordering drift IS a determinism bug."""
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
            missing = " ".join(d for d, df in ((a, da), (b, db)) if df is None)
            bad.append(f"{n}: no parquet output under {missing}")
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
