#!/usr/bin/env python3
"""Compare two graft.Verify dumps cell-for-cell (partitioning invariance).

Usage: python3 scripts/compare_dumps.py <dumpA> <dumpB>

Each dump is a directory of <query>/<part>.parquet written by graft.Verify.
For every query present in BOTH dumps, frames are compared after sorting by
all columns (order-insensitive: several queries are orderBy'd on a key
prefix only, so row order among ties may legally differ between runs).
NaNs compare equal to NaNs; float cells compare bit-exactly otherwise —
the engine's determinism contract is bit-identity, not tolerance.
"""
import sys
import math
from pathlib import Path

import pandas as pd


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]

    def norm(v):
        if v is None:
            return ("none",)
        if isinstance(v, float) and math.isnan(v):
            return ("nan",)
        if hasattr(v, "ndim") and getattr(v, "ndim") > 0:
            return tuple(norm(x) for x in v.tolist())
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        if hasattr(v, "item"):
            v = v.item()
        return v

    # key=repr: row tuples mix plain scalars with the ("none",)/("nan",)
    # sentinel tuples, which Python's default ordering refuses to compare
    rows = sorted(
        (tuple(norm(v) for v in t) for t in df.itertuples(index=False)),
        key=repr)
    return cols, rows


def main():
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    names = sorted(d.name for d in a.iterdir() if d.is_dir())
    missing = [n for n in names if not (b / n).is_dir()]
    n_pass = n_fail = 0
    for name in names:
        if name in missing:
            continue
        fa = canon(pd.read_parquet(a / name))
        fb = canon(pd.read_parquet(b / name))
        if fa == fb:
            n_pass += 1
        else:
            n_fail += 1
            ca, ra = fa
            cb, rb = fb
            why = ("columns differ" if ca != cb else
                   f"{len(ra)} vs {len(rb)} rows" if len(ra) != len(rb) else
                   "cell values differ")
            print(f"DIFF {name}: {why}")
    print(f"== invariant: {n_pass}/{n_pass + n_fail}"
          + (f" (missing in B: {missing})" if missing else ""))
    sys.exit(1 if n_fail or missing else 0)


if __name__ == "__main__":
    main()
