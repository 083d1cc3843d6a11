#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/local_verify.py <outDir> <sfDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
fixture tables in <sfDir>, and compares: row count, column names, and exact
cell values (columns sorted by name, rows compared in result order and also
order-insensitively). Reports PASS/FAIL per query with first diffs.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "ndim") and getattr(v, "ndim") > 0:  # numpy array cell
        return tuple(norm_cell(x) for x in v.tolist())
    if hasattr(v, "item"):
        v = v.item()
    return v


def frame_cells(df):
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False):
        rows.append(tuple(norm_cell(v) for v in t))
    return cols, rows


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = Path(sys.argv[2])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(d for d in out_dir.iterdir() if d.is_dir()):
        name = qdir.name
        try:
            got = pq.read_table(str(qdir)).to_pandas()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"ROWS {name}: rows={len(got)} (no oracle)")
            n_rowsonly += 1
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gr = frame_cells(got)
        wc, wr = frame_cells(want)
        # dtype-kind drift (int vs float etc.) — warn loudly: the driver may
        # compare schemas more strictly than cell equality does
        for c in sorted(set(got.columns) & set(want.columns)):
            gk = got[c].dtype.kind
            wk = want[c].dtype.kind
            if gk != wk and {gk, wk} != {"O"}:
                print(f"  TYPE {name}.{c}: spark={got[c].dtype} duck={want[c].dtype}")
        if gc != wc:
            print(f"FAIL {name}: columns differ\n  spark={gc}\n  duck ={wc}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: row count spark={len(gr)} duck={len(wr)}")
            n_fail += 1
            continue
        if gr == wr:
            print(f"PASS {name}: rows={len(gr)}")
            n_pass += 1
            continue
        # order-insensitive fallback + first diff report
        if sorted(map(repr, gr)) == sorted(map(repr, wr)):
            print(f"WARN {name}: values match but row ORDER differs")
            n_fail += 1
            continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
        print(f"FAIL {name}: {len(diffs)} differing rows of {len(gr)}; first:")
        for i, a, b in diffs[:3]:
            print(f"  row {i}:\n    spark={a}\n    duck ={b}")
        n_fail += 1

    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
