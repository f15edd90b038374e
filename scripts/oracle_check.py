#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate (NOT part of the
library): read each Verify output parquet, run the corresponding oracle SQL
in DuckDB over the same testdata, normalize (sort columns by name, sort
rows), and compare values exactly.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def norm_rows(cols, rows):
    """Sort columns by name, then rows lexicographically by repr."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        tbl = pads.dataset(pdir, format="parquet").to_table()
        s_cols = list(tbl.column_names)
        s_rows = [tuple(r[c] for c in s_cols) for r in tbl.to_pylist()]
        try:
            cur = con.execute(sql)
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: schema mismatch spark={sc} duck={dc}")
            n_fail += 1
        elif sr != dr:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    print(f"  first diff at row {i}:\n   spark={a}\n   duck ={b}")
                    break
            if len(sr) != len(dr):
                only_s = [r for r in sr[:5] if r not in dr[:50]]
                print(f"  sample spark-only: {only_s[:2]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sr)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
