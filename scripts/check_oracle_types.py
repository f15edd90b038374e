#!/usr/bin/env python3
"""Oracle type-parity guard.

The driver's correctness hasher normalizes small integer widths
(INTEGER <-> BIGINT) but NOT int128: an oracle column DuckDB types as
HUGEINT (e.g. an un-cast SUM(BIGINT)) hash-mismatches even when every
value is identical. This guard DESCRIBEs every SparkEntry.oracleSql
statement against the real test tables and fails on any HUGEINT /
UHUGEINT output column, so the authoring bug is caught before
submission instead of showing up as hash_match:false in the round's
correctness report.

Usage:
    sbt "runMain graft.Verify --sql-only /tmp/oracle_sql.json"
    python3 scripts/check_oracle_types.py /tmp/oracle_sql.json \
        /root/testdata/sf0.001

Exit 0 = every oracle's output schema is driver-hashable.
"""
import json
import sys

import duckdb

BANNED = {"HUGEINT", "UHUGEINT"}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(oracle_json: str, sf_dir: str) -> int:
    with open(oracle_json) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 - report and fail the guard
            bad.append((name, "<describe failed>", str(e).splitlines()[0]))
            continue
        for col, typ, *_ in desc:
            base = typ.split("(")[0].upper()
            if base in BANNED:
                bad.append((name, col, typ))
    if bad:
        print("HUGEINT-typed oracle columns (driver hasher cannot "
              "normalize int128 — wrap in CAST(... AS BIGINT)):")
        for name, col, typ in bad:
            print(f"  {name}: {col} -> {typ}")
        return 1
    print(f"OK: {len(oracles)} oracle statements, no HUGEINT output columns")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
