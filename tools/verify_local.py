#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/verify_local.py [SF_DIR] [OUT_DIR]

Reads each <OUT_DIR>/<name> parquet dumped by graft.Verify, runs the
matching oracle SQL from <OUT_DIR>/oracle_sql.json in DuckDB over views
on the SF_DIR parquet tables, and compares row count, schema (column
names), and canonical text hash (columns sorted by name, \t/\n seps,
NULL literal, timestamps as yyyy-MM-dd HH:mm:ss).
"""
import glob
import hashlib
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel):
    df = rel.fetchdf()
    df = df[sorted(df.columns)]
    # Driver parity: the driver sorts rows by ALL columns before hashing
    # (and therefore crashes on array cells exactly like the driver does
    # — that crash is the signal this replica exists to reproduce).
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    lines = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            # None, float NaN, and pandas NaT all render as NULL
            # (iterables are never NA; v != v is the scalar NaN test)
            if v is None or (not hasattr(v, "__iter__") and v != v):
                cells.append("NULL")
            elif hasattr(v, "strftime"):
                cells.append(v.strftime("%Y-%m-%d %H:%M:%S"))
            elif isinstance(v, float):
                cells.append(repr(v))
            else:
                cells.append(str(v))
        lines.append("\t".join(cells))
    text = "\n".join(lines)
    return (len(df), list(df.columns),
            hashlib.sha256(text.encode()).hexdigest(), df)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.sql(
            "SELECT * FROM read_parquet(" + repr(files) + ")")
        try:
            want = con.sql(oracles[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gn, gc, gh, gdf = canon(con, got)
        wn, wc, wh, wdf = canon(con, want)
        if gn == wn and gc == wc and gh == wh:
            print(f"PASS {name} rows={gn}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {gn}/{wn} cols {gc}/{wc} "
                  f"hash {'=' if gh == wh else '!='}")
            if gn == wn and gc == wc:
                diff = (gdf.reset_index(drop=True)
                        != wdf.reset_index(drop=True))
                bad = diff.any(axis=1)
                idx = bad[bad].index[:3]
                for i in idx:
                    print(f"  spark row {i}: "
                          f"{gdf.iloc[i].to_dict()}")
                    print(f"  duck  row {i}: "
                          f"{wdf.iloc[i].to_dict()}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
