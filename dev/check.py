#!/usr/bin/env python3
"""Dev-loop oracle check: mimic the driver's t2 gate locally.

Usage: python3 dev/check.py <sfDir> <verifyOutDir>
Runs each oracle_sql.json query in DuckDB against the sfDir parquet tables
and compares with the Spark parquet dump produced by graft.Verify.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        # driver-style tolerance: compare rounded repr
        return f"{v:.9g}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            n_bad += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e)[:200]}")
            n_bad += 1
            continue
        # driver compare: sort columns by name, then hash values in order
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ: oracle={list(want.columns)} spark={list(got.columns)}")
            n_bad += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: row count differs: oracle={len(want)} spark={len(got)}")
            n_bad += 1
            continue
        # Latent driver-divergence class (round 5): an int64 Spark column
        # vs a float64 oracle column (e.g. an uncast DuckDB HUGEINT sum)
        # passes HERE via the float normalization below but may
        # hash-mismatch under the driver's comparer. Surface it loudly.
        for c in want.columns:
            wk, gk = want[c].dtype.kind, got[c].dtype.kind
            if wk != gk and {wk, gk} <= {"i", "u", "f"}:
                print(f"WARN {name}: dtype drift on '{c}': oracle={want[c].dtype} "
                      f"spark={got[c].dtype} — CAST the oracle column (HUGEINT sum?)")
        w = want.map(norm_cell).values.tolist()
        g = got.map(norm_cell).values.tolist()
        if w != g:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(w, g)) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first 3:")
            for i, a, b in diffs[:3]:
                print(f"  row {i}:\n    oracle={a}\n    spark ={b}")
            n_bad += 1
            continue
        print(f"OK   {name} ({len(want)} rows)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
