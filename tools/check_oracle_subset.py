#!/usr/bin/env python3
"""Run the DuckDB oracle compare for a SUBSET of queries (dev tooling).

Usage: python3 tools/check_oracle_subset.py <sfDir> <verifyOutDir> <name> [<name> ...]

Same compare as check_oracle.py, restricted to the named queries — used to
spot-check scale-sensitive oracles at sf0.1 where the full O(N^2) oracle
battery would take too long in DuckDB.
"""
import sys
import check_oracle as co
import duckdb, json, glob
import pandas as pd


def main(sfdir, outdir, names):
    con = duckdb.connect()
    for tbl in co.TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sfdir}/{tbl}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = []
    for name in names:
        if name not in oracle:
            print(f"{name}: NO ORACLE DECLARED")
            continue
        try:
            expected = co.norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            failed.append(name)
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO SPARK OUTPUT")
            failed.append(name)
            continue
        got = co.norm(pd.concat([pd.read_parquet(p) for p in files]))
        if list(got.columns) != list(expected.columns):
            print(f"{name}: SCHEMA MISMATCH spark={list(got.columns)} duck={list(expected.columns)}")
            failed.append(name)
        elif not got.equals(expected):
            print(f"{name}: VALUE MISMATCH rows spark={len(got)} duck={len(expected)}")
            failed.append(name)
        else:
            print(f"{name}: MATCH rows={len(got)}")
    print(f"\n{len(names) - len(failed)}/{len(names)} match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.path.insert(0, "tools")
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
