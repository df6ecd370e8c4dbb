#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs each SQL in <verifyOutDir>/oracle_sql.json against DuckDB views over the
<sfDir> parquet tables and compares (sorted columns, sorted rows, stringified)
with the Spark parquet results the graft.Verify main wrote.

Dev tooling only — uses the driver-side python stack (duckdb/pandas); the
library itself is pure Scala/Spark.
"""
import duckdb, json, glob, sys
import pandas as pd

TABLES = ["lineitem", "orders", "customer", "part", "supplier", "nation",
          "region", "events", "documents", "embeddings"]


def connect(sfdir: str):
    import os
    con = duckdb.connect()
    for tbl in TABLES:
        path = f"{sfdir}/{tbl}.parquet"
        # /root/testdata tables are single files; SynthScale's /tmp/sf*
        # tables are Spark directory-parquet - glob the parts in that case
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{path}')")
    return con


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # stringify for dtype-insensitive compare (float64 reprs must match)
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare_one(con, name: str, sql: str, outdir: str) -> bool:
    """Compare one query's Spark dump against its DuckDB oracle; prints a
    status line (plus mismatch diagnostics) and returns True on match."""
    # check for the Spark dump BEFORE evaluating the oracle: on a subset
    # run (SPARK_GRAFT_ONLY) the expensive oracle SQL of every undumped
    # entry would otherwise still execute — a full-battery sf0.1 oracle
    # pass costs tens of minutes in DuckDB
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT")
        return False
    try:
        expected = norm(con.execute(sql).df())
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}")
        return False
    got = norm(pd.concat([pd.read_parquet(p) for p in files]))
    if list(got.columns) != list(expected.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(got.columns)} duck={list(expected.columns)}")
        return False
    if not got.equals(expected):
        print(f"{name}: VALUE MISMATCH rows spark={len(got)} duck={len(expected)}")
        merged = got.compare(expected) if len(got) == len(expected) else None
        if merged is not None and not merged.empty:
            print(merged.head(5))
        else:
            print(" spark:\n", got.head(5), "\n duck:\n", expected.head(5))
        return False
    print(f"{name}: MATCH rows={len(got)}")
    return True


def main(sfdir: str, outdir: str) -> int:
    con = connect(sfdir)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = sum(compare_one(con, name, sql, outdir)
             for name, sql in sorted(oracle.items()))
    print(f"\n{ok}/{len(oracle)} match")
    return 0 if ok == len(oracle) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
