#!/usr/bin/env python3
"""Run the DuckDB oracle compare for a SUBSET of queries (dev tooling).

Usage: python3 tools/check_oracle_subset.py <sfDir> <verifyOutDir> <name> [<name> ...]

Same compare as check_oracle.py (shared compare_one), restricted to the named
queries — used to spot-check scale-sensitive oracles at sf0.1 where the full
O(N^2) oracle battery would take too long in DuckDB. A name with no declared
oracle COUNTS AS A FAILURE — a typo must not read as a pass.
"""
import json, sys
import check_oracle as co


def main(sfdir, outdir, names):
    con = co.connect(sfdir)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = 0
    for name in names:
        if name not in oracle:
            print(f"{name}: NO ORACLE DECLARED")
            continue
        if co.compare_one(con, name, oracle[name], outdir):
            ok += 1
    print(f"\n{ok}/{len(names)} match")
    return 0 if ok == len(names) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
