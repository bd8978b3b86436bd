#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name>/ parquet (Spark output), runs the matching SQL
from <outDir>/oracle_sql.json in DuckDB over <sfDir>/*.parquet, sorts
columns by name then rows, and compares values exactly.

Dev tooling only — not part of the engine (engine code is Scala/Spark).
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted(cols), out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        rel = con.execute(
            f"SELECT * FROM read_parquet({files!r})")
        scols, srows = norm(rel.fetchall(), [d[0] for d in rel.description])
        try:
            orel = con.execute(sql)
            ocols, orows = norm(orel.fetchall(), [d[0] for d in orel.description])
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            fails += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
            fails += 1
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            fails += 1
        elif srows != orows:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} differing rows; "
                  f"first: spark={bad[0][1]} oracle={bad[0][2]} cols={scols}")
            fails += 1
        else:
            print(f"PASS {name}: {len(srows)} rows")
    print(f"{'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
