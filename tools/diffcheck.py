#!/usr/bin/env python3
"""Local differential checker (dev loop only — the driver has its own).

Usage: python3 tools/diffcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs
<verifyOutDir>/oracle_sql.json's SQL for <name> in DuckDB over the sfDir
tables, sorts columns by name, and compares row-by-row values.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            odf = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        ocols, scols = sorted(odf.column_names), sorted(sdf.column_names)
        if ocols != scols:
            print(f"FAIL {name}: columns differ: oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        orows = [[canon(odf.column(c)[i].as_py()) for c in ocols]
                 for i in range(odf.num_rows)]
        srows = [[canon(sdf.column(c)[i].as_py()) for c in ocols]
                 for i in range(sdf.num_rows)]
        if len(orows) != len(srows):
            print(f"FAIL {name}: row counts differ: oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        bad = [(i, o, s) for i, (o, s) in enumerate(zip(orows, srows)) if o != s]
        if bad:
            i, o, s = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ; first at {i}:")
            print(f"  cols   = {ocols}")
            print(f"  oracle = {o}")
            print(f"  spark  = {s}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracles)} oracle-checked")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
