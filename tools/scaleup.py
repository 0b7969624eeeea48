#!/usr/bin/env python3
"""Replicate an sf directory K-fold with shifted keys — the scale-up probe.

Each replica r shifts every join/entity key by r * 1e9, so per-key densities
(rows per order, events per user, docs per digest) stay CONSTANT while total
volume grows K-fold — the shape a larger corpus actually has. Dimension
tables joined by nationkey (region, nation) keep a single copy: at any scale
they stay broadcast-sized. Each replica lands in its own parquet part file,
so the scaled tables scan with K-way parallelism (the single-file sf
fixtures scan on one core — that difference is itself part of what the
probe measures).

Usage: tools/scaleup.py [src_sf_dir] [dst_dir] [K]
Then:  SPARK_GRAFT_SF_DIR=<dst_dir> tools/run.sh graft.Bench

Driver-side tooling (duckdb), like tools/diffcheck.py — not part of the
Spark library.
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scaled"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
OFF = 1_000_000_000

# key columns shifted per replica; None = broadcast dim, single copy
SHIFTS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": None,
    "nation": None,
}

con = duckdb.connect()
for table, keys in SHIFTS.items():
    src = f"{SRC}/{table}.parquet"
    out_dir = f"{DST}/{table}.parquet"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    if keys is None:
        shutil.copy(src, f"{out_dir}/part-0.parquet")
        print(f"{table}: copied (broadcast dim)")
        continue
    cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    for r in range(K):
        select = ", ".join(
            f"{c} + {r * OFF} AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {select} FROM '{src}') "
            f"TO '{out_dir}/part-{r}.parquet' (FORMAT PARQUET)"
        )
    n = con.sql(f"SELECT COUNT(*) FROM '{out_dir}/*.parquet'").fetchone()[0]
    print(f"{table}: {K} replicas, {n} rows")
print(f"done -> {DST}")
