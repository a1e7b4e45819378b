#!/usr/bin/env python3
"""Dev-side benchmark fixture generator (duckdb, like tools/verify_local.py).

Builds two fixture sets under benchdata/ that the read-only /root/testdata
cannot provide:

  sf0.1x8 — the sf0.1 TPC-H tables re-laid-out as 8 contiguous key-range
            files per large table, so local scans schedule 8 parallel tasks
            (the single-row-group fixture hides parallel-scan behavior).
  sf1     — ~10x sf0.1 by key-offset replication: each replica shifts every
            join key (orderkey/custkey/partkey/suppkey) by rep*(max+1), so
            FK structure, selectivities and per-key cardinalities are
            preserved and every TPC-H answer scales ~linearly. One file per
            replica (10 files/table). Only the 9 TPC-H tables are built —
            events/documents/embeddings are not used by graft.Bench.

Usage: python3 tools/make_benchdata.py [outroot]   (default: ./benchdata)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "benchdata"

BIG = ["lineitem", "orders", "customer", "part", "supplier"]
SMALL = ["nation", "region"]
SORT_KEY = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
}
# key column -> offset domain (which max+1 to shift by per replica)
KEY_DOMAIN = {
    "l_orderkey": "orderkey", "o_orderkey": "orderkey",
    "o_custkey": "custkey", "c_custkey": "custkey",
    "l_partkey": "partkey", "p_partkey": "partkey",
    "l_suppkey": "suppkey", "s_suppkey": "suppkey",
}

con = duckdb.connect()


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def copy_single(table, dst):
    os.makedirs(dst, exist_ok=True)
    con.sql(f"COPY (SELECT * FROM {src(table)}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")


def build_x8():
    root = f"{OUT}/sf0.1x8"
    for t in SMALL:
        copy_single(t, root)
    for t in BIG:
        d = f"{root}/{t}.parquet"
        os.makedirs(d, exist_ok=True)
        k = SORT_KEY[t]
        n = con.sql(f"SELECT count(*) FROM {src(t)}").fetchone()[0]
        per = (n + 7) // 8
        for i in range(8):
            con.sql(
                f"COPY (SELECT * FROM {src(t)} ORDER BY {k} "
                f"LIMIT {per} OFFSET {i * per}) "
                f"TO '{d}/part-{i:04d}.parquet' (FORMAT PARQUET)"
            )
        print(f"sf0.1x8 {t}: {n} rows in 8 files")


def build_sf1(reps=10):
    root = f"{OUT}/sf1"
    for t in SMALL:
        copy_single(t, root)
    maxes = {
        "orderkey": con.sql(f"SELECT max(o_orderkey) FROM {src('orders')}").fetchone()[0] + 1,
        "custkey": con.sql(f"SELECT max(c_custkey) FROM {src('customer')}").fetchone()[0] + 1,
        "partkey": con.sql(f"SELECT max(p_partkey) FROM {src('part')}").fetchone()[0] + 1,
        "suppkey": con.sql(f"SELECT max(s_suppkey) FROM {src('supplier')}").fetchone()[0] + 1,
    }
    for t in BIG:
        d = f"{root}/{t}.parquet"
        os.makedirs(d, exist_ok=True)
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM {src(t)}").fetchall()]
        for rep in range(reps):
            sel = ", ".join(
                f"{c} + {rep * maxes[KEY_DOMAIN[c]]} AS {c}" if c in KEY_DOMAIN else c
                for c in cols
            )
            con.sql(
                f"COPY (SELECT {sel} FROM {src(t)}) "
                f"TO '{d}/part-{rep:04d}.parquet' (FORMAT PARQUET)"
            )
        print(f"sf1 {t}: {reps} replicas")


if __name__ == "__main__":
    build_x8()
    build_sf1()
    print("done")
