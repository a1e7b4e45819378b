#!/usr/bin/env python3
"""Dev-only pre-validation harness (mimics the driver's DuckDB-oracle gate).

NOT part of the shipped library — the engine itself is pure Scala/Spark.
Usage: python3 tools/verify_local.py <sfdir> <outdir>
Reads <outdir>/<name>/ parquet (written by graft.Verify) and
<outdir>/oracle_sql.json, runs each oracle in DuckDB over <sfdir>/*.parquet,
and compares cell-by-cell (columns sorted by name, rows sorted) so any
driver-side hash compare will also pass.
"""
import duckdb, json, math, sys, glob, os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def _norm_type(t):
    """Collapse representation-only arrow differences; keep width differences
    (int64 vs int128/decimal) distinct — those break the driver's hash."""
    if t is None:
        return None
    t = str(t)
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("date"):
        return "date"
    if t in ("large_string", "string", "utf8", "large_utf8"):
        return "string"
    # nested types: child field names differ between writers (item/element/l)
    import re
    t = re.sub(r"\b\w+(?=:)", "f", t)
    t = t.replace("large_string", "string")
    return t

def cell_eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # driver hashes → require exact
    return a == b

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{outdir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            gtypes = {f.name: str(f.type) for f in
                      con.execute(f"SELECT * FROM '{spark_dir}/*.parquet' LIMIT 0").arrow().schema}
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
            etypes = {f.name: str(f.type) for f in
                      con.execute(f"SELECT * FROM ({sql}) _probe LIMIT 0").arrow().schema}
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        # Harness-shape check: the driver sorts rows via pandas before
        # hashing, and pandas' lexsort crashes on ndarray cells when it has
        # to use a nested column as a sort key ("unhashable type:
        # numpy.ndarray" — the r7 agg_classification2 incident). Empirically
        # multi-row frames WITH scalar columns (agg_collect) survive, but a
        # frame whose every column is nested has no usable sort key → hard
        # FAIL here so it never reaches the driver.
        nested = [c for c, t in gtypes.items()
                  if str(t).startswith(("list", "large_list", "struct", "map"))]
        if nested and len(nested) == len(gtypes):
            print(f"FAIL {name}: all {len(nested)} output columns are nested "
                  f"({nested}) — driver's pandas sort has no scalar key and "
                  f"crashes; reshape to scalar rows (posexplode)")
            n_fail += 1
            continue
        if nested and len(grows) > 1:
            print(f"WARN {name}: nested columns {nested} in a {len(grows)}-row "
                  f"frame — driver-sort risk; prefer scalar columns")
        # Type-level compare: the driver hashes binary values, so a DuckDB
        # HUGEINT vs Spark BIGINT mismatch fails there even when the Python
        # ints compare equal here (this is exactly how q12 slipped in r01).
        tbad = [(c, gtypes.get(c), etypes.get(c)) for c in gtypes
                if _norm_type(gtypes.get(c)) != _norm_type(etypes.get(c))]
        if tbad:
            print(f"FAIL {name}: type drift {tbad}")
            n_fail += 1
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount {len(gr)} != {len(er)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            for j, (x, y) in enumerate(zip(a, b)):
                if not cell_eq(x, y):
                    bad = (i, gc[j], x, y)
                    break
            if bad:
                break
        if bad:
            i, c, x, y = bad
            print(f"FAIL {name}: row {i} col {c}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
