#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's t2 gate:
run graft.Verify first (writes parquet per query + oracle_sql.json),
then this script executes each oracle in DuckDB over the same sf dir
and compares values (column-name-sorted, row-sorted) and schemas.

Usage: python3 tools/check.py [outDir] [sfDir] [only_query ...]
"""
import decimal
import json
import struct
import sys

import duckdb
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        # Byte-faithful: the driver's gate hashes raw values, where
        # -0.0 != +0.0 and NaN payloads matter; Python's == sees
        # neither class, so compare the IEEE bit pattern instead.
        return "f64:" + struct.pack(">d", v).hex()
    if hasattr(v, "isoformat"):  # datetime/date
        s = v.isoformat()
        return s.replace("+00:00", "")
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rows_of(cols, batches):
    names = sorted(cols)
    out = []
    for batch in batches:
        d = {c: batch[c] for c in names}
        n = len(batch[names[0]]) if names else 0
        for i in range(n):
            out.append(tuple(norm(d[c][i]) for c in names))
    return names, sorted(out, key=repr)


def spark_result(path):
    t = ds.dataset(path, format="parquet").to_table()
    cols = t.column_names
    return rows_of(cols, [ {c: t.column(c).to_pylist() for c in cols} ])


def duck_result(con, sql):
    t = con.execute(sql).fetch_arrow_table()
    cols = t.column_names
    return rows_of(cols, [ {c: t.column(c).to_pylist() for c in cols} ])


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])

    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; derived sets (ScaleUp)
        # are Spark-written directories of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        import os
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    passed, failed, skipped = [], [], []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            scols, srows = spark_result(f"{out_dir}/{name}")
        except Exception as e:
            failed.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            dcols, drows = duck_result(con, sql)
        except Exception as e:
            failed.append((name, f"oracle sql failed: {e}"))
            continue
        if scols != dcols:
            failed.append((name, f"schema mismatch: spark={scols} duck={dcols}"))
            continue
        if len(srows) != len(drows):
            failed.append((name, f"rowcount: spark={len(srows)} duck={len(drows)}"))
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failed.append((name, f"row {bad[0]} differs:\n  spark={bad[1]}\n  duck ={bad[2]}"))
        else:
            passed.append((name, len(srows)))

    for name, n in passed:
        print(f"PASS {name} ({n} rows)")
    for name, msg in failed:
        print(f"FAIL {name}: {msg}")
    print(f"\n{len(passed)} passed, {len(failed)} failed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
