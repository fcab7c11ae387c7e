#!/usr/bin/env python3
"""Local replay of the driver's correctness compare (self-check only; the
library itself is pure Scala/Spark — this script just lets the builder catch
an oracle drift before the driver's round gate does).

Usage: python3 tools/selfcheck.py <verifyOutDir> <sfDir> [query ...]

For each query dir under verifyOutDir: read the Spark parquet result, run the
matching oracle_sql.json SQL in DuckDB over the sfDir parquet tables, sort
columns by name and rows by value, and diff. Mirrors the driver: row count,
schema (column names), and cell values (1e-9 relative tolerance on floats —
the driver hashes exact, so any tolerance-saved row is flagged as WARN).
"""
import json, math, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def cells_equal(a, b):
    a, b = norm(a), norm(b)
    if a is None or b is None:
        return (a is None and b is None), False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b, False
        if fa == fb:
            return True, False
        if math.isnan(fa) and math.isnan(fb):
            return True, False
        tol = 1e-9 * max(1.0, abs(fa), abs(fb))
        return abs(fa - fb) <= tol, True  # equal-with-tolerance → WARN
    return a == b, False


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(f"{sf_dir}/{t}.parquet")
        if p.is_dir():  # Spark-written dataset dir
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():  # single-file parquet (current testdata generation)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(out_dir.iterdir()):
        name = qdir.name
        if not qdir.is_dir() or (only and name not in only):
            continue
        if name not in oracle:
            n_skip += 1
            print(f"SKIP  {name} (no oracle)")
            continue
        spark_tbl = pq.read_table(str(qdir))
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            n_fail += 1
            print(f"FAIL  {name}: oracle SQL error: {e}")
            continue
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if s_cols != d_cols:
            n_fail += 1
            print(f"FAIL  {name}: schema {s_cols} vs {d_cols}")
            continue
        s_rows = sorted(
            (tuple(norm(r[c]) for c in s_cols) for r in spark_tbl.to_pylist()),
            key=repr)
        d_rows = sorted(
            (tuple(norm(r[c]) for c in d_cols) for r in duck.to_pylist()),
            key=repr)
        if len(s_rows) != len(d_rows):
            n_fail += 1
            print(f"FAIL  {name}: rows {len(s_rows)} vs {len(d_rows)}")
            continue
        bad = warn = 0
        for sr, dr in zip(s_rows, d_rows):
            for sv, dv in zip(sr, dr):
                eq, tol = cells_equal(sv, dv)
                if not eq:
                    if bad == 0:
                        print(f"      {name} first diff: spark={sv!r} duck={dv!r}")
                    bad += 1
                elif tol:
                    warn += 1
        if bad:
            n_fail += 1
            print(f"FAIL  {name}: {bad} cell diffs over {len(s_rows)} rows")
        else:
            n_pass += 1
            flag = f" (WARN {warn} float-tolerance cells)" if warn else ""
            print(f"pass  {name}: {len(s_rows)} rows{flag}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
