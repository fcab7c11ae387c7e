#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table by basename in DuckDB, runs every oracle SQL from
<verifyOutDir>/oracle_sql.json, loads the matching Spark parquet result, sorts
columns by name and rows by value, and reports per-query match status.
(Driver-side tooling only; the engine itself is pure Scala/Spark.)
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: float(v) if isinstance(v, __import__("decimal").Decimal) else v)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def eq(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if list(a.columns) != list(b.columns):
        return f"COLS {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        for i in range(len(av)):
            x, y = av[i], bv[i]
            xn = x is None or (isinstance(x, float) and math.isnan(x)) or x is pd.NA or x is pd.NaT
            yn = y is None or (isinstance(y, float) and math.isnan(y)) or y is pd.NA or y is pd.NaT
            if xn and yn:
                continue
            if xn != yn or x != y:
                return f"VAL col={c} row={i}: {x!r} vs {y!r}"
    return "OK"

def connect(sf_dir):
    """Fresh connection with spill + cap, tables registered by basename.

    A FRESH connection per query matters at sf1: one replay blowing the
    memory cap used to poison the shared connection's buffer manager, and
    every later (trivial) query then failed OOM too; isolation makes each
    verdict independent. An in-memory connection also has NO temp_directory
    by default, so the heavy replay oracles (banded minhash, span census)
    OOMed instead of spilling; cap below host RAM so the pyarrow side of
    the compare keeps headroom.
    """
    # ORACLE_DISK=<path>: back the connection with an on-disk database —
    # in-memory connections restrict which operators may spill, and the sf1
    # banded-minhash replay exhausts the allocator in-memory at every cap
    # tried (88-100GB, solo, order-preservation off; r14).
    disk = os.environ.get("ORACLE_DISK")
    con = duckdb.connect(disk) if disk else duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '48GB')}'")
    # canon() sorts every result before hashing, so result order is
    # irrelevant — and preserving insertion order forces DuckDB to buffer
    # whole intermediate pipelines, which is what pushed the sf1 banded-
    # minhash replay past the cap into hard allocator failure (r14).
    con.execute("SET preserve_insertion_order=false")
    thr = os.environ.get("ORACLE_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f)[:-8]
        # driver testdata tables are single files; ScaleUp-generated sets
        # (sf1 certification) are Spark-written DIRECTORIES of part files
        pat = f"{f}/*.parquet" if os.path.isdir(f) else f
        # OR REPLACE: with ORACLE_DISK the views persist in the scratch DB
        # across per-stage child processes (tools/staged_cte.py isolate mode)
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")
    return con

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    # ORACLE_ISOLATE=1: run every query in its OWN python subprocess. At sf1
    # one replay exceeding the memory cap poisons the duckdb allocator for
    # the remainder of the PROCESS (even fresh connections then fail on 2 KB
    # allocations), so certification runs isolate per query; the default
    # in-process mode stays for the fast sf0.01 loop.
    if os.environ.get("ORACLE_ISOLATE") == "1" and only is None:
        import subprocess
        env = dict(os.environ); env.pop("ORACLE_ISOLATE")
        n_ok = n_bad = 0
        for name in sorted(oracle):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sf_dir, out_dir, name],
                capture_output=True, text=True, env=env)
            line = next((l for l in p.stdout.splitlines() if l.startswith(name)),
                        f"{name:28s} SUBPROCESS DIED rc={p.returncode}: "
                        f"{(p.stderr or '').strip().splitlines()[-1:]}")
            print(line, flush=True)
            if line.split()[1:2] == ["OK"]:
                n_ok += 1
            else:
                n_bad += 1
        print(f"\n{n_ok} OK / {n_bad} BAD")
        sys.exit(1 if n_bad else 0)
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"{name:28s} MISSING spark output")
            n_bad += 1
            continue
        con = connect(sf_dir)
        try:
            d = canon(con.execute(sql).df())
        except Exception as e:
            print(f"{name:28s} ORACLE FAIL: {e}")
            n_bad += 1
            con.close()
            continue
        con.close()
        s = canon(pd.read_parquet(spark_path))
        r = eq(d, s)
        print(f"{name:28s} {r}", flush=True)
        if r == "OK":
            n_ok += 1
        else:
            n_bad += 1
    print(f"\n{n_ok} OK / {n_bad} BAD")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
