#!/usr/bin/env python3
"""DuckDB baseline timings for the oracle-backed driver queries.

Usage: python3 tools/duckdb_bench.py <sfDir> <oracleSqlJson> [threads]

Runs every oracle SQL against the sf parquet tables (warm: one untimed pass,
then min-of-3 timed), prints one JSON line mirroring graft.Bench's shape plus
the host 1-min loadavg so numbers can be read in context. (Driver-side
tooling only; the engine itself is pure Scala/Spark.)
"""
import sys, json, glob, os, time
import duckdb

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else (os.cpu_count() or 8)
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={threads}")
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        con.execute(f"CREATE VIEW {os.path.basename(f)[:-8]} AS "
                    f"SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(oracle_path))
    times, failed = {}, []
    for name, sql in sorted(oracle.items()):
        try:
            con.execute(sql).fetchall()          # warmup
            best = None
            for _ in range(3):
                t0 = time.time()
                con.execute(sql).fetchall()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            times[name] = best
        except Exception:
            failed.append(name)
    load1 = os.getloadavg()[0]
    print(json.dumps({
        "metric": "duckdb_total", "value": round(sum(times.values()), 3),
        "unit": "sec", "queries": {k: round(v, 4) for k, v in times.items()},
        "failed": failed, "sf": sf_dir, "threads": threads,
        "loadavg1": round(load1, 1)}))

if __name__ == "__main__":
    main()
