#!/usr/bin/env python3
"""Staged replay of one oracle SQL: each top-level CTE becomes a TEMP TABLE.

Usage: python3 tools/staged_cte.py <sfDir> <verifyOut> <queryName>

Why this exists (r14): the sf1 replay of `dedup_minhash_pairs_10x` OOMs
DuckDB's allocator in monolithic form on this 125 GB host in 5 of 6
attempts (caps 88-100 GB, 8/16/32 threads, insertion order on/off,
in-memory and disk-backed) — the shingle-explosion → window-densify →
band-self-join pipeline holds too many concurrent operator states, and the
binding ones don't spill. Executing the SAME SQL one CTE at a time, with
each intermediate materialized as a temp table (buffer-managed, pageable to
temp_directory) and dropped as soon as no remaining stage references it,
bounds peak memory to one stage's working set. SQL semantics make the
staged result identical to the monolithic one: every CTE here is
deterministic by the oracle's own portability contract (pinned fold/sort
orders), so materialization order cannot change any value.

The verdict line is printed in compare_oracle.py's format so round notes
can cite either tool interchangeably. Driver-side tooling only (the engine
itself is pure Scala/Spark).
"""
import sys, os, json, re, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import compare_oracle as co
import pandas as pd


def split_ctes(sql):
    """Parse `WITH a AS (...), b AS (...) SELECT ...` into
    ([(name, body), ...], final_select). Paren-depth scan; string literals
    respected (the oracle SQL carries regex/quoted literals)."""
    m = re.match(r"\s*WITH\s+", sql, re.IGNORECASE)
    assert m, "not a WITH query"
    i = m.end()
    ctes = []
    while True:
        m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(", sql[i:],
                     re.IGNORECASE)
        if not m:
            break
        name = m.group(1)
        j = i + m.end()          # position just past the opening paren
        depth, k, in_str = 1, j, False
        while depth > 0:
            c = sql[k]
            if in_str:
                if c == "'":
                    # '' escape: stay in-string if doubled
                    in_str = k + 1 < len(sql) and sql[k + 1] == "'"
                    if in_str:
                        k += 1
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        ctes.append((name, sql[j:k - 1]))
        i = k
        m = re.match(r"\s*,", sql[i:])
        if not m:
            break
        i += m.end()
    return ctes, sql[i:]


def run_stage(con, ctes, final, idx, temp):
    """Create table #idx, then drop any table no longer referenced."""
    word = lambda n, s: re.search(rf"\b{n}\b", s) is not None
    cte, body = ctes[idx]
    kind = "TEMP TABLE" if temp else "TABLE"
    con.execute(f"CREATE {kind} {cte} AS {body}")
    rest = [b for _, b in ctes[idx + 1:]] + [final]
    for prev, _ in ctes[:idx + 1]:
        if not any(word(prev, r) for r in rest):
            try:
                con.execute(f"DROP TABLE IF EXISTS {prev}")
            except Exception:
                pass


def main():
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    ctes, final = split_ctes(sql)
    stage = os.environ.get("STAGED_ONE")
    if stage is not None:
        # child mode: one stage against the shared scratch DB, fresh process
        con = co.connect(sf_dir)
        run_stage(con, ctes, final, int(stage), temp=False)
        con.close()
        return
    t0 = time.time()
    if os.environ.get("STAGED_ISOLATE") == "1":
        # A near-cap stage poisons the in-process duckdb allocator for every
        # later (tiny) statement — the same pathology ORACLE_ISOLATE works
        # around per-query. Stage-level isolation: each CTE materializes in
        # its OWN python process into a persistent ORACLE_DISK scratch DB
        # (required), so each stage starts with a fresh allocator and reads
        # its inputs back through the buffer manager.
        import subprocess
        assert os.environ.get("ORACLE_DISK"), "STAGED_ISOLATE needs ORACLE_DISK"
        for idx in range(len(ctes)):
            env = dict(os.environ); env["STAGED_ONE"] = str(idx)
            p = subprocess.run([sys.executable, os.path.abspath(__file__),
                                sf_dir, out_dir, name], env=env)
            if p.returncode != 0:
                print(f"{name:28s} STAGE {ctes[idx][0]} DIED rc={p.returncode}")
                sys.exit(1)
            print(f"  [{time.time()-t0:7.0f}s] {ctes[idx][0]}",
                  file=sys.stderr, flush=True)
        con = co.connect(sf_dir)
    else:
        con = co.connect(sf_dir)
        for idx in range(len(ctes)):
            run_stage(con, ctes, final, idx, temp=True)
            print(f"  [{time.time()-t0:7.0f}s] {ctes[idx][0]}",
                  file=sys.stderr, flush=True)
    d = co.canon(con.execute(final).df())
    # read the Spark output through DuckDB too (not pd.read_parquet):
    # pyarrow's parquet .so intermittently fails to mmap right after a heavy
    # DuckDB run on this host ("failed to map segment"), which is also what
    # killed the in-cert subprocess for this row; .df() needs only numpy.
    s = co.canon(con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
    con.close()
    r = co.eq(d, s)
    print(f"{name:28s} {r}")
    sys.exit(0 if r == "OK" else 1)


if __name__ == "__main__":
    main()
