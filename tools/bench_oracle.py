#!/usr/bin/env python3
"""Time the DuckDB oracle for every query — the numeric bench baseline.

Usage: python3 tools/bench_oracle.py <sfDir> <oracleSqlJson> [timeout_s]

Runs each oracle SQL from <oracleSqlJson> (a Verify dump's oracle_sql.json)
against <sfDir>'s parquet tables in DuckDB, timing one warm run (after one
untimed parse/plan via EXPLAIN). Emits one JSON line:
{"engine":"duckdb","sf":...,"queries":{name:sec,...},"skipped":{name:reason}}
"""
import sys, json, os, time
import multiprocessing as mp

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(sf_dir, sql, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written layout (directory of parts)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    t0 = time.monotonic()
    con.execute(sql).fetchall()
    q.put(time.monotonic() - t0)


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 600.0
    oracle = json.load(open(oracle_json))
    results, skipped = {}, {}
    for name in sorted(oracle):
        q = mp.Queue()
        proc = mp.Process(target=run_one, args=(sf_dir, oracle[name], q))
        proc.start()
        proc.join(timeout)
        if proc.is_alive():
            proc.terminate(); proc.join()
            skipped[name] = f"timeout>{timeout}s"
            print(f"TIMEOUT {name}", file=sys.stderr)
        else:
            try:
                results[name] = round(q.get_nowait(), 3)
                print(f"{results[name]:9.3f}s {name}", file=sys.stderr)
            except Exception:
                skipped[name] = "error"
                print(f"ERROR {name}", file=sys.stderr)
    print(json.dumps({"engine": "duckdb", "sf": sf_dir,
                      "queries": results, "skipped": skipped}))


if __name__ == "__main__":
    main()
