#!/usr/bin/env python3
"""Interleaved Spark/DuckDB bench — per-query median ratios from ONE session.

Usage:
  python3 tools/bench_interleaved.py <sfDir> <oracleSqlJson> [passes=3]
      [timeout_s=600] [tag=interleaved]

For each pass, for each registry query (alphabetical): time it in a warm
Spark JVM (graft.Bench server mode — the same clear-cache/GC discipline as
a normal bench pass), then immediately time the same query's oracle SQL in
a fresh DuckDB process. Interleaving per query makes the Spark/oracle
RATIO robust to host-load drift WITHIN the session: a slow half-hour hits
both engines' samples of the same query, where the serial two-pass method
(full Spark run, then full DuckDB run) lets it land on one engine only —
the ±1.5x session band that consumed r12/r13 verdict attention.

Writes:
  BENCH_LOCAL.json             — Spark per-query medians (Bench-compatible:
                                 metric/value/passes/pass_ok/queries/sf,
                                 plus "method":"interleaved")
  ORACLE_<tag>.json            — DuckDB per-query medians (bench_oracle-
                                 compatible, plus passes/method)
  BENCH_INTERLEAVED_<tag>.json — per-query spark/duckdb ratios + totals

A Spark warmup pass (untimed, codegen/JIT) precedes pass 1, exactly like
graft.Bench. DuckDB gets a fresh process per timing, exactly like
tools/bench_oracle.py. An oracle timing that times out or errors is
RETRIED ONCE (r14 verdict task 6: one hung oracle must not poison a pass
median); a query whose attempt fails twice in one pass is skipped for the
remaining passes and lands in "skipped", with every timed-out/errored
attempt counted in the artifacts' "timeouts" field. Spark-side failures
follow graft.Bench's contract: a query that never timed successfully is
emitted as null (never silently omitted — a failed query must never read
as a fast time) and the script exits nonzero when any query errored.
"""
import sys, os, json, subprocess
import multiprocessing as mp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_oracle import run_one  # fresh-process DuckDB timing

ADD_OPENS = [p for pkg in [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
] for p in ("--add-opens", pkg + "=ALL-UNNAMED")]


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def start_server(sf_dir, log):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cp = os.path.join(repo, "target/scala-2.13/classes") + ":/opt/spark/jars/*"
    mem = os.environ.get("SPARK_DRIVER_MEM", "16g")
    cmd = (["java"] + ADD_OPENS +
           [f"-Xmx{mem}", "-XX:ReservedCodeCacheSize=2g",
            "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            "-cp", cp, "graft.Bench"])
    env = dict(os.environ, SPARK_GRAFT_BENCH_SERVER="1",
               SPARK_GRAFT_SF_DIR=sf_dir)
    return subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE, stderr=log,
                            text=True, bufsize=1, cwd=repo, env=env)


def reply(proc):
    """Next protocol line as (kind, name, payload); skips non-protocol noise."""
    while True:
        line = proc.stdout.readline()
        if not line:
            raise RuntimeError("bench server exited early — see "
                               "/tmp/bench_interleaved_server.log")
        if line.startswith("GRAFT_BENCH "):
            parts = line[len("GRAFT_BENCH "):].strip().split(" ", 2)
            return (parts + ["", ""])[:3]


def ask(proc, cmd, name):
    proc.stdin.write(f"{cmd} {name}\n")
    proc.stdin.flush()
    return reply(proc)


def duck_once(sf_dir, sql, timeout):
    q = mp.Queue()
    p = mp.Process(target=run_one, args=(sf_dir, sql, q))
    p.start()
    p.join(timeout)
    if p.is_alive():
        p.terminate(); p.join()
        return None
    try:
        return q.get_nowait()
    except Exception:
        return None


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 600.0
    tag = sys.argv[5] if len(sys.argv) > 5 else "interleaved"
    oracle = json.load(open(oracle_json))
    log = open("/tmp/bench_interleaved_server.log", "w")
    proc = start_server(sf_dir, log)
    kind, names_csv, _ = reply(proc)
    assert kind == "READY", kind
    queries = names_csv.split(",")
    print(f"[interleaved] {len(queries)} queries, {passes} passes, "
          f"sf={sf_dir}", file=sys.stderr)

    # untimed Spark warmup (codegen/JIT — graft.Bench's discipline)
    for q in queries:
        ask(proc, "warm", q)
    print("[interleaved] warmup done", file=sys.stderr)

    spark_t, duck_t = {q: [] for q in queries}, {q: [] for q in queries}
    errors, duck_dead, timeouts = {}, set(), {}
    for p in range(1, passes + 1):
        for q in queries:
            kind, name, payload = ask(proc, "time", q)
            if kind == "TIMED":
                spark_t[q].append(float(payload))
            else:
                errors[q] = payload
            if q in oracle and q not in duck_dead:
                d = duck_once(sf_dir, oracle[q], timeout)
                if d is None:  # retry once — a transient hang/err must
                    timeouts[q] = timeouts.get(q, 0) + 1  # not poison the
                    d = duck_once(sf_dir, oracle[q], timeout)  # pass median
                if d is None:
                    timeouts[q] = timeouts.get(q, 0) + 1
                    duck_dead.add(q)
                    print(f"[interleaved] DUCK TIMEOUT/ERR x2 {q} — "
                          f"skipping remaining passes", file=sys.stderr)
                else:
                    duck_t[q].append(d)
            s = spark_t[q][-1] if spark_t[q] else float("nan")
            d = duck_t[q][-1] if duck_t[q] else float("nan")
            print(f"[p{p}] {s:8.3f}s | {d:8.3f}s  {q}", file=sys.stderr)
    proc.stdin.write("quit\n")
    proc.stdin.flush()
    proc.wait(timeout=120)

    spark_med = {q: round(median(ts), 4) for q, ts in spark_t.items() if ts}
    duck_med = {q: round(median(ts), 4) for q, ts in duck_t.items() if ts}
    pass_ok = {q: len(ts) for q, ts in spark_t.items()}
    skipped = {q: f"timeout>{timeout}s or error (retried once per pass)"
               for q in queries if q in oracle and q not in duck_med}
    common = [q for q in queries if q in spark_med and q in duck_med]
    ratio = {q: round(spark_med[q] / duck_med[q], 4) if duck_med[q] > 0
             else None for q in common}
    s_total = round(sum(spark_med.values()), 3)
    s_common = round(sum(spark_med[q] for q in common), 3)
    d_common = round(sum(duck_med[q] for q in common), 3)
    # Bench.scala's contract: a query that never timed successfully is an
    # explicit null, never a vanished row
    spark_out = {q: spark_med.get(q) for q in queries}

    # a name-filtered run is a family measurement, not the close artifact —
    # do not clobber BENCH_LOCAL.json with a subset
    bench_path = (f"BENCH_FILTERED_{tag}.json"
                  if os.environ.get("SPARK_GRAFT_QUERIES") else
                  "BENCH_LOCAL.json")
    with open(bench_path, "w") as f:
        json.dump({"metric": "total", "value": s_total, "unit": "sec",
                   "passes": passes, "method": "interleaved",
                   "pass_ok": pass_ok, "queries": spark_out,
                   "errors": errors, "sf": sf_dir}, f)
        f.write("\n")
    with open(f"ORACLE_{tag}.json", "w") as f:
        json.dump({"engine": "duckdb", "sf": sf_dir, "passes": passes,
                   "method": "interleaved", "queries": duck_med,
                   "skipped": skipped, "timeouts": timeouts}, f)
        f.write("\n")
    out = {"passes": passes, "sf": sf_dir, "n_queries": len(queries),
           "spark_total": s_total, "spark_total_common": s_common,
           "duckdb_total_common": d_common,
           "ratio_total": round(s_common / d_common, 4) if d_common else None,
           "ratio": ratio, "timeouts": timeouts}
    with open(f"BENCH_INTERLEAVED_{tag}.json", "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps({k: out[k] for k in
                      ("passes", "sf", "spark_total", "spark_total_common",
                       "duckdb_total_common", "ratio_total")}))
    if errors:
        print(f"[interleaved] {len(errors)} Spark-side FAILURES: "
              f"{sorted(errors)}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
