#!/usr/bin/env python3
"""Time the DuckDB oracle suite on a fixture dir — the baseline the bench
JSON is compared against (the reference repo publishes no numbers, so the
baseline is DuckDB executing the semantically-identical oracle SQL on the
same parquet files, sequential single pass, warm page cache).

Usage: python3 scripts/bench_duckdb.py <sf_dir> <oracle_sql.json> [out.json]
       [timeout_sec] [--no-warm]
(oracle_sql.json comes from any graft.Verify run — the SQL is data-
independent. --no-warm runs a single measured pass — for long censored
scale probes where the OS page cache is already hot from a preceding
run over the same parquet files and re-paying every 600 s DNF twice
would double the wall for no information.)
"""
import json
import sys
import threading
import time

import duckdb

args = [a for a in sys.argv[1:] if a != "--no-warm"]
NO_WARM = "--no-warm" in sys.argv
sf_dir = args[0]
oracle_json = args[1]
out_path = args[2] if len(args) > 2 else None
TIMEOUT = float(args[3]) if len(args) > 3 else 600.0

with open(oracle_json) as f:
    oracles = json.load(f)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def run_one(name, sql):
    """(seconds, ok) — interrupt (same deadline discipline as the Spark
    bench: a hung query fails ITSELF, not the whole suite)."""
    timer = threading.Timer(TIMEOUT, con.interrupt)
    t0 = time.time()
    try:
        timer.start()
        con.execute(sql).fetchall()
        return time.time() - t0, True
    except Exception as e:
        print(f"[duckdb] {name} FAILED after {time.time()-t0:.1f}s: "
              f"{str(e)[:200]}", file=sys.stderr)
        return time.time() - t0, False
    finally:
        timer.cancel()

# warm pass: parquet decode into the OS page cache + plan caches —
# mirrors the Spark bench's warm pass. Queries that blew the deadline
# warm are skipped in the measured pass (recorded at the full timeout).
times = {}
failed = []
warm_timeout = set()
if not NO_WARM:
    for name in sorted(oracles):
        dt, ok = run_one(name, oracles[name])
        if not ok and dt >= TIMEOUT:
            warm_timeout.add(name)

t_all0 = time.time()
for name in sorted(oracles):
    if name in warm_timeout:
        times[name] = TIMEOUT
        failed.append(name)
        continue
    dt, ok = run_one(name, oracles[name])
    times[name] = round(dt, 3)
    if not ok:
        failed.append(name)
wall = round(time.time() - t_all0, 3)

result = {"metric": "duckdb_oracle_total", "value": wall, "unit": "sec",
          "queries": times, "sum": round(sum(times.values()), 3),
          "par": 1, "passes": 1, "failed": failed, "sf": sf_dir}
if NO_WARM:
    result["warm"] = False  # single measured pass, pre-warmed page cache
line = json.dumps(result)
if out_path:
    with open(out_path, "w") as f:
        f.write(line + "\n")
print(line)
