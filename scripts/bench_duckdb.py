#!/usr/bin/env python3
"""Time the DuckDB oracle suite on a fixture dir — the baseline the bench
JSON is compared against (the reference repo publishes no numbers, so the
baseline is DuckDB executing the semantically-identical oracle SQL on the
same parquet files, sequential single pass, warm page cache).

Usage: python3 scripts/bench_duckdb.py <sf_dir> <oracle_sql.json> [out.json]
(oracle_sql.json comes from any graft.Verify run — the SQL is data-
independent.)
"""
import json
import sys
import threading
import time

import duckdb

sf_dir = sys.argv[1]
oracle_json = sys.argv[2]
out_path = sys.argv[3] if len(sys.argv) > 3 else None
TIMEOUT = float(sys.argv[4]) if len(sys.argv) > 4 else 600.0

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
line = json.dumps(result)
if out_path:
    with open(out_path, "w") as f:
        f.write(line + "\n")
print(line)
