#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json + per-query parquet dirs written by
graft.Verify, runs each oracle SQL in DuckDB against the sf tables, and
compares canonicalized results (columns sorted by name, rows sorted,
floats rounded) — reporting exact and tolerant match per query.
"""
import json, math, sys
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = f"{v:.9g}"
            rr.append(repr(v))
        out.append(tuple(rr))
    out.sort()
    return [cols[i] for i in idx], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            o = con.sql(sql)
            ocols, orows = o.columns, o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1; continue
        try:
            s = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols, srows = s.columns, s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e)[:120]}")
            n_fail += 1; continue
        oc, orw = canon(orows, ocols)
        sc, srw = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
            n_fail += 1; continue
        if orw == srw:
            print(f"PASS {name} ({len(srw)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows differ (oracle {len(orw)} vs spark {len(srw)})")
            d1 = [r for r in orw if r not in set(srw)][:3]
            d2 = [r for r in srw if r not in set(orw)][:3]
            print(f"  oracle-only: {d1}")
            print(f"  spark-only:  {d2}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
