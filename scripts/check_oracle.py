#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json + per-query parquet dirs written by
graft.Verify, runs each oracle SQL in DuckDB against the sf tables, and
compares canonicalized results (columns sorted by name, rows sorted,
floats at 9 significant digits) — vectorized via pandas so 600k-row
results compare in seconds.
"""
import json, sys
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.map(lambda v: "NaN" if pd.isna(v) else f"{v:.9g}")
        elif s.dtype.kind == "M":
            out[c] = s.astype("datetime64[us]").astype(str)
        else:
            out[c] = s.astype(str)
    return out.sort_values(list(out.columns), kind="mergesort") \
              .reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:
        errors = json.load(open(f"{out_dir}/errors.json"))
    except Exception:
        errors = {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in errors:
            print(f"FAIL {name}: spark query threw: {errors[name][:200]}")
            n_fail += 1; continue
        try:
            o_raw = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1; continue
        try:
            s_raw = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e)[:120]}")
            n_fail += 1; continue
        o, s = canon(o_raw), canon(s_raw)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: columns differ oracle={list(o.columns)} "
                  f"spark={list(s.columns)}")
            n_fail += 1; continue
        # The driver stringifies raw values: a dtype-kind difference (e.g.
        # DuckDB HUGEINT->float64 vs Spark int64 rendering "123.0" vs "123")
        # hash-mismatches there even when canon() values agree here.
        kind_bad = [c for c in sorted(o_raw.columns)
                    if o_raw[c].dtype.kind != s_raw[c].dtype.kind
                    and {o_raw[c].dtype.kind, s_raw[c].dtype.kind} - {"i", "u"}]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind mismatch on {kind_bad}: "
                  f"oracle={[str(o_raw[c].dtype) for c in kind_bad]} "
                  f"spark={[str(s_raw[c].dtype) for c in kind_bad]}")
            n_fail += 1; continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows differ (oracle {len(o)} vs spark {len(s)})")
            n_fail += 1; continue
        if o.equals(s):
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
        else:
            neq = (o != s).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())} differing rows of {len(o)}")
            print("  oracle:", o[neq].head(2).to_dict("records"))
            print("  spark: ", s[neq].head(2).to_dict("records"))
            n_fail += 1
    for name in sorted(set(errors) - set(oracle)):
        print(f"FAIL {name}: spark query threw (no oracle): {errors[name][:200]}")
        n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
