#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the sf_dir
parquet tables, sorts columns by name and rows by all columns, and compares
values exactly. Reports per-query PASS/FAIL plus diagnostics.
"""
import json, math, sys, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False
        return all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    result_dirs = sorted(glob.glob(f"{out_dir}/*/"))
    names = [d.rstrip("/").split("/")[-1] for d in result_dirs]
    # a query that crashed in Verify writes no dir — that's a FAIL, not a skip
    for name in sorted(oracle):
        if name not in names:
            print(f"NOOUT {name}: verify wrote no result")
            n_fail += 1
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"NOOUT {name}: no parquet written")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        if name not in oracle:
            print(f"NOORA {name}: rows={len(got)} (rows-only check)")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORAERR {name}: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                if not cells_equal(x, y):
                    bad.append((c, i, x, y))
                    if len(bad) > 3:
                        break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(g)} cols={len(g.columns)}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
