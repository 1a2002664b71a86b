#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's correctness gate:
runs each oracle_sql.json query in DuckDB over the same parquet tables and
compares with the Spark result parquet (columns sorted by name, rows sorted,
values hashed). Usage: check.py <sfdir> <verify_out_dir>"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracle:
            print(f"  [rows-only] {name}: rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: {e}")
            n_bad += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"  [FAIL-cols] {name}: got {list(g.columns)} vs {list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"  [FAIL-rows] {name}: got {len(g)} vs {len(e)}")
            n_bad += 1
            continue
        try:
            eq = g.astype(str).equals(e.astype(str))
        except Exception:
            eq = False
        if eq:
            n_ok += 1
            print(f"  [ok       ] {name}: rows={len(g)}")
        else:
            n_bad += 1
            print(f"  [FAIL-vals] {name}")
            diff = (g.astype(str) != e.astype(str)).any(axis=1)
            print(pd.concat([g[diff].head(3).add_prefix("got_"),
                             e[diff].head(3).add_prefix("exp_")], axis=1).to_string())
    # A query that crashed in Verify writes no output dir — count every
    # declared query with no directory as a failure so it can't read as
    # green. queries.json (the full manifest Verify writes) also covers
    # rows-only queries that have no oracle entry.
    manifest_path = os.path.join(outdir, "queries.json")
    declared = set(json.load(open(manifest_path))) \
        if os.path.exists(manifest_path) else set(oracle)
    for name in sorted(declared | set(oracle)):
        if not os.path.isdir(os.path.join(outdir, name)):
            print(f"  [FAIL-missing] {name}: no Verify output")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
