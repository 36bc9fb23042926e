#!/usr/bin/env python3
# Local oracle compare: runs each oracle_sql.json query in DuckDB over the
# testdata tables and hash-compares (column-name-sorted, row-sorted, string-
# canonicalized) against the Verify parquet dumps -- the same contract as the
# driver's correctness gate. Usage:
#   python3 tools/compare_oracle.py <verify_out_dir> <sf_dir> [q_a,q_b,...]
import duckdb, json, sys, glob, hashlib
import pandas as pd

failed = False
outdir, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
names = sys.argv[3].split(",") if len(sys.argv)>3 else sorted(oracle)
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(name, "NO SPARK OUTPUT"); failed = True; continue
    sp = canon(pd.read_parquet(f"{outdir}/{name}"))
    if name not in oracle: print(name, f"no_oracle rows={len(sp)}"); continue
    du = canon(con.sql(oracle[name]).df())
    if list(sp.columns) != list(du.columns):
        print(name, "SCHEMA MISMATCH", list(sp.columns), list(du.columns))
        failed = True; continue
    if len(sp) != len(du):
        print(name, "ROWCOUNT", len(sp), len(du)); failed = True; continue
    def h(df):
        return hashlib.sha256(pd.util.hash_pandas_object(df.astype(str), index=False).values.tobytes()).hexdigest()
    ok = h(sp) == h(du)
    print(name, "OK" if ok else "HASH MISMATCH", f"rows={len(sp)}")
    if not ok:
        failed = True
        for c in sp.columns:
            if not sp[c].astype(str).equals(du[c].astype(str)):
                print("  col", c, "\n  spark:", sp[c].head(5).tolist(), "\n  duck: ", du[c].head(5).tolist())
sys.exit(1 if failed else 0)
