#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare each Verify
parquet dump against its DuckDB oracle on the same sf dir.

Usage: tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            got = canon(pd.read_parquet(f"{outdir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"columns {list(got.columns)} vs {list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows {len(got)} vs {len(want)}")
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                try:
                    eq = (a.astype(object).where(pd.notna(a), None) ==
                          b.astype(object).where(pd.notna(b), None)) | \
                        (pd.isna(a) & pd.isna(b))
                except Exception:
                    eq = pd.Series([False] * len(a))
                if not bool(eq.all()):
                    bad = (~eq).idxmax()
                    problems.append(
                        f"col {c} differs at row {bad}: "
                        f"{a.iloc[bad]!r} vs {b.iloc[bad]!r} "
                        f"(dtypes {a.dtype}/{b.dtype}, "
                        f"{int((~eq).sum())} rows differ)")
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"ok   {name} ({len(got)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
