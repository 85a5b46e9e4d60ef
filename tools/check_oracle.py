#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate (dev tool only — the library
itself has no Python dependency).

Usage: python3 tools/check_oracle.py <outDir> <sfDir>

Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir
tables, and compares: schema (sorted column names), row count, and an
order-insensitive hash of all values (columns sorted by name, rows sorted).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def cell(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)


def table_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(d))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            n_noracle += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        ok_schema = list(g.columns) == list(e.columns)
        ok_rows = len(g) == len(e)
        ok_hash = ok_schema and ok_rows and table_hash(g) == table_hash(e)
        if ok_hash:
            print(f"  [ok        ] {name}: {len(g)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  [FAIL      ] {name}: schema={ok_schema} rows={ok_rows}"
                  f" ({len(g)} vs {len(e)})")
            if not ok_schema:
                print(f"    spark : {list(g.columns)}")
                print(f"    duckdb: {list(e.columns)}")
            elif ok_rows and len(g):
                diff = (g.astype(str) != e.astype(str)).any(axis=1)
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"    row {i} spark : {list(g.loc[i])}")
                    print(f"    row {i} duckdb: {list(e.loc[i])}")
    print(f"pass={n_pass} fail={n_fail} rows-only={n_noracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
