#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle gate (dev tool only — the
shipped engine is pure Scala/Spark; this script just pre-validates oracles).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet tables,
sorts columns by name and rows by all columns, and hash-compares values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for value comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*/"))):
        name = os.path.basename(d.rstrip("/"))
        try:
            got = pd.read_parquet(d)
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "rows>0" if len(got) > 0 else "EMPTY!"
            print(f"—     {name}: no oracle, {len(got)} rows [{status}]")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        if g.equals(e):
            print(f"PASS  {name} ({len(g)} rows)")
            n_pass += 1
        else:
            neq = (g != e) & ~(g.isna() & e.isna())
            bad_cols = [c for c in g.columns if neq[c].any()]
            print(f"FAIL  {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                print(f"      {c}[{i}]: spark={g[c][i]!r} duckdb={e[c][i]!r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
