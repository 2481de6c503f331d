#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, load the Verify parquet output, compare
(sorted columns, sorted rows, exact values). Usage:
  python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad = [], []
    for name, sql in sorted(oracles.items()):
        try:
            want = canon(con.execute(sql).fetchdf())
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                bad.append((name, "no spark output")); continue
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            if list(got.columns) != list(want.columns):
                bad.append((name, f"schema: spark={list(got.columns)} duck={list(want.columns)}")); continue
            if len(got) != len(want):
                bad.append((name, f"rows: spark={len(got)} duck={len(want)}")); continue
            # exact compare with float tolerance fallback
            diffs = []
            for c in got.columns:
                g, w = got[c], want[c]
                if g.dtype.kind == 'f' or w.dtype.kind == 'f':
                    neq = ~((g.isna() & w.isna()) | (abs(g - w) <= 0))
                else:
                    neq = ~(g.astype(str) == w.astype(str))
                if neq.any():
                    i = neq.idxmax()
                    diffs.append(f"{c}[{i}]: spark={g[i]!r} duck={w[i]!r} (n={neq.sum()})")
            if diffs: bad.append((name, "; ".join(diffs[:3])))
            else: ok.append(name)
        except Exception as e:
            bad.append((name, f"oracle error: {e}"))
    print(f"MATCH ({len(ok)}): {' '.join(ok)}")
    for name, why in bad:
        print(f"MISMATCH {name}: {why}")
    # rows-only queries
    all_q = {p.split('/')[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith('.json')}
    rows_only = sorted(all_q - set(oracles))
    for name in rows_only:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"ROWS-ONLY {name}: {n} rows")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
