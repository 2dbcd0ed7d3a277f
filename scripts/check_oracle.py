#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query parquet under <verifyOutDir>, runs the matching SQL from
oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet registered by name),
sorts columns by name, sorts rows, and compares values exactly.
"""
import json, sys, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object)
    # normalize numerics: ints stay ints, floats/decimals -> repr
    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return repr(v)
        try:
            import decimal
            if isinstance(v, decimal.Decimal):
                return str(v)
        except Exception:
            pass
        return v
    df = df.apply(lambda c: c.map(norm))
    df = df.sort_values(by=list(df.columns), key=lambda c: c.map(str)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    import glob, os
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); bad += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); bad += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); bad += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); bad += 1; continue
        if not g.equals(w):
            diff = (g != w) & ~(g.isna() & w.isna())
            n = int(diff.any(axis=1).sum())
            print(f"FAIL {name}: {n}/{len(g)} rows differ")
            idx = diff.any(axis=1)
            print("  spark:", g[idx].head(3).to_dict("records"))
            print("  duck :", w[idx].head(3).to_dict("records"))
            bad += 1; continue
        print(f"OK   {name} ({len(g)} rows)"); ok += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(d)
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"\n{ok} ok / {bad} fail")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
