#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate (NOT part of the
engine): run after `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query output parquet under outDir, runs the corresponding
oracle_sql.json entry in DuckDB (tables = <sfDir>/*.parquet views) and
compares: row count, sorted column names, and a hash of the sorted values.
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware → naive UTC, so both engines' timestamps compare equal
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_convert('UTC').dt.tz_localize(None)
            except Exception:
                pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def table_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        got = pd.read_parquet(qdir)
        if name not in oracle:
            print(f"  ~ {name}: rows-only check, rows={len(got)}" +
                  ("  ** EMPTY **" if len(got) == 0 else ""))
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"  ✗ {name}: SCHEMA got={list(g.columns)} exp={list(e.columns)}")
            failures += 1
        elif len(g) != len(e):
            print(f"  ✗ {name}: ROWS got={len(g)} exp={len(e)}")
            failures += 1
        elif table_hash(g) != table_hash(e):
            print(f"  ✗ {name}: HASH mismatch ({len(g)} rows)")
            diff = g.compare(e) if g.shape == e.shape else None
            if diff is not None and len(diff):
                print(diff.head(5))
            failures += 1
        else:
            print(f"  ✓ {name}: {len(g)} rows")
    return failures

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(1 if main(sf_dir, out_dir) else 0)
