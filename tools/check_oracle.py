#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare against the Verify parquet
dumps (column names sorted, values hashed). Dev tool only — not part of
the Scala library.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def cell(v):
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)

def table_repr(df: pd.DataFrame):
    df = canon(df)
    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]
    return list(df.columns), rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = sorted(glob.glob(f"{res_dir}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_bad += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files])
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        gcols, grows = table_repr(got)
        ecols, erows = table_repr(exp)
        if gcols != ecols:
            print(f"FAIL {name}: columns differ spark={gcols} duckdb={ecols}")
            n_bad += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rowcount spark={len(grows)} duckdb={len(erows)}")
            n_bad += 1
            continue
        mism = [i for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
        if mism:
            i = mism[0]
            print(f"FAIL {name}: {len(mism)} mismatched rows; first at {i}:")
            print(f"  cols : {gcols}")
            print(f"  spark: {grows[i]}")
            print(f"  duck : {erows[i]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(grows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
