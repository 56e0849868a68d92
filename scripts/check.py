#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results on the same testdata tables.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if v != v:
            return "NULL"
        return round(v, 6)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        # column-name-sorted compare, like the driver
        sc = sorted(spark_df.columns); dc = sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}"); n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}"); n_fail += 1; continue
        s_rows = [tuple(norm(v) for v in r) for r in spark_df[sc].itertuples(index=False)]
        d_rows = [tuple(norm(v) for v in r) for r in duck_df[dc].itertuples(index=False)]
        # compare order-insensitively AND order-sensitively; report both
        if s_rows == d_rows:
            print(f"PASS {name} ({len(s_rows)} rows)"); n_pass += 1
        elif sorted(map(repr, s_rows)) == sorted(map(repr, d_rows)):
            print(f"PASS* {name} ({len(s_rows)} rows, order differs)"); n_pass += 1
        else:
            diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
