#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(tables = parquet files in sfDir), load the Spark result parquet, sort
columns by name, sort rows, compare cell-by-cell (exact; floats compared
bitwise via repr). Reports per-query PASS/FAIL with first diffs.
"""
import json, sys, glob
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {e}")
            failures += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO-SPARK-OUTPUT")
            failures += 1
            continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        ec = sorted(exp.columns); gc = sorted(got.columns)
        if ec != gc:
            print(f"{name}: SCHEMA-MISMATCH oracle={ec} spark={gc}")
            failures += 1
            continue
        exp = exp[ec].sort_values(ec).reset_index(drop=True)
        got = got[ec].sort_values(ec).reset_index(drop=True)
        if len(exp) != len(got):
            print(f"{name}: ROWCOUNT oracle={len(exp)} spark={len(got)}")
            failures += 1
            continue
        diffs = []
        for c in ec:
            a, b = exp[c].tolist(), got[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if repr(x) != repr(y):
                    diffs.append((c, i, x, y))
                    if len(diffs) >= 3:
                        break
            if diffs:
                break
        if diffs:
            print(f"{name}: VALUE-DIFF {diffs[:3]}")
            failures += 1
        else:
            print(f"{name}: PASS ({len(exp)} rows)")
    rowonly = [n for n in sorted(p.split('/')[-1] for p in glob.glob(f"{out_dir}/q*"))
               if n not in oracle]
    for n in rowonly:
        cnt = con.sql(f"SELECT count(*) FROM '{out_dir}/{n}/*.parquet'").fetchone()[0]
        print(f"{n}: ROWS-ONLY ({cnt} rows)")
    print("FAILURES:", failures)
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
