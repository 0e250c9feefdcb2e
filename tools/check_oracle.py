#!/usr/bin/env python3
"""Local simulation of the round driver's DuckDB oracle compare.

Usage: python tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
SQL in DuckDB against the parquet tables in <sfDir>, and compares with the
parquet result graft.Verify wrote for the same query name. Columns are
sorted by name before comparison, mirroring the driver's hash.

NOTE: driver-side tooling only (python/duckdb are not available to the
Scala library itself).
"""
import sys, json, duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
            got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
            schema_ok = list(map(str, got.dtypes)) == list(map(str, exp.dtypes)) \
                and list(got.columns) == list(exp.columns)
            eq = got.equals(exp)
            status = "OK" if (eq and schema_ok) else "MISMATCH"
            n_ok += status == "OK"
            print(f"{status:8s} {name}  rows={len(got)}/{len(exp)} schema_ok={schema_ok} equal={eq}")
            if status != "OK":
                print("  spark:", dict(zip(got.columns, map(str, got.dtypes))))
                print("  duck :", dict(zip(exp.columns, map(str, exp.dtypes))))
                if schema_ok and not eq:
                    diff = got.compare(exp) if got.shape == exp.shape else None
                    print("  first diffs:\n", diff.head(5) if diff is not None else f"shape {got.shape} vs {exp.shape}")
        except Exception as e:
            print(f"ERROR    {name}: {e}")
    print(f"--- {n_ok}/{len(oracles)} oracled queries OK ---")
    return 0 if n_ok == len(oracles) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
