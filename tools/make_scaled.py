#!/usr/bin/env python3
"""Build an N-times replicated copy of a testdata sf dir for the one-off
scale-sanity bench (driver-side tooling, like check_oracle.py — the Scala
library never depends on this).

Replicates the big tables with key offsets so ids stay unique and the
orders<->lineitem join stays consistent within each replica; copies the
small dims byte-identical. events joined the scaled set in round 6
(per-replica event_id/user_id offsets, SAME time span — 10x users and
events inside an unchanged window, the realistic scale axis for
event-time analytics); earlier rounds copied it byte-identical because
its then-TIMESTAMP(NANOS) encoding would not survive a DuckDB rewrite,
so pre-round-6 "x10" rows for events-family queries measured UNSCALED
input (see BASELINE.md's round-6 correction).

Usage: python tools/make_scaled.py /root/testdata/sf0.1 /tmp/sf_x10 10
"""
import sys, os, shutil, duckdb

OFF = 1_000_000_000  # per-replica key offset

SCALED = {
    "documents": "SELECT doc_id + {o} AS doc_id, text, lang, source, n_chars FROM t",
    "embeddings": "SELECT vec_id + {o} AS vec_id, embedding, label FROM t",
    "orders": ("SELECT o_orderkey + {o} AS o_orderkey, o_custkey, o_orderstatus, "
               "o_totalprice, o_orderdate, o_orderpriority FROM t"),
    "lineitem": ("SELECT l_orderkey + {o} AS l_orderkey, l_partkey, l_suppkey, "
                 "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
                 "l_returnflag, l_linestatus, l_shipdate FROM t"),
    "events": ("SELECT event_id + {o} AS event_id, ts, user_id + {o} AS user_id, "
               "event_type, value, props FROM t"),
}
COPIED = ["region", "nation", "customer", "supplier", "part"]


def main(src, dst, n):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, sel in SCALED.items():
        con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{src}/{table}.parquet'")
        union = "\nUNION ALL\n".join(sel.format(o=i * OFF) for i in range(n))
        con.execute(f"COPY ({union}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        rows = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {rows} rows ({n}x)")
    for table in COPIED:
        shutil.copyfile(f"{src}/{table}.parquet", f"{dst}/{table}.parquet")
        print(f"{table}: copied")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
