#!/usr/bin/env python3
"""Oracle compare for queries whose OUTPUT is too large to fetchall into
the tools/local_verify.py line-hash (the sf10 LSH pair frame is 214M
rows; materializing it in the Python client needs >20 GB). Instead both
sides are reduced INSIDE DuckDB to order-independent aggregates:

    count(*), sum(hash(line)), bit_xor(hash(line))

where `line` is the same sorted-column "a|b|…" canonical string the
line-hash uses. Equal aggregates ⇒ equal multisets up to 64-bit-hash
collisions — adjudication-grade for a 100× scale re-check (the exact
line-hash gate still runs at sf0.01/sf0.1 where fetchall fits).

Only integer/string columns are supported (double formatting is the
line-hash's job; the big frames here are id pairs).

Usage: DUCKDB_TMP=… python3 tools/sf10_big_oracle.py <sfDir> <outDir> q1[,q2…]
<outDir> must hold graft.Verify dumps + oracle_sql.json.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    tmp = os.environ.get("DUCKDB_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '40GB')}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def agg_of(con, rel_sql, cols):
    line = " || '|' || ".join(f"cast({c} AS varchar)" for c in sorted(cols))
    q = (f"SELECT count(*) AS n, sum(hash({line})) AS s, "
         f"bit_xor(hash({line})) AS x FROM ({rel_sql}) t")
    n, s, x = con.execute(q).fetchone()
    return n, int(s or 0) % (1 << 64), int(x or 0)


def main(sf_dir, out_dir, names):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    con = connect(sf_dir)
    for name in names:
        dump = f"{out_dir}/{name}/*.parquet"
        cols = [r[0] for r in
                con.execute(f"DESCRIBE SELECT * FROM '{dump}'").fetchall()]
        got = agg_of(con, f"SELECT * FROM '{dump}'", cols)
        exp = agg_of(con, oracle[name], cols)
        if got == exp:
            print(f"OK   {name}: {got[0]} rows "
                  f"(count+sum+xor of 64-bit line hashes match)")
        else:
            print(f"FAIL {name}: spark(n={got[0]},s={got[1]:x},x={got[2]:x}) "
                  f"vs duck(n={exp[0]},s={exp[1]:x},x={exp[2]:x})")
            fails += 1
    print("ALL GREEN" if fails == 0 else f"{fails} FAILURES")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3].split(",")))
