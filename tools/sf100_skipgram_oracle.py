#!/usr/bin/env python3
"""Class-decomposed q_skipgram oracle for GenScale corpora.

The committed oracle materializes per-position token-list copies for
every document; at sf100 (5M docs) DuckDB's spill for that intermediate
exceeds the sandbox disk (measured: >56 GB temp → disk-full FAIL).
GenScale replicas are byte-identical per content class, so skipgram
counts are exactly class counts weighted by class multiplicity:

    cnt(w1,w2) = Σ_class  m_class · cnt_class(w1,w2)

This runs the committed oracle's own pair pipeline over the ~5k
DISTINCT texts and weights by multiplicity — same rule as
tools/sf10_vocab_oracle.py. Validate against the committed oracle at
sf0.01 AND sf0.1 before trusting it at sf100 (--validate runs both
formulations and diffs).

Usage:
  python3 tools/sf100_skipgram_oracle.py <sfDir> <outDir>            # vs Spark dump
  python3 tools/sf100_skipgram_oracle.py <sfDir> --validate          # vs committed oracle
"""
import os
import sys

import duckdb

DECOMPOSED = """
WITH cls AS (SELECT text, count(*) AS m FROM documents GROUP BY text),
t AS (SELECT m, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
      FROM cls),
p AS (SELECT m, tk, i FROM t, unnest(generate_series(1, len(tk))) AS u(i)),
pr AS (SELECT m, tk[i] AS w1, tk[j] AS w2 FROM p,
       unnest(generate_series(i + 1, least(i + 5, len(tk)))) AS v(j))
SELECT w1, w2, cast(sum(m) AS bigint) AS cnt FROM pr GROUP BY w1, w2
"""

COMMITTED = """
WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '),
                                      x -> len(x) > 0) AS tk FROM documents),
p AS (SELECT tk, i FROM t, unnest(generate_series(1, len(tk))) AS u(i)),
pr AS (SELECT tk[i] AS w1, tk[j] AS w2 FROM p,
       unnest(generate_series(i + 1, least(i + 5, len(tk)))) AS v(j))
SELECT w1, w2, count(*) AS cnt FROM pr GROUP BY w1, w2
"""


def connect(sf_dir):
    con = duckdb.connect()
    tmp = os.environ.get("DUCKDB_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '40GB')}'")
    p = f"{sf_dir}/documents.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{src}'")
    return con


def rows_of(con, sql):
    return sorted(tuple(map(str, r)) for r in con.execute(sql).fetchall())


def main():
    sf_dir = sys.argv[1]
    con = connect(sf_dir)
    if sys.argv[2] == "--validate":
        a, b = rows_of(con, DECOMPOSED), rows_of(con, COMMITTED)
        if a == b:
            print(f"OK   validate @ {sf_dir}: decomposed == committed "
                  f"({len(a)} rows)")
            return 0
        print(f"FAIL validate @ {sf_dir}: {len(a)} vs {len(b)} rows; "
              f"first diff {next((x for x, y in zip(a, b) if x != y), None)}")
        return 1
    dump = f"{sys.argv[2]}/q_skipgram/*.parquet"
    a = rows_of(con, DECOMPOSED)
    b = rows_of(con, f"SELECT w1, w2, cnt FROM '{dump}'")
    if a == b:
        print(f"OK   q_skipgram: {len(a)} rows (class-decomposed, "
              f"tools/sf100_skipgram_oracle.py)")
        return 0
    print(f"FAIL q_skipgram: oracle {len(a)} vs spark {len(b)} rows")
    return 1


if __name__ == "__main__":
    sys.exit(main())
