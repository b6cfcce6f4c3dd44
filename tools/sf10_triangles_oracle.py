#!/usr/bin/env python3
"""sf10 oracle for q_triangles. The committed DuckDB oracle materializes
the per-document skip-gram pair stream (O(docs x tokens x window) rows
before its GROUP BY); on the 100x GenScale clone replica that spilled
>60 GB twice and exhausted the sandbox disk. This re-check uses the
exact algebraic decomposition the clone instance admits: tokenization
is a pure function of text, so the co-occurrence count of (w1,w2) over
all documents equals the count over DISTINCT texts weighted by text
multiplicity (sum(m) == count(*) on the expanded corpus, term for
term). Same edge threshold, same triangle join, ~1/100 the intermediate
volume. Compares against the graft.Verify Spark dump.

Usage: python3 tools/sf10_triangles_oracle.py <sfDir> <outDir>
"""
import glob, sys
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
src = f"{sf}/documents.parquet"
src = f"{src}/*.parquet" if glob.glob(f"{src}/*.parquet") else src
q = f"""
WITH tx AS (SELECT text, count(*) AS m FROM '{src}' GROUP BY text),
t AS (SELECT list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk, m FROM tx),
p AS (SELECT tk, m, i FROM t, unnest(generate_series(1, len(tk))) AS u(i)),
pr AS (SELECT tk[i] AS w1, tk[j] AS w2, m FROM p,
       unnest(generate_series(i + 1, least(i + 5, len(tk)))) AS v(j)),
pc AS (SELECT least(w1, w2) AS u, greatest(w1, w2) AS v, sum(m) AS c
       FROM pr WHERE w1 <> w2 GROUP BY 1, 2),
e AS (SELECT u, v FROM pc WHERE c >= 300),
n AS (SELECT count(DISTINCT x) AS n_nodes FROM
      (SELECT u AS x FROM e UNION ALL SELECT v FROM e)),
tri AS (SELECT count(*) AS n_triangles
        FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
SELECT n_nodes, (SELECT count(*) FROM e) AS n_edges, n_triangles FROM n, tri
"""
exp = con.execute(q).fetchone()
got = con.execute(f"SELECT n_nodes, n_edges, n_triangles FROM '{out}/q_triangles/*.parquet'").fetchone()
print(f"duck(weighted)={exp} spark={got}")
if tuple(exp) == tuple(got):
    print("OK   q_triangles (multiplicity-weighted oracle)")
    sys.exit(0)
print("FAIL q_triangles")
sys.exit(1)
