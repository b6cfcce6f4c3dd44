#!/usr/bin/env python3
"""Class-decomposed oracles for the minhash connected-component family
(q_dedup_clusters, q_cluster_sizes, q_dedup_keep, q_canonical_keep,
q_split_leakage) at GenScale SFs where the committed WITH RECURSIVE
min-label propagation over lsh_pairs is infeasible (214M pairs at sf10
spilled >65 GB; 1.25B at sf100 is hopeless in a recursive CTE).

Exactness argument, same as tools/sf10_pair_oracle.py: GenScale
replicas are byte-identical, so a document's minhash band keys are a
function of its TEXT CLASS alone. Every member of a class carries the
class's band rows, so a kept band bucket (2 <= member count <= maxBucket,
counted over MEMBERS) contains all members of every class in it, and
lsh_pairs restricted to that bucket is a full clique over those members.
Therefore the member-level component structure is exactly the CLASS-level
component structure: classes sharing a kept bucket merge; an "active"
class (present in >= 1 kept bucket) has all its members in one component;
members of inactive classes never appear in lsh_pairs. A component's
cluster_id = min member doc_id = min class tid (tid IS min(doc_id) of the
class by construction).

So: build the class-level band frame (the PAIR_EDITDIST scaffolding from
tools/sf10_pair_oracle.py, validated there at sf0.01+sf0.1), run
union-find over <= ~5k class nodes in Python, register the class->label
table, and expand each query's committed tail SQL over members — every
stage linear in class or member count, no recursive CTE, no pair
materialization.

Usage (mirrors sf10_pair_oracle.py):
  python3 tools/sf100_cc_oracle.py <sfDir> <outDir> [q1,q2,...]
      compare decomposed oracle vs graft.Verify dumps in <outDir>
  VALIDATE=1 python3 tools/sf100_cc_oracle.py <sfDir> <outDir> [qs]
      compare vs the COMMITTED oracle SQL from <outDir>/oracle_sql.json
      (run at sf0.01 AND sf0.1, where the recursive CTE still works,
      BEFORE trusting the decomposition at a big SF).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sf10_big_oracle import agg_of, connect  # noqa: E402

# Class-level band scaffolding — text tokenization, bigram shingles,
# 6 md5 minhashes, 3 bands of 2 — copied verbatim from
# tools/sf10_pair_oracle.py PAIR_EDITDIST (itself the committed
# duckLshPairCtes with doc_id -> class tid), member-count bucket cap.
SCAFFOLD = """
CREATE TEMP TABLE dtext AS
  SELECT min(doc_id) AS tid, text FROM documents GROUP BY text;
CREATE TEMP TABLE memv AS
  SELECT d.doc_id AS id, t.tid FROM documents d JOIN dtext t ON d.text = t.text;
CREATE TEMP TABLE cbands AS
WITH t AS (SELECT tid, text,
             list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
      FROM dtext),
sh AS (SELECT tid, unnest(list_distinct(list_transform(
              generate_series(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1]))) AS shingle
       FROM t),
sig AS (SELECT tid,
               min(md5('0:' || shingle)) AS mh_0, min(md5('1:' || shingle)) AS mh_1,
               min(md5('2:' || shingle)) AS mh_2, min(md5('3:' || shingle)) AS mh_3,
               min(md5('4:' || shingle)) AS mh_4, min(md5('5:' || shingle)) AS mh_5
        FROM sh GROUP BY tid)
SELECT 0 AS band, mh_0 || '|' || mh_1 AS band_key, tid FROM sig
UNION ALL SELECT 1, mh_2 || '|' || mh_3, tid FROM sig
UNION ALL SELECT 2, mh_4 || '|' || mh_5, tid FROM sig;
CREATE TEMP TABLE okbuckets AS
  SELECT band, band_key FROM cbands JOIN
    (SELECT tid, count(*) AS m FROM memv GROUP BY tid) mc USING (tid)
  GROUP BY band, band_key HAVING sum(m) BETWEEN 2 AND 1000;
"""

EDGES = """
SELECT DISTINCT a.tid, b.tid FROM cbands a
JOIN cbands b ON a.band = b.band AND a.band_key = b.band_key AND a.tid < b.tid
JOIN okbuckets ok ON a.band = ok.band AND a.band_key = ok.band_key
"""

ACTIVE = """
SELECT DISTINCT tid FROM cbands JOIN okbuckets USING (band, band_key)
"""

# Committed tail SQL per query, with `clusters` replaced by the expanded
# member->label table (cls_comp is (tid, cluster_id); clusters is its
# member expansion). Tails mirror SparkEntry.oracleSql verbatim.
CLUSTERS = "SELECT m.id AS doc_id, c.cluster_id FROM memv m JOIN cls_comp c USING (tid)"

TAILS = {
    "q_dedup_clusters": f"SELECT doc_id, cluster_id FROM ({CLUSTERS}) clusters",
    "q_cluster_sizes": f"""
WITH clusters AS ({CLUSTERS}),
sizes AS (SELECT cluster_id, count(*) AS cluster_sz FROM clusters
          GROUP BY cluster_id)
SELECT cluster_sz, count(*) AS n_clusters FROM sizes GROUP BY cluster_sz""",
    "q_dedup_keep": f"""
WITH clusters AS ({CLUSTERS})
SELECT d.doc_id,
       coalesce(c.cluster_id, d.doc_id) AS cluster_id,
       (c.cluster_id IS NULL OR d.doc_id = c.cluster_id) AS keep
FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id""",
    "q_canonical_keep": f"""
WITH clusters AS ({CLUSTERS}),
assigned AS (SELECT d.doc_id,
                    coalesce(c.cluster_id, d.doc_id) AS cluster_id,
                    d.n_chars
             FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id)
SELECT doc_id, cluster_id,
       (row_number() OVER (PARTITION BY cluster_id
                           ORDER BY n_chars DESC, doc_id) = 1) AS keep
FROM assigned""",
    # thresholdHex(0.1) = md5-prefix cut, same literal as the committed
    # oracle (Sampling.thresholdHex(0.1) = '19999999').
    "q_split_leakage": f"""
WITH clusters AS ({CLUSTERS}),
sp AS (SELECT doc_id,
              CASE WHEN substring(md5(cast(doc_id AS varchar)), 1, 8)
                     < '19999999'
                   THEN 'test' ELSE 'train' END AS split
       FROM documents)
SELECT cluster_id,
       cast(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS bigint)
         AS n_train,
       cast(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS bigint)
         AS n_test
FROM clusters JOIN sp USING (doc_id)
GROUP BY cluster_id
HAVING n_train > 0 AND n_test > 0""",
}


def components(con):
    """Union-find over class nodes; label = min tid in component."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (tid,) in con.execute(ACTIVE).fetchall():
        parent[tid] = tid
    for a, b in con.execute(EDGES).fetchall():
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min label so find() roots ARE the labels
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(tid, find(tid)) for tid in parent]


def main(sf_dir, out_dir, names):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    validate = bool(os.environ.get("VALIDATE"))
    con = connect(sf_dir)
    for stmt in SCAFFOLD.split(";"):
        if stmt.strip():
            con.execute(stmt)
    comp = components(con)
    con.execute("CREATE TEMP TABLE cls_comp (tid BIGINT, cluster_id BIGINT)")
    con.executemany("INSERT INTO cls_comp VALUES (?, ?)", comp)
    print(f"[cc] {len(comp)} active classes, "
          f"{len(set(l for _, l in comp))} components")
    fails = 0
    for name in names:
        dec = TAILS[name]
        cols = [r[0] for r in
                con.execute(f"DESCRIBE SELECT * FROM ({dec}) z LIMIT 0").fetchall()]
        got = agg_of(con, dec, cols)
        if validate:
            exp = agg_of(con, oracle[name], cols)
            tag = "vs committed oracle"
        else:
            exp = agg_of(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'", cols)
            tag = "vs spark dump"
        if got == exp:
            print(f"OK   {name}: {got[0]} rows {tag} "
                  f"(count+sum+xor of 64-bit line hashes match)")
        else:
            print(f"FAIL {name}: decomposed(n={got[0]},s={got[1]:x},x={got[2]:x}) "
                  f"{tag}(n={exp[0]},s={exp[1]:x},x={exp[2]:x})")
            fails += 1
    print("ALL GREEN" if fails == 0 else f"{fails} FAILURES")
    return 1 if fails else 0


if __name__ == "__main__":
    names = (sys.argv[3].split(",") if len(sys.argv) > 3 else
             sorted(TAILS))
    sys.exit(main(sys.argv[1], sys.argv[2], names))
