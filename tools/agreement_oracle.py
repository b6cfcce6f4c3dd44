#!/usr/bin/env python3
"""Class-decomposed oracle for q_dedup_agreement — the last pair-family
query without a big-SF decomposer (r12 verdict item 1). The committed
oracle FULL-JOINs three member-level pair sets (minhash-LSH, simhash-8,
embedding-SRP) and emits ONE row of seven intersection counts; at sf30+
each member set is 10^8..10^9 rows and the joins spill past the sandbox
disk.

Exactness argument, extending tools/sf10_pair_oracle.py's: each of the
three pair sets is CLASS-determined — membership of a member pair {a,b}
depends only on (text-class(a), text-class(b)) for the two text methods
and (vec-class(a), vec-class(b)) for the embedding method, because
GenScale replicas are byte-identical and every bucket cap is
member-weighted at class level (the exact property the three validated
per-query decomposers rest on). The intersections therefore live on the
REFINED classes (text-class, vec-class): all members of one refined
class are pairwise indistinguishable to all three methods. So expand
class pairs only to REFINED-class pairs (thousands), never to members,
and weight each refined pair by m_a*m_b (C(m,2) on the diagonal).

The three class-level pair sets are NOT re-derived here: minhash comes
from sf10_pair_oracle.PAIR_EDITDIST cut at its editdist stage, simhash-8
from sf100_simhash_pairs_oracle.rewrite() on the committed
q_simhash_pairs8 SQL cut at member expansion, embedding from
sf10_pair_oracle.embed_neardup() on the committed q_embed_neardup SQL
cut the same way — each reused verbatim from a decomposer already
validated against its committed oracle, so this tool adds only the
refined-class intersection arithmetic.

Usage (same conventions as the sibling decomposers):
  python3 tools/agreement_oracle.py <sfDir> <outDir>
      compare decomposed oracle vs the graft.Verify dump in <outDir>
  VALIDATE=1 python3 tools/agreement_oracle.py <sfDir> <outDir>
      compare vs the COMMITTED q_dedup_agreement SQL from
      <outDir>/oracle_sql.json (run at sf0.01 AND sf0.1 first).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sf10_big_oracle import agg_of, connect  # noqa: E402
from sf10_pair_oracle import PAIR_EDITDIST, embed_neardup  # noqa: E402
from sf100_simhash_pairs_oracle import rewrite as simhash_rewrite  # noqa: E402


def cut_at(sql, marker, tail):
    """Drop everything from `marker` on and close the WITH-chain with
    `tail` (trimming the dangling comma the removed CTE left behind)."""
    head = sql[:sql.index(marker)].rstrip().rstrip(",")
    return f"{head}\n{tail}"


def class_pair_sets(oracle):
    # minhash-LSH kept-band class pairs (ta <= tb over text classes)
    mh = cut_at(PAIR_EDITDIST, "ed AS (", "SELECT ta, tb FROM clp")
    # simhash-8 class pairs: decomposed q_simhash_pairs8 (same
    # duckSimhashPairCtes(8, 7) the agreement embeds under its sp_ prefix)
    sh = cut_at(simhash_rewrite(oracle["q_simhash_pairs8"]),
                "SELECT least(ma.id", "SELECT DISTINCT ta, tb FROM chp")
    # embedding-SRP class pairs over vector classes; the cosine threshold
    # is lifted from the committed q_embed_neardup SQL (r13 advisory — a
    # hard-coded 0.4 here would silently drift if SparkEntry's changes)
    import re
    thr = re.search(r"cos_sim\s*>=\s*([0-9.]+)", oracle["q_embed_neardup"])
    assert thr, "cosine threshold not found in committed q_embed_neardup"
    em = cut_at(embed_neardup(oracle["q_embed_neardup"]),
                "SELECT least(ma.id",
                "SELECT DISTINCT ta AS va, tb AS vb FROM cp "
                f"WHERE cos_sim >= {thr.group(1)}")
    return mh, sh, em


AGREEMENT = """
SELECT cast(coalesce(sum(CASE WHEN in_mh THEN w END), 0) AS bigint) AS n_minhash,
       cast(coalesce(sum(CASE WHEN in_sh THEN w END), 0) AS bigint) AS n_simhash,
       cast(coalesce(sum(CASE WHEN in_em THEN w END), 0) AS bigint) AS n_embed,
       cast(coalesce(sum(CASE WHEN in_mh AND in_sh THEN w END), 0) AS bigint) AS n_mh_sh,
       cast(coalesce(sum(CASE WHEN in_mh AND in_em THEN w END), 0) AS bigint) AS n_mh_em,
       cast(coalesce(sum(CASE WHEN in_sh AND in_em THEN w END), 0) AS bigint) AS n_sh_em,
       cast(coalesce(sum(CASE WHEN in_mh AND in_sh AND in_em THEN w END), 0) AS bigint) AS n_all
FROM rp
"""


def decomposed_counts(con, oracle):
    mh, sh, em = class_pair_sets(oracle)
    con.execute(f"CREATE OR REPLACE TEMP TABLE smh AS {mh}")
    con.execute(f"CREATE OR REPLACE TEMP TABLE ssh AS {sh}")
    con.execute(f"CREATE OR REPLACE TEMP TABLE sem AS {em}")
    # The rc build below LEFT-JOINs vm on vm.id = d.doc_id, i.e. it
    # assumes every embeddings.vec_id IS a documents.doc_id (true for
    # the generator: both id spaces contiguous from 0, fewer vecs than
    # docs). That containment is an ASSUMPTION on top of the class-
    # determinism argument, not implied by it — a dataset violating it
    # would silently drop those vectors from n_embed, so assert it
    # (r13 advisory) instead of trusting it.
    orphans = con.execute(
        "SELECT count(*) FROM embeddings e ANTI JOIN documents d "
        "ON e.vec_id = d.doc_id").fetchone()[0]
    assert orphans == 0, (
        f"{orphans} embeddings have no matching documents.doc_id — the "
        "refined-class LEFT JOIN would drop them; decomposition invalid "
        "for this dataset")
    # refined classes: (text class, vec class-or-null) with member counts;
    # rid is an arbitrary stable key for pair normalization
    con.execute("""
CREATE OR REPLACE TEMP TABLE rc AS
WITH dtext AS (SELECT min(doc_id) AS tid, text FROM documents GROUP BY text),
dvec AS (SELECT min(vec_id) AS vid, embedding FROM embeddings GROUP BY embedding),
vm AS (SELECT e.vec_id AS id, dv.vid
       FROM embeddings e JOIN dvec dv ON e.embedding = dv.embedding)
SELECT t.tid, vm.vid, count(*) AS m,
       row_number() OVER (ORDER BY t.tid, coalesce(vm.vid, -1)) AS rid
FROM documents d
JOIN dtext t ON d.text = t.text
LEFT JOIN vm ON vm.id = d.doc_id
GROUP BY t.tid, vm.vid""")
    # refined-class pairs carrying any method's verdict + member weight
    con.execute("""
CREATE OR REPLACE TEMP TABLE rp AS
SELECT CASE WHEN a.rid = b.rid THEN a.m * (a.m - 1) // 2
            ELSE a.m * b.m END AS w,
       mh.ta IS NOT NULL AS in_mh,
       sh.ta IS NOT NULL AS in_sh,
       em.va IS NOT NULL AS in_em
FROM rc a JOIN rc b ON a.rid <= b.rid
LEFT JOIN smh mh ON mh.ta = least(a.tid, b.tid)
                AND mh.tb = greatest(a.tid, b.tid)
LEFT JOIN ssh sh ON sh.ta = least(a.tid, b.tid)
                AND sh.tb = greatest(a.tid, b.tid)
LEFT JOIN sem em ON a.vid IS NOT NULL AND b.vid IS NOT NULL
                AND em.va = least(a.vid, b.vid)
                AND em.vb = greatest(a.vid, b.vid)
WHERE mh.ta IS NOT NULL OR sh.ta IS NOT NULL OR em.va IS NOT NULL""")
    return AGREEMENT


def main(sf_dir, out_dir):
    name = "q_dedup_agreement"
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = connect(sf_dir)
    dec = decomposed_counts(con, oracle)
    cols = [r[0] for r in
            con.execute(f"DESCRIBE SELECT * FROM ({dec}) z LIMIT 0").fetchall()]
    got = agg_of(con, dec, cols)
    if os.environ.get("VALIDATE"):
        exp = agg_of(con, oracle[name], cols)
        tag = "vs committed oracle"
    else:
        exp = agg_of(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'", cols)
        tag = "vs spark dump"
    if got == exp:
        print(f"OK   {name}: {got[0]} rows {tag} "
              f"(count+sum+xor of 64-bit line hashes match)")
        print("ALL GREEN")
        return 0
    print(f"FAIL {name}: decomposed(n={got[0]},s={got[1]:x},x={got[2]:x}) "
          f"{tag}(n={exp[0]},s={exp[1]:x},x={exp[2]:x})")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
