#!/usr/bin/env python3
"""Class-decomposed DuckDB oracle for q_vocab_encode at sf10, where the
committed formulation's per-doc list(... ORDER BY pos) aggregate over
~50M token rows exhausts DuckDB memory (non-spillable ordered-list
aggregate; OOM even at 96GB).

Same exactness argument as tools/sf10_pair_oracle.py: GenScale replicas
are byte-identical, so a doc's (n_tokens, ids) encode depends only on
its TEXT CLASS plus the global vocab ranking — and the global token
counts are exactly the class-level counts weighted by class member
multiplicity (count over all docs == sum over classes of in-class count
x members). Tokenize the 4,992 distinct texts once, rank the vocab from
the weighted counts, encode per class, then expand members by join —
every stage linear in distinct-text volume.

Usage mirrors sf10_pair_oracle.py:
  python3 tools/sf10_vocab_oracle.py <sfDir> <outDir>        vs spark dump
  VALIDATE=1 python3 tools/sf10_vocab_oracle.py <sfDir> <outDir>
      vs the committed oracle SQL (run at sf0.01 AND sf0.1 first)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sf10_big_oracle import agg_of, connect  # noqa: E402

DECOMPOSED = """
WITH dtext AS (SELECT min(doc_id) AS tid, text FROM documents GROUP BY text),
mem AS (SELECT d.doc_id AS id, t.tid
        FROM documents d JOIN dtext t ON d.text = t.text),
mc AS (SELECT tid, count(*) AS m FROM mem GROUP BY tid),
t AS (SELECT tid, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
      FROM dtext),
tok AS (SELECT tid, unnest(generate_series(1, len(tk))) AS pos,
               unnest(tk) AS tok FROM t),
vc AS (SELECT tok, sum(mc.m) AS cnt FROM tok JOIN mc USING (tid)
       GROUP BY tok HAVING sum(mc.m) >= 2),
rk AS (SELECT tok, tok_id FROM (
         SELECT tok, cast(row_number() OVER (
                  ORDER BY cnt DESC, tok) AS int) AS tok_id FROM vc) x
       WHERE tok_id <= 1000),
enc AS (SELECT t2.tid, cast(count(*) AS bigint) AS n_tokens,
               array_to_string(list(coalesce(rk.tok_id, 0)
                                    ORDER BY t2.pos), ' ') AS ids
        FROM tok t2 LEFT JOIN rk ON t2.tok = rk.tok
        GROUP BY t2.tid)
SELECT mem.id AS doc_id, enc.n_tokens, enc.ids
FROM mem JOIN enc USING (tid)
"""


def main(sf_dir, out_dir):
    name = "q_vocab_encode"
    con = connect(sf_dir)
    cols = [r[0] for r in
            con.execute(f"DESCRIBE SELECT * FROM ({DECOMPOSED}) z LIMIT 0")
            .fetchall()]
    got = agg_of(con, DECOMPOSED, cols)
    if os.environ.get("VALIDATE"):
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
        exp = agg_of(con, oracle[name], cols)
        tag = "vs committed oracle"
    else:
        exp = agg_of(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'", cols)
        tag = "vs spark dump"
    if got == exp:
        print(f"OK   {name}: {got[0]} rows {tag} "
              f"(count+sum+xor of 64-bit line hashes match)")
        return 0
    print(f"FAIL {name}: decomposed(n={got[0]},s={got[1]:x},x={got[2]:x}) "
          f"{tag}(n={exp[0]},s={exp[1]:x},x={exp[2]:x})")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
