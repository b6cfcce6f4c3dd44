#!/usr/bin/env python3
"""Decomposed DuckDB oracles for the five sf10 pair queries whose
committed formulations materialize a quadratic member-level join
(500k-row doc space -> 10^10-row intermediates -> the BATCH3 disk-full
FAILs and the q_embed_neardup >900s SKIP).

Key fact making an EXACT decomposition possible: GenScale replicas are
byte-identical, so every pair signature (dhash grid, audio sign vector,
video frame hash, SRP bucket + cosine, minhash band key, edit distance)
is a function of the TEXT/EMBEDDING CONTENT only. Group the corpus into
content classes (4,992 distinct texts / 2,000 distinct vectors at sf10),
run the committed oracle's OWN signature SQL once per class x variant
(linear, tiny), pair at the class level, then expand member pairs from
the class-pair table - the expansion streams straight into the
count+sum+xor line-hash aggregate (tools/sf10_big_oracle.agg_of), never
materializing the quadratic intermediate. Bucket-size caps (BETWEEN 2
AND 1000, <= 100000) are enforced on MEMBER counts via sum(class size),
exactly as the committed oracle counts them.

The signature CTEs below are the committed oracle_sql.json CTEs verbatim
with doc_id/vec_id -> class id (tid) - semantics identical by
construction, not a re-derivation.

Usage:
  python3 tools/sf10_pair_oracle.py <sfDir> <outDir> [q1,q2,...]
     compare decomposed oracle vs graft.Verify dumps in <outDir>
  VALIDATE=1 python3 tools/sf10_pair_oracle.py <sfDir> <outDir> [qs]
     compare decomposed oracle vs the COMMITTED oracle SQL from
     <outDir>/oracle_sql.json on <sfDir> (run at sf0.01 and sf0.1,
     where the committed quadratic formulation still fits, BEFORE
     trusting the decomposition at sf10).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sf10_big_oracle import agg_of, connect  # noqa: E402

# Shared class/member scaffolding over documents. Variant arms mirror
# the committed oracles' UNION ALL arms (same id offsets, same filters).
DTEXT = "SELECT min(doc_id) AS tid, text FROM documents GROUP BY text"
MEM = "SELECT d.doc_id AS id, t.tid FROM documents d JOIN dtext t ON d.text = t.text"

IMAGE_NEARDUP = f"""
WITH dtext AS ({DTEXT}),
cls AS (
  SELECT tid, text, 0 AS delta FROM dtext
  UNION ALL
  SELECT tid, text, 8 FROM dtext),
cells AS (
  SELECT tid, delta, c // 9 AS gy, c % 9 AS gx,
         (list_sum(list_transform(generate_series(0, 15), k ->
            32 + delta + (CASE WHEN length(text) = 0 THEN 0 ELSE
              ascii(substring(text,
                ((((c // 9) * 4 + k // 4) * 36
                  + (c % 9) * 4 + (k % 4))
                 % length(text)) + 1, 1)) % 192 END))))
           // 16 AS cell
  FROM cls, unnest(generate_series(0, 71)) AS u(c)),
signs AS (
  SELECT tid, delta, gy, gx,
         (cell < lead(cell) OVER (PARTITION BY tid, delta, gy ORDER BY gx)) AS sign
  FROM cells QUALIFY gx < 8),
w AS (
  SELECT tid, delta,
         bit_or(CASE WHEN sign AND gy * 8 + gx >= 32
                     THEN 1::BIGINT << (gy * 8 + gx - 32) ELSE 0 END) AS whi,
         bit_or(CASE WHEN sign AND gy * 8 + gx < 32
                     THEN 1::BIGINT << (gy * 8 + gx) ELSE 0 END) AS wlo
  FROM signs GROUP BY tid, delta),
memv AS (
  SELECT id, tid, 0 AS delta FROM ({MEM})
  UNION ALL
  SELECT d.doc_id + 1099511627776, t.tid, 8
  FROM documents d JOIN dtext t ON d.text = t.text
  WHERE d.doc_id % 7 = 0),
-- maxBucket cap, member-weighted (see AUDIO_NEARDUP): hash bit =
-- gy*8+gx, so band b = bits 16b..16b+15
ibv AS (
  SELECT tid, delta, gb.bd,
         CASE gb.bd WHEN 0 THEN wlo & 65535
                    WHEN 1 THEN (wlo >> 16) & 65535
                    WHEN 2 THEN whi & 65535
                    ELSE (whi >> 16) & 65535 END AS v
  FROM w, unnest(generate_series(0, 3)) AS gb(bd)),
imsize AS (SELECT tid, delta, count(*) AS m FROM memv GROUP BY 1, 2),
ibsize AS (SELECT ibv.bd, ibv.v, sum(ms.m) AS n
           FROM ibv JOIN imsize ms USING (tid, delta) GROUP BY 1, 2),
iokb AS (SELECT bd, v FROM ibsize WHERE n BETWEEN 2 AND 1000),
cp AS (
  SELECT a.tid AS ta, a.delta AS da, b.tid AS tb, b.delta AS db2,
         bit_count(xor(a.whi, b.whi)) + bit_count(xor(a.wlo, b.wlo)) AS h
  FROM w a JOIN w b
    ON a.tid < b.tid OR (a.tid = b.tid AND a.delta <= b.delta)
  WHERE bit_count(xor(a.whi, b.whi)) + bit_count(xor(a.wlo, b.wlo)) <= 3
    AND EXISTS (SELECT 1 FROM ibv x
                JOIN ibv y ON y.bd = x.bd AND y.v = x.v
                JOIN iokb k ON k.bd = x.bd AND k.v = x.v
                WHERE x.tid = a.tid AND x.delta = a.delta
                  AND y.tid = b.tid AND y.delta = b.delta))
SELECT least(ma.id, mb.id) AS doc_a, greatest(ma.id, mb.id) AS doc_b,
       CAST(cp.h AS int) AS hamming
FROM cp
JOIN memv ma ON ma.tid = cp.ta AND ma.delta = cp.da
JOIN memv mb ON mb.tid = cp.tb AND mb.delta = cp.db2
WHERE ma.id < mb.id OR NOT (cp.ta = cp.tb AND cp.da = cp.db2)
"""

AUDIO_NEARDUP = f"""
WITH dtext AS ({DTEXT}),
cls AS (
  SELECT tid, text, 1 AS factor FROM dtext
  UNION ALL
  SELECT tid, text, 2 FROM dtext),
aen AS (
  SELECT tid, factor, w,
         list_sum(list_transform(generate_series(0, 15), k ->
           (((CASE WHEN length(text) = 0 THEN 0 ELSE
              ascii(substring(text,
                ((w * 16 + k) % length(text)) + 1, 1)) - 64
              END) * 256 * factor)::BIGINT) * (((CASE WHEN length(text) = 0 THEN 0 ELSE
              ascii(substring(text,
                ((w * 16 + k) % length(text)) + 1, 1)) - 64
              END) * 256 * factor)::BIGINT))) AS e
  FROM cls, unnest(generate_series(0, 64)) AS u(w)),
asigns AS (
  SELECT tid, factor, w AS bit,
         (e < lead(e) OVER (PARTITION BY tid, factor ORDER BY w)) AS sign
  FROM aen QUALIFY w < 64),
wv AS (
  SELECT tid, factor,
         bit_or(CASE WHEN sign AND bit >= 32
                     THEN 1::BIGINT << (bit - 32) ELSE 0 END) AS whi,
         bit_or(CASE WHEN sign AND bit < 32
                     THEN 1::BIGINT << bit ELSE 0 END) AS wlo
  FROM asigns GROUP BY tid, factor),
memv AS (
  SELECT id, tid, 1 AS factor FROM ({MEM})
  UNION ALL
  SELECT d.doc_id + 2199023255552, t.tid, 2
  FROM documents d JOIN dtext t ON d.text = t.text
  WHERE d.doc_id % 5 = 0),
-- maxBucket cap, member-weighted at the class level: band b of the
-- 64-bit hash = bits 16b..16b+15 (wlo = bits 0..31, whi = 32..63);
-- a bucket's fingerprint count = sum of member counts over the class
-- arms carrying that band value (factor never flips a sign, so both
-- arms of a class share band values)
bv AS (
  SELECT tid, factor, gb.bd,
         CASE gb.bd WHEN 0 THEN wlo & 65535
                    WHEN 1 THEN (wlo >> 16) & 65535
                    WHEN 2 THEN whi & 65535
                    ELSE (whi >> 16) & 65535 END AS v
  FROM wv, unnest(generate_series(0, 3)) AS gb(bd)),
msize AS (SELECT tid, factor, count(*) AS m FROM memv GROUP BY 1, 2),
bsize AS (SELECT bv.bd, bv.v, sum(ms.m) AS n
          FROM bv JOIN msize ms USING (tid, factor) GROUP BY 1, 2),
okb AS (SELECT bd, v FROM bsize WHERE n BETWEEN 2 AND 1000),
cp AS (
  SELECT a.tid AS ta, a.factor AS fa, b.tid AS tb, b.factor AS fb,
         bit_count(xor(a.whi, b.whi)) + bit_count(xor(a.wlo, b.wlo)) AS h
  FROM wv a JOIN wv b
    ON a.tid < b.tid OR (a.tid = b.tid AND a.factor <= b.factor)
  WHERE bit_count(xor(a.whi, b.whi)) + bit_count(xor(a.wlo, b.wlo)) <= 3
    AND EXISTS (SELECT 1 FROM bv x
                JOIN bv y ON y.bd = x.bd AND y.v = x.v
                JOIN okb k ON k.bd = x.bd AND k.v = x.v
                WHERE x.tid = a.tid AND x.factor = a.factor
                  AND y.tid = b.tid AND y.factor = b.factor))
SELECT least(ma.id, mb.id) AS doc_a, greatest(ma.id, mb.id) AS doc_b,
       CAST(cp.h AS int) AS hamming
FROM cp
JOIN memv ma ON ma.tid = cp.ta AND ma.factor = cp.fa
JOIN memv mb ON mb.tid = cp.tb AND mb.factor = cp.fb
WHERE ma.id < mb.id OR NOT (cp.ta = cp.tb AND cp.fa = cp.fb)
"""

VIDEO_SHARED = f"""
WITH dtext AS ({DTEXT}),
vcls AS (
  SELECT tid, text, 0 AS delta, 0 AS f0, 0 AS vr FROM dtext
  UNION ALL
  SELECT tid, text, 8, 0, 1 FROM dtext
  UNION ALL
  SELECT tid, text, 0, 1, 2 FROM dtext),
vcells AS (
  SELECT tid, vr, f, c // 9 AS gy, c % 9 AS gx,
         (list_sum(list_transform(generate_series(0, 15), k ->
            32 + delta + (CASE WHEN length(text) = 0 THEN 0 ELSE
              ascii(substring(text,
                ((f * 997 + (((c // 9) * 4 + k // 4) * 36
                  + (c % 9) * 4 + (k % 4)))
                 % length(text)) + 1, 1)) % 192 END))))
           // 16 AS cell
  FROM vcls,
       unnest(generate_series(0, 3)) AS uf(f),
       unnest(generate_series(0, 71)) AS u(c)
  WHERE f >= f0),
vsigns AS (
  SELECT tid, vr, f, gy * 8 + gx AS bit,
         (cell < lead(cell) OVER (PARTITION BY tid, vr, f, gy ORDER BY gx)) AS sign
  FROM vcells QUALIFY gx < 8),
vh AS (
  SELECT tid, vr, f,
         coalesce(sum(CASE WHEN sign AND bit >= 32
                           THEN 1::BIGINT << (bit - 32) ELSE 0 END), 0) AS hi,
         coalesce(sum(CASE WHEN sign AND bit < 32
                           THEN 1::BIGINT << bit ELSE 0 END), 0) AS lo
  FROM vsigns GROUP BY tid, vr, f),
vhd AS (SELECT DISTINCT tid, vr, hi, lo FROM vh),
csize AS (SELECT tid, vr, count(*) AS n FROM vhd GROUP BY tid, vr),
memv AS (
  SELECT id, tid, 0 AS vr FROM ({MEM})
  UNION ALL
  SELECT d.doc_id + 4398046511104, t.tid, 1
  FROM documents d JOIN dtext t ON d.text = t.text WHERE d.doc_id % 7 = 0
  UNION ALL
  SELECT d.doc_id + 4398046511104, t.tid, 2
  FROM documents d JOIN dtext t ON d.text = t.text WHERE d.doc_id % 7 = 1),
mcount AS (SELECT tid, vr, count(*) AS m FROM memv GROUP BY tid, vr),
okh AS (SELECT hi, lo FROM vhd JOIN mcount USING (tid, vr)
        GROUP BY hi, lo HAVING sum(m) >= 2 AND sum(m) <= 1000),
cp AS (
  SELECT a.tid AS ta, a.vr AS va, b.tid AS tb, b.vr AS vb,
         count(*) AS shared
  FROM vhd a
  JOIN okh ON a.hi = okh.hi AND a.lo = okh.lo
  JOIN vhd b ON a.hi = b.hi AND a.lo = b.lo
           AND (a.tid < b.tid OR (a.tid = b.tid AND a.vr <= b.vr))
  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2)
SELECT least(ma.id, mb.id) AS doc_a, greatest(ma.id, mb.id) AS doc_b,
       cast(cp.shared AS bigint) AS shared_frames,
       CASE WHEN ma.id < mb.id THEN sa.n ELSE sb.n END AS n_a,
       CASE WHEN ma.id < mb.id THEN sb.n ELSE sa.n END AS n_b
FROM cp
JOIN memv ma ON ma.tid = cp.ta AND ma.vr = cp.va
JOIN memv mb ON mb.tid = cp.tb AND mb.vr = cp.vb
JOIN csize sa ON sa.tid = cp.ta AND sa.vr = cp.va
JOIN csize sb ON sb.tid = cp.tb AND sb.vr = cp.vb
WHERE ma.id < mb.id OR NOT (cp.ta = cp.tb AND cp.va = cp.vb)
"""

PAIR_EDITDIST = f"""
WITH dtext AS ({DTEXT}),
t AS (SELECT tid, text,
             list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
      FROM dtext),
sh AS (SELECT tid, unnest(list_distinct(list_transform(
              generate_series(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1]))) AS shingle
       FROM t),
sig AS (SELECT tid,
               min(md5('0:' || shingle)) AS mh_0, min(md5('1:' || shingle)) AS mh_1,
               min(md5('2:' || shingle)) AS mh_2, min(md5('3:' || shingle)) AS mh_3,
               min(md5('4:' || shingle)) AS mh_4, min(md5('5:' || shingle)) AS mh_5
        FROM sh GROUP BY tid),
bands AS (SELECT 0 AS band, mh_0 || '|' || mh_1 AS band_key, tid FROM sig
          UNION ALL SELECT 1, mh_2 || '|' || mh_3, tid FROM sig
          UNION ALL SELECT 2, mh_4 || '|' || mh_5, tid FROM sig),
memv AS ({MEM}),
mcount AS (SELECT tid, count(*) AS m FROM memv GROUP BY tid),
ok AS (SELECT band, band_key FROM bands JOIN mcount USING (tid)
       GROUP BY band, band_key HAVING sum(m) BETWEEN 2 AND 1000),
clp AS (SELECT DISTINCT a.tid AS ta, b.tid AS tb
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.tid <= b.tid
        JOIN ok ON a.band = ok.band AND a.band_key = ok.band_key),
ed AS (SELECT clp.ta, clp.tb,
              cast(levenshtein(substring(x.text, 1, 200),
                               substring(y.text, 1, 200)) AS int) AS d
       FROM clp JOIN dtext x ON x.tid = clp.ta
                JOIN dtext y ON y.tid = clp.tb)
SELECT least(ma.id, mb.id) AS doc_a, greatest(ma.id, mb.id) AS doc_b,
       CASE WHEN ed.d <= 32 THEN ed.d ELSE -1 END AS editdist
FROM ed JOIN memv ma ON ma.tid = ed.ta
        JOIN memv mb ON mb.tid = ed.tb
WHERE ma.id < mb.id OR ed.ta <> ed.tb
"""


def embed_neardup(committed_sql):
    """The SRP-plane expression is a 4x64-literal wall; splice the
    committed oracle's own `wb` select list (vec_id -> tid) instead of
    repeating it, so the two cannot drift."""
    start = committed_sql.index("wb AS (")
    end = committed_sql.index("ok AS (")
    wb = committed_sql[start:end].replace("vec_id", "tid")
    return f"""
WITH dvec AS (SELECT min(vec_id) AS tid, embedding
              FROM embeddings GROUP BY embedding),
e AS (SELECT tid, list_transform(embedding, x -> cast(x AS double)) AS v
      FROM dvec),
{wb}
memv AS (SELECT e2.vec_id AS id, d.tid
         FROM embeddings e2 JOIN dvec d ON e2.embedding = d.embedding),
mcount AS (SELECT tid, count(*) AS m FROM memv GROUP BY tid),
okb AS (SELECT bucket FROM wb JOIN mcount USING (tid)
        GROUP BY bucket HAVING sum(m) <= 100000),
cp AS (SELECT a.tid AS ta, b.tid AS tb,
              list_reduce(list_transform(generate_series(1, 64),
                i -> a.v[i] * b.v[i]), (x, y) -> x + y) / (a.nrm * b.nrm) AS cos_sim
       FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.tid <= b.tid
       JOIN okb ON a.bucket = okb.bucket)
SELECT least(ma.id, mb.id) AS vec_a, greatest(ma.id, mb.id) AS vec_b,
       cp.cos_sim
FROM (SELECT * FROM cp WHERE cos_sim >= 0.4) cp
JOIN memv ma ON ma.tid = cp.ta
JOIN memv mb ON mb.tid = cp.tb
WHERE ma.id < mb.id OR cp.ta <> cp.tb
"""


def decomposed(name, oracle):
    return {
        "q_image_neardup": lambda: IMAGE_NEARDUP,
        "q_audio_neardup": lambda: AUDIO_NEARDUP,
        "q_video_shared": lambda: VIDEO_SHARED,
        "q_pair_editdist": lambda: PAIR_EDITDIST,
        "q_embed_neardup": lambda: embed_neardup(oracle["q_embed_neardup"]),
    }[name]()


def main(sf_dir, out_dir, names):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    validate = bool(os.environ.get("VALIDATE"))
    con = connect(sf_dir)
    fails = 0
    for name in names:
        dec = decomposed(name, oracle)
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
        sys.stdout.flush()
    print("ALL GREEN" if fails == 0 else f"{fails} FAILURES")
    return 1 if fails else 0


if __name__ == "__main__":
    qs = (sys.argv[3].split(",") if len(sys.argv) > 3 else
          ["q_image_neardup", "q_audio_neardup", "q_video_shared",
           "q_embed_neardup", "q_pair_editdist"])
    sys.exit(main(sys.argv[1], sys.argv[2], qs))
