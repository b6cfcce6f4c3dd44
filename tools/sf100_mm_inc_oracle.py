#!/usr/bin/env python3
"""Decomposed oracles for the three multimodal incremental gates
(q_image_incremental, q_audio_incremental, q_video_incremental) at big
SFs, where the committed formulations die two ways at sf100:

1. The SIGNATURE CTEs are evaluated per member — 5.7M image rows x 72
   cells x 16-char list folds (~6.5B list ops) and the video variant
   x4 frames — DuckDB spills >50 GB on the signature stage alone.
   Signatures are pure functions of (text class, variant arm), so they
   are computed once per class x variant (<=15k rows) using the SAME
   class CTEs tools/sf10_pair_oracle.py validated at sf0.01/sf0.1/sf10,
   then expanded to members by the id-arithmetic arm joins.
2. The image/audio within-batch arm is a bucket self-join
   (bt x bt ON b, v AND y.doc_id < x.doc_id) — ~5B intermediate rows at
   sf100 replica density. "An earlier same-bucket doc exists" is
   algebraically "doc_id > min(doc_id) OVER (PARTITION BY b, v)", so
   the arm is rewritten to the window form. (Video's committed gate is
   already min-based and needs only the signature decomposition.)

Everything downstream of the signature frame — the store/batch split,
drop rules, thresholds — is taken VERBATIM from the committed oracle
SQL in <outDir>/oracle_sql.json by slicing at the first store CTE, so
constants and gate logic cannot drift. Validated against the unmodified
committed oracles at sf0.01 AND sf0.1 (VALIDATE=1) before use at big SF.

Usage:
  python3 tools/sf100_mm_inc_oracle.py <sfDir> <outDir> [q1,q2,...]
  VALIDATE=1 python3 tools/sf100_mm_inc_oracle.py <sfDir> <outDir> [qs]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sf10_big_oracle import agg_of, connect  # noqa: E402

DTEXT = "SELECT min(doc_id) AS tid, text FROM documents GROUP BY text"
MEM = ("SELECT d.doc_id AS id, t.tid FROM documents d "
       "JOIN dtext t ON d.text = t.text")

# Class-level signature heads — the sf10_pair_oracle.py class CTEs
# (image cells/signs/w/ibv, audio aen/asigns/wv/bv, video vcells/vsigns/
# vh/vhd) verbatim, each ending in a member-expanded frame named exactly
# like the committed oracle's per-doc frame (bands / abands / vhd).
IMAGE_HEAD = f"""
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
ibv AS (
  SELECT tid, delta, gb.bd,
         CASE gb.bd WHEN 0 THEN wlo & 65535
                    WHEN 1 THEN (wlo >> 16) & 65535
                    WHEN 2 THEN whi & 65535
                    ELSE (whi >> 16) & 65535 END AS v
  FROM w, unnest(generate_series(0, 3)) AS gb(bd)),
memv AS (
  SELECT id, tid, 0 AS delta FROM ({MEM})
  UNION ALL
  SELECT d.doc_id + 1099511627776, t.tid, 8
  FROM documents d JOIN dtext t ON d.text = t.text
  WHERE d.doc_id % 7 = 0),
bands AS (SELECT m.id AS doc_id, i.bd AS b, i.v
          FROM memv m JOIN ibv i ON i.tid = m.tid AND i.delta = m.delta),
"""

AUDIO_HEAD = f"""
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
asigns_c AS (
  SELECT tid, factor, w AS bit,
         (e < lead(e) OVER (PARTITION BY tid, factor ORDER BY w)) AS sign
  FROM aen QUALIFY w < 64),
wv AS (
  SELECT tid, factor,
         bit_or(CASE WHEN sign AND bit >= 32
                     THEN 1::BIGINT << (bit - 32) ELSE 0 END) AS whi,
         bit_or(CASE WHEN sign AND bit < 32
                     THEN 1::BIGINT << bit ELSE 0 END) AS wlo
  FROM asigns_c GROUP BY tid, factor),
bv AS (
  SELECT tid, factor, gb.bd,
         CASE gb.bd WHEN 0 THEN wlo & 65535
                    WHEN 1 THEN (wlo >> 16) & 65535
                    WHEN 2 THEN whi & 65535
                    ELSE (whi >> 16) & 65535 END AS v
  FROM wv, unnest(generate_series(0, 3)) AS gb(bd)),
memv AS (
  SELECT id, tid, 1 AS factor FROM ({MEM})
  UNION ALL
  SELECT d.doc_id + 2199023255552, t.tid, 2
  FROM documents d JOIN dtext t ON d.text = t.text
  WHERE d.doc_id % 5 = 0),
abands AS (SELECT m.id AS doc_id, b.bd AS b, b.v
           FROM memv m JOIN bv b ON b.tid = m.tid AND b.factor = m.factor),
"""

VIDEO_HEAD = f"""
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
vhc AS (SELECT DISTINCT tid, vr, hi, lo FROM vh),
memv AS (
  SELECT id, tid, 0 AS vr FROM ({MEM})
  UNION ALL
  SELECT d.doc_id + 4398046511104, t.tid, 1
  FROM documents d JOIN dtext t ON d.text = t.text WHERE d.doc_id % 7 = 0
  UNION ALL
  SELECT d.doc_id + 4398046511104, t.tid, 2
  FROM documents d JOIN dtext t ON d.text = t.text WHERE d.doc_id % 7 = 1),
vhd AS (SELECT m.id AS doc_id, v.hi, v.lo
        FROM memv m JOIN vhc v ON v.tid = m.tid AND v.vr = m.vr),
"""

# (head, tail-start marker, quadratic arm -> window form or None)
SPLICE = {
    "q_image_incremental": (IMAGE_HEAD, "st AS (", (
        """SELECT DISTINCT x.doc_id FROM bt x
  JOIN bt y ON x.b = y.b AND x.v = y.v AND y.doc_id < x.doc_id""",
        """SELECT DISTINCT doc_id FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY b, v) AS mn FROM bt) z
  WHERE doc_id > mn""")),
    "q_audio_incremental": (AUDIO_HEAD, "ast AS (", (
        """SELECT DISTINCT x.doc_id FROM abt x
  JOIN abt y ON x.b = y.b AND x.v = y.v AND y.doc_id < x.doc_id""",
        """SELECT DISTINCT doc_id FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY b, v) AS mn FROM abt) z
  WHERE doc_id > mn""")),
    "q_video_incremental": (VIDEO_HEAD, "stv AS (", None),
}


def normalize(s):
    return " ".join(s.split())


def rewrite(name, sql):
    head, marker, quad = SPLICE[name]
    i = sql.index(marker)  # committed tail, verbatim from the store CTE on
    tail = sql[i:]
    if quad is not None:
        nt, nq = normalize(tail), normalize(quad[0])
        j = nt.find(nq)
        assert j >= 0, f"{name}: quadratic arm not found in committed tail"
        assert nt.find(nq, j + 1) < 0, f"{name}: arm not unique"
        tail = nt.replace(nq, normalize(quad[1]))
    return head + tail


def main(sf_dir, out_dir, names):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    validate = bool(os.environ.get("VALIDATE"))
    con = connect(sf_dir)
    fails = 0
    for name in names:
        dec = rewrite(name, oracle[name])
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
             sorted(SPLICE))
    sys.exit(main(sys.argv[1], sys.argv[2], names))
