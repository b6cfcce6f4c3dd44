#!/usr/bin/env python3
"""Memory-linear form of the q_recall_sweep oracle for big SFs. The
committed SQL's centroid-assignment window (`a0`/`r`) carries the full
64-double embedding list through a corpus x nlist frame — 32M rows x
~0.5 KB at sf100 — and DuckDB spills >45 GB sorting it. The vector
column is NOT used by the window itself, only re-read downstream, so
the rewrite (an algebraic identity, not a re-derivation):

  - drop `v` from `a0`/`r` (window input becomes (vec_id, cid, csim)),
  - re-attach `v` by an equi-join on vec_id in `corpus` and the
    per-nprobe `qN` CTEs that consumed `r.v`.

Everything else — cosine expressions, tie-breaks, probe arms, recall
joins — is the committed text verbatim. Validated against the
unmodified committed oracle at sf0.01 AND sf0.1 (VALIDATE=1) before
use at a big SF, per the tools/sf10_pair_oracle.py protocol.

Usage:
  python3 tools/sf100_recall_oracle.py <sfDir> <outDir>
  VALIDATE=1 python3 tools/sf100_recall_oracle.py <sfDir> <outDir>
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sf10_big_oracle import agg_of, connect  # noqa: E402


def rewrite(sql):
    out, n = re.subn(r"a0 AS \(SELECT e\.vec_id, e\.v, c\.cid,",
                     "a0 AS (SELECT e.vec_id, c.cid,", sql)
    assert n == 1, f"a0 pattern: {n} matches"
    out, n = re.subn(
        r"r AS \(SELECT vec_id, v, cid, row_number\(\)",
        "r AS (SELECT vec_id, cid, row_number()", out)
    assert n == 1, f"r pattern: {n} matches"
    out, n = re.subn(
        r"corpus AS \(SELECT vec_id, v, cid AS list FROM r WHERE rn = 1\)",
        "corpus AS (SELECT r.vec_id, e.v, r.cid AS list FROM r "
        "JOIN e ON e.vec_id = r.vec_id WHERE rn = 1)", out)
    assert n == 1, f"corpus pattern: {n} matches"
    out, n = re.subn(
        r"SELECT vec_id AS query_id, v AS qv, cid AS list FROM r\s+"
        r"WHERE vec_id < (\d+) AND rn <= (\d+)",
        r"SELECT r.vec_id AS query_id, e.v AS qv, r.cid AS list FROM r "
        r"JOIN e ON e.vec_id = r.vec_id WHERE r.vec_id < \1 AND rn <= \2",
        out)
    assert n >= 3, f"qN pattern: only {n} matches"
    return out


def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    validate = bool(os.environ.get("VALIDATE"))
    con = connect(sf_dir)
    name = "q_recall_sweep"
    dec = rewrite(oracle[name])
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
        print("ALL GREEN")
        return 0
    print(f"FAIL {name}: linear(n={got[0]},s={got[1]:x},x={got[2]:x}) "
          f"{tag}(n={exp[0]},s={exp[1]:x},x={exp[2]:x})")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
