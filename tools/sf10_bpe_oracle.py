#!/usr/bin/env python3
"""sf10 oracle for q_bpe_merges / q_bpe_encode. The committed oracles
are fixed VALUES tables generated from the sf0.01 gate corpus
(tools/gen_bpe_oracle.py) — correct for the driver's t2 gate, trivially
corpus-mismatched at any other SF. This runs the SAME independent naive
Python BPE (train + greedy encode) directly against the given corpus
and compares to the graft.Verify dumps.

Usage: python3 tools/sf10_bpe_oracle.py <sfDir> <outDir> [merges=12] [min_freq=2]
"""
import glob
import sys
from collections import Counter

import duckdb

EOW = "</w>"


def apply_merge(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def main(sf_dir, out_dir, num_merges=12, min_freq=2):
    con = duckdb.connect()
    src = f"{sf_dir}/documents.parquet"
    src = f"{src}/*.parquet" if glob.glob(f"{src}/*.parquet") else src
    # word counts in-database (500k docs); the BPE loop itself runs over
    # the DISTINCT-word state, which is corpus-size-independent
    wc = Counter(dict((w, c) for w, c in con.execute(
        f"""SELECT w, count(*) FROM (
              SELECT unnest(list_filter(string_split(text, ' '),
                                        x -> len(x) > 0)) AS w
              FROM '{src}') GROUP BY w""").fetchall()))
    state = {w: list(w) + [EOW] for w in wc}
    merges = []
    for rank in range(1, num_merges + 1):
        counts = Counter()
        for w, syms in state.items():
            f = wc[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (l, r), c = sorted(counts.items(),
                           key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        if c < min_freq:
            break
        merges.append((rank, l, r, c))
        state = {w: apply_merge(s, l, r) for w, s in state.items()}

    ok = True
    got = con.execute(
        f'''SELECT "rank", "left", "right", pair_freq
            FROM '{out_dir}/q_bpe_merges/*.parquet' ORDER BY "rank"'''
    ).fetchall()
    if [tuple(r) for r in got] == merges:
        print(f"OK   q_bpe_merges: {len(merges)} rows (py-BPE retrained on this corpus)")
    else:
        print(f"FAIL q_bpe_merges:\n  spark={got}\n  py   ={merges}")
        ok = False

    # greedy encode: units per DISTINCT word under the learned merges,
    # then per-doc (n_words, sum units) — compare against the dump
    units = {}
    for w in wc:
        syms = list(w) + [EOW]
        for _, l, r, _ in merges:
            if len(syms) > 1:
                syms = apply_merge(syms, l, r)
        units[w] = len(syms)
    con.execute("CREATE TABLE wu (w VARCHAR, u BIGINT)")
    con.executemany("INSERT INTO wu VALUES (?, ?)", list(units.items()))
    bad = con.execute(
        f"""WITH t AS (SELECT doc_id,
                              list_filter(string_split(text, ' '),
                                          x -> len(x) > 0) AS tk
                       FROM '{src}'),
            f AS (SELECT doc_id, unnest(tk) AS w FROM t),
            d AS (SELECT f.doc_id, count(*) AS n_words,
                         sum(wu.u) AS n_bpe_units
                  FROM f JOIN wu ON f.w = wu.w GROUP BY f.doc_id)
            SELECT count(*) FROM d
            JOIN '{out_dir}/q_bpe_encode/*.parquet' s USING (doc_id)
            WHERE s.n_words != d.n_words
               OR s.n_bpe_units != d.n_bpe_units""").fetchone()[0]
    n = con.execute(
        f"SELECT count(*) FROM '{out_dir}/q_bpe_encode/*.parquet'").fetchone()[0]
    nd = con.execute(f"SELECT count(*) FROM '{src}'").fetchone()[0]
    if bad == 0 and n == nd:
        print(f"OK   q_bpe_encode: {n} rows (py-BPE greedy encode)")
    else:
        print(f"FAIL q_bpe_encode: {bad} mismatched rows of {n} (docs {nd})")
        ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  *(int(a) for a in sys.argv[3:])))
