#!/usr/bin/env python3
"""Independent Python oracles for the two queries whose DuckDB oracle is
structurally infeasible at sf10 (r11 verdict item 1):

- q_cluster_sizes / q_dedup_clusters: the DuckDB oracle is a WITH
  RECURSIVE min-label propagation over the LSH pair graph; at sf10
  (214M candidate pairs) it spilled >65 GB of temp storage and
  exhausted the sandbox disk twice. Here: a vectorized numpy
  label-propagation union-find over the SPARK-DUMPED pair frame —
  O(edges × diameter) with ~seconds per pass — producing the exact
  (doc_id, cluster_id) assignment and the (cluster_sz, n_clusters)
  histogram. Independence: different algorithm, different runtime, no
  Spark; the pair INPUT is itself DuckDB-verified separately
  (tools/sf10_big_oracle.py).

- q_topspeed_state: the DuckDB oracle emulates the DeltaTrigger(50m) /
  TimeEvictor(10s) fold with a recursive CTE + LATERAL re-scan per
  firing — O(firings × partition), >600 s at sf10. Here: the same
  semantics as a per-car binary-search fold over the sorted event
  arrays (distance is nondecreasing, so the next firing is a
  searchsorted) — O(firings × log n + window scans).

Both oracles are VALIDATED at sf0.01/sf0.1 against the very DuckDB
formulations they replace (which are green there) before being trusted
at sf10: run with a small --data/--out first and the script compares
byte-identically the same way tools/local_verify.py does.

Usage:
  python3 tools/py_oracles.py clusters --out <verifyOutDir>
  python3 tools/py_oracles.py topspeed --data <sfDir> --out <verifyOutDir>

The <verifyOutDir> must contain the graft.Verify parquet dumps
(q_minhash_lsh_pairs/, q_dedup_clusters/, q_cluster_sizes/,
q_topspeed_state/). Exit 0 iff every comparison matches.
"""
import argparse
import glob
import sys

import numpy as np
import pyarrow.parquet as pq


def read_dump(out_dir, name, columns=None):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        raise SystemExit(f"no spark dump for {name} under {out_dir}")
    return pq.read_table(files, columns=columns)


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def df_hash(cols, rows):
    """Same multiset hash as tools/local_verify.py (sorted columns,
    sorted canon lines, md5)."""
    import hashlib
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for l in lines:
        h.update(l.encode())
        h.update(b"\n")
    return h.hexdigest(), len(rows)


def compare(name, cols, got_rows, exp_cols, exp_rows):
    if sorted(cols) != sorted(exp_cols):
        print(f"FAIL {name}: schema {sorted(cols)} vs {sorted(exp_cols)}")
        return False
    gh, gn = df_hash(cols, got_rows)
    eh, en = df_hash(exp_cols, exp_rows)
    if gh != eh:
        print(f"FAIL {name}: hash mismatch rows {gn} vs {en}")
        return False
    print(f"OK   {name}: {gn} rows (py-oracle)")
    return True


def union_find_labels(edges_a, edges_b):
    """Min-label propagation: labels[i] converges to the component's
    minimum member id. Vectorized passes; pointer-jumping after each."""
    ids = np.union1d(edges_a, edges_b)
    idx = {v: i for i, v in enumerate(ids)}
    u = np.searchsorted(ids, edges_a)
    v = np.searchsorted(ids, edges_b)
    labels = np.arange(len(ids), dtype=np.int64)
    while True:
        before = labels.copy()
        lu = labels[u]
        lv = labels[v]
        m = np.minimum(lu, lv)
        np.minimum.at(labels, u, m)
        np.minimum.at(labels, v, m)
        # pointer jumping to a fixpoint within this pass
        while True:
            nxt = labels[labels]
            if np.array_equal(nxt, labels):
                break
            labels = nxt
        if np.array_equal(before, labels):
            break
    assert len(idx) == len(ids)
    return ids, ids[labels]  # node id -> min-member id of its component


def run_clusters(out_dir, data_dir):
    t = read_dump(out_dir, "q_minhash_lsh_pairs", ["doc_a", "doc_b"])
    a = t.column("doc_a").to_numpy()
    b = t.column("doc_b").to_numpy()
    print(f"[py] union-find over {len(a)} pairs")
    nodes, labels = union_find_labels(a, b)

    ok = True
    # exact (doc_id, cluster_id) assignment vs the Spark dump
    exp = read_dump(out_dir, "q_dedup_clusters")
    got = list(zip(nodes.tolist(), labels.tolist()))
    ok &= compare("q_dedup_clusters", ["doc_id", "cluster_id"], got,
                  exp.column_names, [tuple(r) for r in
                                     zip(*[exp.column(c).to_pylist()
                                           for c in exp.column_names])])
    # (cluster_sz, n_clusters) histogram vs the Spark dump
    _, sizes = np.unique(labels, return_counts=True)
    sz, n = np.unique(sizes, return_counts=True)
    exp = read_dump(out_dir, "q_cluster_sizes")
    got = list(zip(sz.tolist(), n.tolist()))
    ok &= compare("q_cluster_sizes", ["cluster_sz", "n_clusters"], got,
                  exp.column_names, [tuple(r) for r in
                                     zip(*[exp.column(c).to_pylist()
                                           for c in exp.column_names])])

    # ---- cluster-derived keep/split queries (same recursive-CTE oracle
    # class): all documents, pair-participants carry their component's
    # min-member label, everything else is its own singleton cluster.
    import glob as _glob
    dfiles = _glob.glob(f"{data_dir}/documents.parquet/*.parquet") or \
        [f"{data_dir}/documents.parquet"]
    docs = pq.read_table(dfiles, columns=["doc_id", "n_chars"])
    did = docs.column("doc_id").to_numpy()
    nch = docs.column("n_chars").to_numpy()
    lbl_of = dict(zip(nodes.tolist(), labels.tolist()))
    cid = np.array([lbl_of.get(d, d) for d in did.tolist()], dtype=np.int64)
    in_pairs = np.isin(did, nodes)

    def cmp_if_present(name, cols, got_rows):
        nonlocal ok
        if _glob.glob(f"{out_dir}/{name}/*.parquet"):
            exp = read_dump(out_dir, name)
            ok &= compare(name, cols, got_rows, exp.column_names,
                          [tuple(r) for r in zip(*[exp.column(c).to_pylist()
                                                   for c in exp.column_names])])

    # q_dedup_keep: keep iff singleton or the component's min member
    cmp_if_present(
        "q_dedup_keep", ["doc_id", "cluster_id", "keep"],
        list(zip(did.tolist(), cid.tolist(), (did == cid).tolist())))

    # q_canonical_keep: keep the longest doc (ties -> lowest id) per cluster
    order = np.lexsort((did, -nch, cid))
    keep_canon = np.zeros(len(did), dtype=bool)
    first = np.ones(len(order), dtype=bool)
    first[1:] = cid[order][1:] != cid[order][:-1]
    keep_canon[order[first]] = True
    cmp_if_present(
        "q_canonical_keep", ["doc_id", "cluster_id", "keep"],
        list(zip(did.tolist(), cid.tolist(), keep_canon.tolist())))

    # q_split_leakage: hash split over PAIR-PARTICIPATING docs, clusters
    # with members on both sides of the train/test split
    if _glob.glob(f"{out_dir}/q_split_leakage/*.parquet"):
        import hashlib
        thresh = f"{int(0.1 * 4294967296.0):08x}"
        is_test = np.array(
            [hashlib.md5(str(d).encode()).hexdigest()[:8] < thresh
             for d in did.tolist()])
        sel = in_pairs
        agg = {}
        for c, t_ in zip(cid[sel].tolist(), is_test[sel].tolist()):
            tr, te = agg.get(c, (0, 0))
            agg[c] = (tr + (0 if t_ else 1), te + (1 if t_ else 0))
        got = [(c, tr, te) for c, (tr, te) in agg.items() if tr > 0 and te > 0]
        cmp_if_present("q_split_leakage", ["cluster_id", "n_train", "n_test"], got)
    return ok


def run_topspeed(data_dir, out_dir):
    files = glob.glob(f"{data_dir}/events.parquet/*.parquet") or \
        [f"{data_dir}/events.parquet"]
    t = pq.read_table(files, columns=["user_id", "value", "ts", "event_id"])
    user = t.column("user_id").to_numpy()
    speed = t.column("value").to_numpy().astype(np.float64)
    ts = t.column("ts")
    # ts ships as TIMESTAMP(NANOS)->int64 nanos (GenScale dirs) or
    # timestamp[us]; normalize to MICROS like Tables.events/epoch_ns//1000
    import pyarrow as pa
    if pa.types.is_integer(ts.type):
        ts_us = ts.to_numpy() // 1000
    else:
        ts_us = ts.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
    eid = t.column("event_id").to_numpy()

    car = (user % 10).astype(np.int64)
    order = np.lexsort((eid, ts_us, car))
    car, speed, ts_us, eid = car[order], speed[order], ts_us[order], eid[order]
    ispeed = np.trunc(speed).astype(np.int64)
    tms = ts_us // 1000

    out = []
    for c in np.unique(car):
        sel = car == c
        sp, it, tm = speed[sel], ispeed[sel], tms[sel]
        # round-half-AWAY-from-zero on non-negative speeds (numpy's rint
        # is half-to-even and would diverge from Spark/DuckDB round())
        dist = np.cumsum(np.floor(sp * 100 + 0.5).astype(np.int64)) / 360.0
        last_fired = 0.0
        rn = -1  # 0-based row BEFORE which nothing fired
        n = len(sp)
        while True:
            # next row (strictly after rn) with distance-last_fired >= 50;
            # searchsorted approximates (dist[j] >= last+50 is not IEEE-
            # identical to dist[j]-last >= 50), so re-anchor on the EXACT
            # predicate: scan BACKWARD while the previous row also fires
            # (a fixed backoff would miss a 3+-run of values within one
            # ulp of last_fired+50), then forward while this row doesn't
            j = max(np.searchsorted(dist, last_fired + 50.0, side="left"),
                    rn + 1)
            while j - 1 > rn and j - 1 < n and dist[j - 1] - last_fired >= 50.0:
                j -= 1
            while j < n and not (dist[j] - last_fired >= 50.0):
                j += 1
            if j >= n:
                break
            fire_tms = tm[j]
            lo = np.searchsorted(tm[:j + 1], fire_tms - 10000, side="left")
            w_sp, w_tm = it[lo:j + 1], tm[lo:j + 1]
            # max by (ispeed, tms, rn): lexsort-free argmax via keys
            k = np.lexsort((np.arange(lo, j + 1), w_tm, w_sp))[-1]
            out.append((int(c), int(w_sp[k]), float(dist[lo + k]),
                        int(w_tm[k])))
            last_fired = dist[j]
            rn = j
    exp = read_dump(out_dir, "q_topspeed_state")
    return compare("q_topspeed_state",
                   ["car_id", "speed", "distance", "time_ms"], out,
                   exp.column_names,
                   [tuple(r) for r in zip(*[exp.column(c).to_pylist()
                                            for c in exp.column_names])])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["clusters", "topspeed"])
    ap.add_argument("--data", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    a = ap.parse_args()
    ok = run_clusters(a.out, a.data) if a.which == "clusters" \
        else run_topspeed(a.data, a.out)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
