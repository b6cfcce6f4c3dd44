#!/usr/bin/env python3
"""Mechanize the decomposed-oracle validation protocol (r12 verdict
stretch item 8): every class-decomposed big-SF oracle in tools/ must
reproduce the UNMODIFIED committed oracle_sql.json result at sf0.01 AND
sf0.1 — the two SFs where the committed (often quadratic/recursive)
formulation still fits — BEFORE its verdict is trusted at sf10/sf30/
sf100. Until now that was run tool-by-tool by discipline; this driver
runs the whole registry and fails loudly on the first divergence, so
whoever writes decomposer #10 gets the protocol for free by adding one
REGISTRY line.

Usage: python3 tools/validate_decomposition.py <outDirWithOracleJson>
       [sfDir1 sfDir2 ...]   (default /root/testdata/sf0.01 + sf0.1)

<outDirWithOracleJson> only needs oracle_sql.json (a fresh graft.Verify
dump dir works); VALIDATE mode never reads the parquet dumps.
Exit 0 = every decomposer ALL GREEN at every SF.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# (script, extra argv, env overrides). Scripts follow the shared
# `VALIDATE=1 tool.py <sfDir> <outDir> [names]` convention except
# sf100_skipgram_oracle.py, which spells it `<sfDir> --validate`.
REGISTRY = [
    ("sf10_pair_oracle.py", [], {}),
    ("sf100_cc_oracle.py", [], {}),
    ("sf100_simhash_pairs_oracle.py", ["q_simhash_pairs,q_simhash_pairs8"], {}),
    ("sf100_semdedup_oracle.py", [], {}),
    ("sf100_mm_inc_oracle.py", [], {}),
    ("sf100_recall_oracle.py", [], {}),
    ("sf10_vocab_oracle.py", [], {}),
    ("agreement_oracle.py", [], {}),
]


def run_one(script, sf_dir, out_dir, extra, env_over):
    env = dict(os.environ, VALIDATE="1", **env_over)
    cmd = [sys.executable, os.path.join(HERE, script), sf_dir, out_dir] + extra
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    # Green = clean exit + at least one per-query OK + no per-query FAIL.
    # (Most tools also print a final "ALL GREEN" banner, but
    # sf10_vocab_oracle's single-query path doesn't — requiring the
    # banner marked a genuinely green run as FAIL in r13.)
    lines = r.stdout.splitlines()
    n_ok = sum(1 for l in lines if l.startswith("OK "))
    n_fail = sum(1 for l in lines if l.startswith("FAIL"))
    ok = r.returncode == 0 and n_ok > 0 and n_fail == 0
    return ok, r.stdout + r.stderr


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    out_dir = sys.argv[1]
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    assert os.path.exists(os.path.join(out_dir, "oracle_sql.json")), \
        f"{out_dir}/oracle_sql.json missing — point at a graft.Verify dump dir"
    fails = 0
    for sf_dir in sf_dirs:
        for script, extra, env_over in REGISTRY:
            ok, out = run_one(script, sf_dir, out_dir, extra, env_over)
            status = "OK  " if ok else "FAIL"
            n_ok = out.count("\nOK ") + out.startswith("OK ")
            print(f"{status} {script} @ {os.path.basename(sf_dir)}"
                  f" ({n_ok} queries green)")
            if not ok:
                fails += 1
                print("  --- tool output ---")
                print("  " + "\n  ".join(out.strip().splitlines()[-15:]))
        # skipgram has its own validate spelling and no outDir dependency
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "sf100_skipgram_oracle.py"),
             sf_dir, "--validate"], capture_output=True, text=True)
        ok = r.returncode == 0
        print(f"{'OK  ' if ok else 'FAIL'} sf100_skipgram_oracle.py"
              f" @ {os.path.basename(sf_dir)}")
        if not ok:
            fails += 1
            print("  " + "\n  ".join((r.stdout + r.stderr).strip().splitlines()[-15:]))
    print("ALL DECOMPOSITIONS VALID" if fails == 0 else f"{fails} FAILURES")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
