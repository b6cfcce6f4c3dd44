#!/usr/bin/env python3
"""Timeout-guarded sf10 oracle sweep: runs tools/local_verify.py one
query at a time in a subprocess with a wall-clock budget, so one
pathological DuckDB plan (the r11 disk-filling recursive CTEs) cannot
take down the whole batch — it becomes a SKIP line instead. Temp spill
is isolated per query under DUCKDB_TMP and deleted between queries.

Usage: python3 tools/oracle_batch.py <sfDir> <outDir> <budget_s> [names…]
names default to every query in <outDir>/oracle_sql.json.
"""
import json
import os
import shutil
import subprocess
import sys
import time


def dir_bytes(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def disk_shortfall(sf_dir, tmp):
    """Scratch pre-flight (r12 verdict item 3): a DuckDB oracle's spill
    is bounded in practice by a small multiple of its input (measured:
    the green sf10 sweep peaked well under 5x the 2 GB corpus; the
    committed pair/recursive formulations that exceeded it at sf100 are
    exactly the ones routed to the decomposed class oracles instead).
    Refuse to START a query when free < 1.5 x (factor x input) so a
    doomed run dies in second zero, not hour two. Returns the refusal
    message, or None. GRAFT_DISK_GUARD=0 bypasses."""
    if os.environ.get("GRAFT_DISK_GUARD", "1") == "0":
        return None
    factor = float(os.environ.get("GRAFT_ORACLE_SPILL_FACTOR", "5"))
    est = dir_bytes(sf_dir) * factor
    need = est * 1.5
    free = shutil.disk_usage(os.path.dirname(os.path.abspath(tmp)) or "/").free
    if free >= need:
        return None
    return (f"estimated spill {est / 1e9:.1f} GB (x1.5 margin = "
            f"{need / 1e9:.1f} GB) exceeds free {free / 1e9:.1f} GB — "
            f"short {(need - free) / 1e9:.1f} GB; free disk, lower "
            f"GRAFT_ORACLE_SPILL_FACTOR, or set GRAFT_DISK_GUARD=0")


SCRATCH_PREFIXES = ("spark-", "blockmgr-", "graft-warehouse", "graft-soak",
                    "graft-long-soak", "graft-ingest", "duck")


def sweep_stale_scratch(roots=("/tmp", "/root/repo/.tmp"),
                        max_age_s=24 * 3600):
    """Janitor (r13 verdict stretch item 8), Python twin of
    graft.core.DiskGuard.sweepStaleScratch: a KILLED oracle/soak run
    orphans its DUCKDB_TMP / Spark spill dirs (the r12 42 GB incident),
    and the pre-flight above then refuses healthy runs. Delete entries
    under the scratch roots that match OUR naming scheme and whose whole
    tree has been idle > 1 day (any fresh file inside protects a live
    concurrent run). GRAFT_DISK_GUARD=0 disables."""
    if os.environ.get("GRAFT_DISK_GUARD", "1") == "0":
        return
    now = time.time()
    for root in roots:
        if not os.path.isdir(root):
            continue
        for entry in os.listdir(root):
            if not entry.startswith(SCRATCH_PREFIXES):
                continue
            path = os.path.join(root, entry)
            newest, total = 0.0, 0
            for r, _, files in os.walk(path):
                try:
                    newest = max(newest, os.path.getmtime(r))
                except OSError:
                    pass
                for f in files:
                    try:
                        p = os.path.join(r, f)
                        newest = max(newest, os.path.getmtime(p))
                        total += os.path.getsize(p)
                    except OSError:
                        pass
            if newest and now - newest > max_age_s:
                shutil.rmtree(path, ignore_errors=True)
                print(f"[disk-guard] reclaimed {total / 1e9:.2f} GB from "
                      f"{path} (idle {(now - newest) / 3600:.0f}h)")


def main():
    sf_dir, out_dir, budget = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sweep_stale_scratch()
    names = sys.argv[4].split(",") if len(sys.argv) > 4 else \
        sorted(json.load(open(f"{out_dir}/oracle_sql.json")))
    tmp = os.environ.get("DUCKDB_TMP", "/root/repo/.tmp/duck")
    here = os.path.dirname(os.path.abspath(__file__))
    fails = skips = 0
    for name in names:
        # re-checked per query: progressive leakage (an orphaned spill
        # from an earlier query) should stop the batch, not crash it
        short = disk_shortfall(sf_dir, tmp)
        if short:
            print(f"SKIP {name}: disk guard — {short}")
            skips += 1
            continue
        env = dict(os.environ, VERIFY_ONLY=name, DUCKDB_TMP=tmp)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, f"{here}/local_verify.py", sf_dir, out_dir],
                env=env, timeout=budget, capture_output=True, text=True)
            line = next((l for l in r.stdout.splitlines()
                         if l.startswith(("OK", "FAIL"))), None)
            if line:
                print(f"{line}  [{time.time()-t0:.0f}s]")
                if line.startswith("FAIL"):
                    fails += 1
            else:
                print(f"FAIL {name}: no verdict line "
                      f"(rc={r.returncode}, stderr tail: "
                      f"{r.stderr.strip().splitlines()[-1] if r.stderr.strip() else ''})")
                fails += 1
        except subprocess.TimeoutExpired:
            print(f"SKIP {name}: oracle exceeded {budget}s")
            skips += 1
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        sys.stdout.flush()
    print(f"BATCH COMPLETE: {len(names) - fails - skips} ok, "
          f"{fails} fail, {skips} skip")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main())
