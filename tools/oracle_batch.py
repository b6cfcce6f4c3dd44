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


# Engine-owned names only (r14 ADVICE): generic spark-*/blockmgr-* dirs
# in a shared tmp may belong to another user's (or a live-but-idle)
# Spark JVM — GraftSession routes ALL Spark scratch into the pid-tagged
# graft-spill-<pid> root instead, where ownership is decidable.
SCRATCH_PREFIXES = ("graft-spill-", "graft-spec-", "graft-warehouse",
                    "graft-soak", "graft-long-soak", "graft-ingest", "duck")


def tree_stats(path):
    """(total_bytes, newest_mtime) over a tree, lstat-based (symlinks
    count as their own link, never followed). Returns newest=None —
    "unknowable", the FRESH direction — on ANY enumeration error: an
    unreadable subtree must hide deletions, never enable them (r14
    ADVICE: the default os.walk silently skips unreadable dirs, making
    fresh files invisible). A plain-FILE entry gets its own stats (the
    old walk-only form never set newest for files, so stale scratch
    FILES were never reclaimed)."""
    errors = []
    try:
        st = os.lstat(path)
    except OSError:
        return 0, None
    import stat as stat_mod
    if not stat_mod.S_ISDIR(st.st_mode):
        return st.st_size, st.st_mtime
    newest, total = st.st_mtime, 0
    for r, dirs, files in os.walk(path, onerror=errors.append):
        for name in dirs + files:
            try:
                s = os.lstat(os.path.join(r, name))
                newest = max(newest, s.st_mtime)
                if not stat_mod.S_ISDIR(s.st_mode):
                    total += s.st_size
            except OSError as e:
                errors.append(e)
    if errors:
        return total, None
    return total, newest


def pid_alive(pid):
    """True/False where /proc exists; None (unanswerable) elsewhere."""
    if not os.path.isdir("/proc"):
        return None
    return os.path.exists(f"/proc/{pid}")


def sweep_stale_scratch(roots=("/tmp", "/root/repo/.tmp"),
                        max_age_s=24 * 3600):
    """Janitor (r13 verdict stretch item 8), Python twin of
    graft.core.DiskGuard.sweepStaleScratch: a KILLED oracle/soak run
    orphans its DUCKDB_TMP / Spark spill dirs (the r12 42 GB incident),
    and the pre-flight above then refuses healthy runs. Ownership tests,
    strongest first (kept in lockstep with the Scala janitor):
    graft-spill-<pid> roots are reclaimed iff their owning pid is DEAD
    (alive → never, any age; no /proc → idle-age fallback); everything
    else needs a full day of whole-tree idleness, where any enumeration
    error reads as FRESH. GRAFT_DISK_GUARD=0 disables."""
    if os.environ.get("GRAFT_DISK_GUARD", "1") == "0":
        return
    now = time.time()
    for root in roots:
        if not os.path.isdir(root):
            continue
        try:
            entries = os.listdir(root)
        except OSError:
            continue
        for entry in entries:
            if not entry.startswith(SCRATCH_PREFIXES):
                continue
            path = os.path.join(root, entry)
            alive = None
            pid_part = entry.split("-")[-1] \
                if entry.startswith(("graft-spill-", "graft-spec-")) else ""
            if pid_part.isdigit():
                pid = int(pid_part)
                if pid == os.getpid():
                    continue
                alive = pid_alive(pid)
            if alive is True:
                continue  # live owner — never touch, any age
            total, newest = tree_stats(path)
            idle_over_age = newest is not None and newest > 0 \
                and now - newest > max_age_s
            if alive is False or idle_over_age:
                if os.path.isdir(path) and not os.path.islink(path):
                    shutil.rmtree(path, ignore_errors=True)
                else:
                    try:
                        os.remove(path)
                    except OSError:
                        pass
                print(f"[disk-guard] reclaimed {total / 1e9:.2f} GB from "
                      f"{path}")


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
