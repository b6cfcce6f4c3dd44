#!/bin/bash
# Round-close archive lint (r14 verdict stretch item 8): machine-check
# SURVEY §15's end-of-round artifact policy — "at judge entry the
# worktree is clean modulo DRIVER-written files". Run as the LAST step
# of a building session; a non-empty worktree beyond the allowlist
# means work the session forgot to commit (or a capture that clobbered
# a committed baseline), which previously surfaced only as judge-side
# forensics (r14: LEAKCHECK.json modified-but-uncommitted).
#
# Exit 0 = clean (possibly listing expected driver files), 1 = dirty.
set -uo pipefail
cd /root/repo

# Files the DRIVER writes after the session ends (or rewrites each
# round): these being untracked/modified at round close is the policy,
# not a violation.
ALLOW='^(CORRECTNESS_r[0-9]+\.json|BENCH_r[0-9]+\.json|LEAKCHECK\.json|COPYCHECK\.json|PROGRESS\.jsonl|TESTDATA\.md|BASELINE\.(md|json)|VERDICT\.md|ADVICE\.md|BENCH_CONTENDED\.json)$'

dirty=0
while IFS= read -r line; do
  [ -z "$line" ] && continue
  f="${line:3}"
  # rename entries look like "old -> new"; check the destination
  f="${f##* -> }"
  if echo "$f" | grep -qE "$ALLOW"; then
    echo "allowed (driver file): $line"
  else
    echo "VIOLATION (uncommitted work at round close): $line"
    dirty=1
  fi
done < <(git status --porcelain)

if [ "$dirty" -eq 0 ]; then
  echo "ROUND-CLOSE CLEAN: worktree clean modulo driver files"
else
  echo "ROUND-CLOSE DIRTY: commit or discard the violations above"
fi
exit "$dirty"
