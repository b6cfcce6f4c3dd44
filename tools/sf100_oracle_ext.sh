#!/bin/bash
# sf100 oracle extension (r12): hash-check a representative non-TPC-H
# slice at 1000× the gate SF, so every query family has a hash point at
# sf100, not just the TPC-H shapes + 3 headliners.
#
# Two paths, chosen by OUTPUT size at sf100 (fetchall vs in-DuckDB
# count+sum+xor aggregate — see tools/sf10_big_oracle.py):
#   SMALL  → tools/oracle_batch.py (exact line-hash, per-query spill
#            isolation, budget-guarded)
#   BIG    → tools/sf10_big_oracle.py (≥5M-row outputs)
# Pair-materializing queries stay excluded (measured 1.92B-pair volume);
# q_neardup_after_exact IS included — it is the production ordering and
# its sf100 cost is bounded by the ~5k post-exact-dedup survivors.
set -uo pipefail
cd /root/repo
SF=/root/repo/testdata_sf100
OUT=/root/repo/.tmp/sf100ext
export DUCKDB_TMP=/root/repo/.tmp/duck100
export DUCKDB_MEM=${DUCKDB_MEM:-40GB}

SMALL=q_funnel,q_funnel_within,q_cohort,q_heavy_hitters,q_hh_merge,q_value_stats,q_dedup_exact,q_incremental_dedup,q_stratified_sample,q_hash_sample,q_mixture_rates,q_topk_per_group,q_group_quantiles,q_transitions,q_top_paths,q_skipgram,q_lang_agreement,q_vocab_coverage,q_sliding_sum,q_window_join,q_setops,q_weighted_interval,q_interval_count,q_neardup_after_exact,q_pair_volume
BIG=q_lang_id,q_token_count,q_fingerprint,q_sessionize,q_running_sum,q_asof_join

echo "== Spark dumps (graft.Verify subset) =="
SPARK_DRIVER_MEM=64g GRAFT_VERIFY_COALESCE=0 \
  tools/run_main.sh graft.Verify "$SF" "$OUT" "$SMALL,$BIG" 2>&1 \
  | grep -E "\[verify\]|Exception" || true

echo "== SMALL batch (exact line-hash, 1800 s/query) =="
python3 tools/oracle_batch.py "$SF" "$OUT" 1800 "$SMALL"

echo "== BIG batch (count+sum+xor aggregate) =="
IFS=, read -ra BIGQ <<< "$BIG"
for q in "${BIGQ[@]}"; do
  timeout 2400 python3 tools/sf10_big_oracle.py "$SF" "$OUT" "$q" \
    || echo "SKIP/FAIL $q (rc=$?)"
  rm -rf "$DUCKDB_TMP"
done
echo "== DONE =="
