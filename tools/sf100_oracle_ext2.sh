#!/bin/bash
# sf100 oracle extension, part 2 (r12): close the sf100 hash gap for
# EVERY remaining non-pair gated query — the 76 queries that ran in the
# sf100 suite capture (BENCH_SF100_SUITE.json) but never got a hash
# point. After this sweep the only queries without an sf100 hash are
# the pair-materializing class, whose exclusion is measured (1.92B-pair
# lshPairVolume pre-flight) and whose two archetypes are already
# hash-checked at sf100 (SF100_PAIR_ORACLE.log).
#
# Method (same as tools/sf100_oracle_ext.sh):
#   SMALL outputs  -> tools/oracle_batch.py (exact sorted line-hash,
#                     per-query temp-spill isolation, budget-guarded)
#   BIG (>=4M row) -> tools/sf10_big_oracle.py (in-DuckDB
#                     count+sum+xor over 64-bit line hashes)
#   q_bpe_*        -> tools/sf10_bpe_oracle.py (committed oracle is an
#                     sf0.01-fixture VALUES table by design; retrain)
#   q_vocab_encode -> tools/sf10_vocab_oracle.py (committed formulation
#                     OOMs DuckDB: non-spillable ordered-list agg)
#   q_topspeed_state -> tools/py_oracles.py topspeed (recursive-CTE
#                     oracle is O(firings x partition) in DuckDB)
#
# Disk discipline: BIG dumps are produced in chunks and DELETED after
# their oracle check — peak scratch stays under ~15 GB (the r11 sweep
# died twice on unmanaged spill).
set -uo pipefail
cd /root/repo
SF=/root/repo/testdata_sf100
OUT=/root/repo/.tmp/sf100ext2
export DUCKDB_TMP=/root/repo/.tmp/duck100b
export DUCKDB_MEM=${DUCKDB_MEM:-40GB}
mkdir -p "$OUT"

SMALL=q_adaptive_join,q_ann_recall,q_bloom_join,q_centroid_confusion,q_col_profile,q_cosine_topk,q_cube,q_filtered_ivf,q_filtered_topk,q_generator_domain,q_hashtags,q_ivf_probe2,q_ivf_topk,q_json_nested,q_keyed_sum,q_label_centroids,q_lsh_topk,q_maxby,q_pivot,q_postings,q_range_join,q_rank_topk,q_recall_sweep,q_rolling_active,q_rollup,q_skew_profile,q_source_overlap,q_tokenize_ws,q_tweet_wordcount,q_window_sum,q_wordcount

BIG_CHUNKS=(
  q_asof_native,q_attribution,q_attribution_asof,q_filter_eq,q_frame_sample
  q_async_identity,q_json_extract,q_lag_delta,q_parse_cast
  q_try_parse,q_window_ranks,q_session_sum,q_session_funnel
  q_scd2,q_scd2_merge,q_topspeed_bucket,q_det_shuffle
  q_conditional_fanout,q_tfidf_stats,q_quantize_int8
  q_boilerplate,q_decontaminate,q_lm_score,q_minhash_sig,q_novelty,q_simhash
  q_pii_redact,q_quality_band,q_quality_calibrated,q_quality_score,q_repetition,q_scan_text
  q_multimodal_decode,q_multimodal_meta,q_pack_sequences,q_train_test_split,q_truncate_tokens,q_mix_epochs,q_mixture_sample,q_audio_fingerprint,q_image_dhash
)

dump() { # dump <namesCsv> — graft.Verify subset at 64g, multi-file writes
  SPARK_DRIVER_MEM=64g GRAFT_VERIFY_COALESCE=0 \
    tools/run_main.sh graft.Verify "$SF" "$OUT" "$1" 2>&1 \
    | grep -E "\[verify\]|Exception" || true
}
clean() { # clean <namesCsv> — drop the chunk's dumps, keep the log lean
  IFS=, read -ra QQ <<< "$1"
  for q in "${QQ[@]}"; do rm -rf "$OUT/$q"; done
  rm -rf "$DUCKDB_TMP"
}

echo "== SMALL batch: dump =="
dump "$SMALL"
echo "== SMALL batch: exact line-hash, 1800 s/query =="
python3 tools/oracle_batch.py "$SF" "$OUT" 1800 "$SMALL"
clean "$SMALL"

for chunk in "${BIG_CHUNKS[@]}"; do
  echo "== BIG chunk: $chunk =="
  dump "$chunk"
  IFS=, read -ra QQ <<< "$chunk"
  for q in "${QQ[@]}"; do
    timeout 2400 python3 tools/sf10_big_oracle.py "$SF" "$OUT" "$q" \
      || echo "SKIP/FAIL $q (rc=$?)"
    rm -rf "$DUCKDB_TMP"
  done
  clean "$chunk"
done

echo "== q_topspeed_state (linear Python oracle) =="
dump q_topspeed_state
timeout 3600 python3 tools/py_oracles.py topspeed --data "$SF" --out "$OUT" \
  || echo "SKIP/FAIL q_topspeed_state (rc=$?)"
clean q_topspeed_state

echo "== q_vocab_encode (class-decomposed oracle) =="
dump q_vocab_encode
timeout 2400 python3 tools/sf10_vocab_oracle.py "$SF" "$OUT" \
  || echo "SKIP/FAIL q_vocab_encode (rc=$?)"
clean q_vocab_encode

echo "== q_bpe_merges / q_bpe_encode (retrained independent BPE) =="
dump q_bpe_merges,q_bpe_encode
timeout 3600 python3 tools/sf10_bpe_oracle.py "$SF" "$OUT" \
  || echo "SKIP/FAIL q_bpe (rc=$?)"
clean q_bpe_merges,q_bpe_encode

echo "== DONE =="
