#!/bin/bash
# sf100 pair-class closure, phase 2 (r12): hash-check the LINEAR members
# of the pair-excluded family at sf100 — the queries whose Spark plans
# never materialize a member-level pair frame (incremental gates, chunk
# dedup, dup-span coverage, rarity-filtered ngram pairs, semantic dedup,
# co-occurrence triangles). The genuinely pair-materializing remainder
# (editdist, simhash pairs, audio neardup, agreement, CC family) is
# handled separately (CC via tools/sf100_cc_oracle.py; archetypes
# already hash-checked in SF100_PAIR_ORACLE.log).
#
# CC-family re-run recipe (budget 2h+ for the Spark side — the 1.25B-edge
# contraction dominates; run it FIRST in a session, nothing else on disk):
#   SPARK_DRIVER_MEM=64g GRAFT_VERIFY_COALESCE=0 \
#     tools/run_main.sh graft.Verify /root/repo/testdata_sf100 \
#     /root/repo/.tmp/sf100cc \
#     q_dedup_clusters,q_cluster_sizes,q_dedup_keep,q_canonical_keep,q_split_leakage
#   DUCKDB_TMP=/root/repo/.tmp/duckcc DUCKDB_MEM=24GB \
#     python3 tools/sf100_cc_oracle.py /root/repo/testdata_sf100 /root/repo/.tmp/sf100cc
#
# Oracle routes:
#   exact line-hash  -> tools/oracle_batch.py   (outputs that fit fetchall)
#   count+sum+xor    -> tools/sf10_big_oracle.py (>=4M-row outputs)
#   q_semantic_dedup -> tools/sf100_semdedup_oracle.py (committed pair
#                       join is ~1e10 cosines at sf100; class-decomposed,
#                       VALIDATED at sf0.01+sf0.1 first)
#   q_triangles      -> tools/sf10_triangles_oracle.py (committed skipgram
#                       stream spills >60 GB; multiplicity-weighted)
set -uo pipefail
cd /root/repo
SF=/root/repo/testdata_sf100
OUT=/root/repo/.tmp/sf100p2
export DUCKDB_TMP=/root/repo/.tmp/duck100c
export DUCKDB_MEM=${DUCKDB_MEM:-40GB}
mkdir -p "$OUT"

EXACT=q_incremental_neardup,q_image_incremental,q_audio_incremental,q_video_incremental,q_ngram_jaccard,q_ngram_containment,q_knn_graph
BIG=q_chunk_dedup,q_dup_span

dump() {
  SPARK_DRIVER_MEM=64g GRAFT_VERIFY_COALESCE=0 \
    tools/run_main.sh graft.Verify "$SF" "$OUT" "$1" 2>&1 \
    | grep -E "\[verify\]|Exception" || true
}
clean() {
  IFS=, read -ra QQ <<< "$1"
  for q in "${QQ[@]}"; do rm -rf "$OUT/$q"; done
  rm -rf "$DUCKDB_TMP"
}

echo "== linear pair family: dump =="
dump "$EXACT,$BIG,q_semantic_dedup,q_triangles"

echo "== exact line-hash batch (2400 s/query) =="
python3 tools/oracle_batch.py "$SF" "$OUT" 2400 "$EXACT"

echo "== big outputs (count+sum+xor) =="
IFS=, read -ra BIGQ <<< "$BIG"
for q in "${BIGQ[@]}"; do
  timeout 2400 python3 tools/sf10_big_oracle.py "$SF" "$OUT" "$q" \
    || echo "SKIP/FAIL $q (rc=$?)"
  rm -rf "$DUCKDB_TMP"
done

echo "== q_semantic_dedup (class-decomposed) =="
timeout 2400 python3 tools/sf100_semdedup_oracle.py "$SF" "$OUT" \
  || echo "SKIP/FAIL q_semantic_dedup (rc=$?)"

echo "== q_triangles (multiplicity-weighted) =="
timeout 2400 python3 tools/sf10_triangles_oracle.py "$SF" "$OUT" \
  || echo "SKIP/FAIL q_triangles (rc=$?)"

clean "$EXACT,$BIG,q_semantic_dedup,q_triangles"
echo "== PHASE 2 DONE =="
