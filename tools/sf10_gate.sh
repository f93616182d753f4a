#!/usr/bin/env bash
# sf10 correctness gate over the heavy-tail subset (VERDICT r14 Next #4):
# the 100x decade was bench-only, and sf10 is exactly where the embedding
# derivation defect and the quadratic IVF assignment hid -- a wrong ANSWER
# would hide there next. Runs graft.Verify at sf10 for the 17-query
# BENCH_sf10 subset, then the DuckDB oracle over the same parquet, and
# writes CORRECTNESS_sf10_subset.json stamped with HEAD.
#
# Cost: one filtered sf10 Verify pass (the q107 family dominates) plus
# DuckDB oracle time; run in tmux. DuckDB temp goes to disk by default
# (GRAFT_DUCKDB_TMP to override; /dev/shm if root is tight).
#
# Env: SF10_DIR (default testdata_sf10), SPARK_GRAFT_CPUS (default 24),
#      SF10_SUBSET (comma list; default = the BENCH_sf10 17).
set -euo pipefail
cd "$(dirname "$0")/.."
SF10=${SF10_DIR:-testdata_sf10}
# Round-16 subset: the 12 queries that fresh-oracled at sf10 in r15, PLUS
# the five SLICE TWINS (q281-q285) standing in for the resource-bound
# full-population CF/ANN oracles (q107/q108/q191/q201/q225 spill >=60-70GB
# in DuckDB at sf10 -- the slices run the identical chains over
# userId % 16 == 0 / vec_id % 4 == 0, sized to the oracle's disk), PLUS
# the next tier of sf1.0-expensive queries (q59/q70/q104 extension).
SUBSET=${SF10_SUBSET:-q36_ngram_jaccard,q38_embedding_neardup,q40_dedup_simhash,q45_dedup_clusters,q59_incremental_neardup,q69_source_overlap,q70_quote_hits,q102_hll_cardinality,q104_sorted_neighborhood,q106_ppjoin,q110_edit_distance,q193_waiting_suppliers,q200_knn_label_consistency,q214_ktruss,q262_rerank_candidates,q281_item_cf_slice,q282_cf_predict_slice,q283_slope_one_slice,q284_hitrate_slice,q285_ann_tuning_slice,q286_cf_cap_quality_slice}
HEAD_SHA=$(git rev-parse HEAD)
if [ -n "$(git status --porcelain --untracked-files=no)" ]; then
  HEAD_SHA="$HEAD_SHA-dirty"
fi
# Round artifacts must be stamped at a clean commit (VERDICT r15 #7): a
# -dirty artifact claims a tree no commit reproduces. ALLOW_DIRTY=1 is the
# explicit local-iteration override.
if [[ "$HEAD_SHA" == *-dirty && "${ALLOW_DIRTY:-0}" != "1" ]]; then
  echo "refusing to run: working tree is dirty -- commit first (or ALLOW_DIRTY=1)"
  exit 1
fi
if [ ! -d "$SF10" ]; then
  echo "== sf10 gate: $SF10 missing -- deriving (reps=100) =="
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
    tools/run_main.sh graft.ScaleUp /root/testdata/sf0.1 "$SF10" 100
fi

echo "== [1/2] Verify subset at sf10 =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
  tools/run_main.sh graft.Verify "$SF10" verify_sf10_out "$SUBSET"

echo "== [2/2] DuckDB oracle compare (one connection per query) =="
# ONE oracle_check invocation PER QUERY: DuckDB's temp storage files grow
# monotonically within a connection (blocks are reused logically but the
# files are never shrunk), so at sf10 a single 17-query connection
# accumulated >70 GB of dead temp and ENOSPC'd queries that pass fine
# alone. A fresh connection per query frees temp between queries. The CF
# family (q107/q108/q191/q201) legitimately spills ~50 GB each: give the
# oracle a bigger memory cap than the 25 GB co-tenant default -- nothing
# else heavy should run during this gate.
export GRAFT_DUCKDB_TMP=${GRAFT_DUCKDB_TMP:-$(pwd)/.duckdb_tmp_sf10}
# SF10_LANES=N runs N oracle loops concurrently (round-robin split of the
# subset, one DuckDB connection + temp dir per query per lane). The subset
# has one multi-hour outlier (q45's 64-permutation minhash in SQL); with
# lanes=2 the other 20 queries drain in the second lane instead of
# queueing behind it. Memory: the per-connection cap must be sized so
# lanes x cap fits beside whatever else runs -- default drops to 35GB/lane
# when lanes > 1 (q45 observed ~35GB peak solo at 70GB cap).
LANES=${SF10_LANES:-1}
if [ "$LANES" -gt 1 ]; then
  export GRAFT_DUCKDB_MEM=${GRAFT_DUCKDB_MEM:-35GB}
else
  export GRAFT_DUCKDB_MEM=${GRAFT_DUCKDB_MEM:-70GB}
fi
ORACLE_RC=0
: > /tmp/oracle_sf10.log
run_lane() { # $1 = lane idx; queries read from /tmp/oracle_sf10.lane$1.list
  local rc_all=0 tmp="${GRAFT_DUCKDB_TMP}.lane$1"
  : > "/tmp/oracle_sf10.lane$1.log"
  while read -r q; do
    mkdir -p "$tmp"
    GRAFT_DUCKDB_TMP="$tmp" python3 tools/oracle_check.py "$SF10" verify_sf10_out "$q" \
      >> "/tmp/oracle_sf10.lane$1.log" 2>&1 || rc_all=1
    rm -rf "$tmp"
  done < "/tmp/oracle_sf10.lane$1.list"
  return $rc_all
}
# Lane split: the FIRST query of the subset gets lane 1 to itself (order
# the known outlier first), the rest round-robin over the other lanes —
# with LANES=1 everything stays sequential as before.
i=0
# Clear ALL stale lane logs first, not just lanes 1..LANES: a prior run
# with more lanes leaves /tmp/oracle_sf10.laneN.log files whose verdict
# lines would be concatenated into this run's merged log (caught live in
# round 18: a stale 4-lane session's lane4.log held 8 OK lines for
# in-subset queries and had to be removed by hand before assembly).
rm -f /tmp/oracle_sf10.lane*.log /tmp/oracle_sf10.lane*.list
for l in $(seq 1 "$LANES"); do : > "/tmp/oracle_sf10.lane$l.list"; done
for q in ${SUBSET//,/ }; do
  if [ "$LANES" -gt 1 ]; then
    if [ "$i" -eq 0 ]; then lane=1; else lane=$((($i - 1) % (LANES - 1) + 2)); fi
  else
    lane=1
  fi
  echo "$q" >> "/tmp/oracle_sf10.lane$lane.list"
  i=$((i + 1))
done
set +e
PIDS=()
for l in $(seq 1 "$LANES"); do run_lane "$l" & PIDS+=($!); done
for p in "${PIDS[@]}"; do wait "$p" || ORACLE_RC=1; done
set -e
cat /tmp/oracle_sf10.lane*.log | tee /tmp/oracle_sf10.log

# --- solo-lane OOM retry (VERDICT r17 #4) -----------------------------
# A lane-capped query can legitimately need more memory than the per-lane
# cap (q38's embedding near-dup OOM'd at the 35 GB 3-lane cap in r17 and
# passed on a 70 GB solo re-run that had to be stitched in by hand).
# Retry every FAILed query whose oracle error is an out-of-memory,
# sequentially and solo, at the full solo cap — so the certificate comes
# out of ONE gate invocation.
: > /tmp/oracle_sf10.retry.log
if [ "$ORACLE_RC" -ne 0 ]; then
  RETRIES=$(grep -E '^FAIL ' /tmp/oracle_sf10.log | grep -i 'out of memory' \
    | sed -E 's/^FAIL +([^:]+):.*/\1/' | sort -u || true)
  for q in $RETRIES; do
    echo "== solo OOM retry (${GRAFT_DUCKDB_SOLO_MEM:-70GB}): $q =="
    tmp="${GRAFT_DUCKDB_TMP}.solo"
    mkdir -p "$tmp"
    GRAFT_DUCKDB_TMP="$tmp" GRAFT_DUCKDB_MEM="${GRAFT_DUCKDB_SOLO_MEM:-70GB}" \
      python3 tools/oracle_check.py "$SF10" verify_sf10_out "$q" \
      >> /tmp/oracle_sf10.retry.log 2>&1 || true
    rm -rf "$tmp"
  done
  cat /tmp/oracle_sf10.retry.log
fi

# Certificate via the merging assembler: retry verdicts supersede lane
# verdicts last-writer-wins, supersessions are recorded in the cert, and
# the assembler's exit code is the gate (green only on exact subset
# coverage with zero fails — ADVICE r17).
set +e
python3 tools/assemble_sf10_cert.py CORRECTNESS_sf10_subset.json "$SF10" \
  "$HEAD_SHA" "$SUBSET" /tmp/oracle_sf10.log /tmp/oracle_sf10.retry.log
ORACLE_RC=$?
set -e
if [ "$ORACLE_RC" -ne 0 ]; then echo "oracle FAILURES -- sf10 gate red"; exit 1; fi
# The canonical content hashes travel WITH the certificate they back
# (VERDICT r16 #1/#8): a subset-filtered Verify writes
# verify_hashes.partial.json; promote it to the committed artifact.
cp verify_sf10_out/verify_hashes.partial.json verify_hashes_sf10_subset.json
echo "sf10 subset gate green at $HEAD_SHA"
