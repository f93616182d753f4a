#!/usr/bin/env bash
# One-command sf1.0 re-certification gate: chains derive -> verify ->
# DuckDB oracle -> bench -> scaling report so the 10x certificate always
# tracks HEAD instead of the round it was last hand-run (VERDICT r12
# item 2). Run from anywhere; operates on the repo root. Wall time is
# dominated by the sf1.0 Verify sweep + two bench passes (~60-90 min on a
# quiet host) — run it in tmux at round close.
#
# Artifacts (all stamped with the HEAD SHA they certify):
#   CORRECTNESS_sf1.json   per-query oracle verdict summary
#   verify_hashes_sf1.json canonical content hash per query (from Verify)
#   BENCH_sf1.json         sf1.0 bench summary (sentinel-calibrated)
#   bench_samples_sf1.json sf1.0 per-pass raw samples
#   SCALING_sf1.json       per-query sf0.1->sf1.0 super-linearity triage
#
# Env:
#   SF1_DIR             derived dataset dir (default testdata_sf1.0)
#   SPARK_GRAFT_CPUS    cores for Verify (default 24; Bench uses its own)
#   GATE_REFRESH_SF01=1 also re-bench sf0.1 first so the scaling report's
#                       denominator is HEAD-fresh (adds ~25 min)
set -euo pipefail
cd "$(dirname "$0")/.."
SF1=${SF1_DIR:-testdata_sf1.0}
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

# --recert: make the certificate mechanically track HEAD (VERDICT r13 #1).
# Re-runs Verify at HEAD, hash-diffs against the certified set
# (verify_hashes_sf1.json), inherits the oracle verdict for every query
# whose Spark output is bit-identical, and re-oracles ONLY the changed
# ones. Cost: one sf1.0 Verify sweep (~15 min) + oracle time proportional
# to what actually changed — vs the full gate's 60-90 min.
if [ "${1:-}" = "--recert" ]; then
  if [ ! -d "$SF1" ]; then
    echo "== recert: $SF1 missing — deriving =="
    sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 $SF1 10"
  fi
  echo "== recert [1/3] Verify sweep at HEAD =="
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
    sbt -batch "runMain graft.Verify $SF1 verify_sf1_out"
  echo "== recert [2/3] hash-diff vs certified set =="
  CHANGED=$(python3 tools/recert.py diff verify_hashes_sf1.json \
    verify_sf1_out/verify_hashes.json)
  LOG_ARG=()
  if [ -n "$CHANGED" ]; then
    N=$(echo "$CHANGED" | tr ',' '\n' | wc -l)
    echo "== recert [3/3] oracle re-run for $N changed queries =="
    export GRAFT_DUCKDB_TMP=${GRAFT_DUCKDB_TMP:-/dev/shm/duckdb_tmp}
    mkdir -p "$GRAFT_DUCKDB_TMP"
    set +e
    python3 tools/oracle_check.py "$SF1" verify_sf1_out "$CHANGED" \
      | tee /tmp/oracle_recert.log
    set -e
    rm -rf "$GRAFT_DUCKDB_TMP"
    LOG_ARG=(/tmp/oracle_recert.log)
  else
    echo "== recert [3/3] zero hash changes — pure transfer =="
  fi
  # exits non-zero (aborting before the baseline update) if any failed
  python3 tools/recert.py write CORRECTNESS_sf1.json verify_hashes_sf1.json \
    verify_sf1_out/verify_hashes.json "$HEAD_SHA" "$SF1 (10x derived)" \
    "${LOG_ARG[@]}"
  cp verify_sf1_out/verify_hashes.json verify_hashes_sf1.json
  echo "recert green at $HEAD_SHA"
  exit 0
fi

echo "== [1/5] derive $SF1 from sf0.1 (reps=10) =="
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 $SF1 10"

echo "== [2/5] Verify sweep at sf1.0 =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  sbt -batch "runMain graft.Verify $SF1 verify_sf1_out"
cp verify_sf1_out/verify_hashes.json verify_hashes_sf1.json

echo "== [3/5] DuckDB oracle compare =="
# DuckDB temp on plain disk: the former >40 GB q239 spill that forced
# tmpfs routing is gone (the CF chain's `pairs` CTE is MATERIALIZED, so
# the Σdeg² self-join runs once — measured 57 s / <1 MB spill at sf1.0).
export GRAFT_DUCKDB_TMP=${GRAFT_DUCKDB_TMP:-$(pwd)/.duckdb_tmp}
mkdir -p "$GRAFT_DUCKDB_TMP"
set +e
python3 tools/oracle_check.py "$SF1" verify_sf1_out | tee /tmp/oracle_sf1.log
ORACLE_RC=${PIPESTATUS[0]}
set -e
python3 - "$SF1" "$HEAD_SHA" <<'EOF'
import sys, json, re
sf, head = sys.argv[1], sys.argv[2]
ok, fail = [], []
for line in open('/tmp/oracle_sf1.log'):
    m = re.match(r'(OK|FAIL)\s+(\S+?):', line)
    if m:
        (ok if m.group(1) == 'OK' else fail).append(m.group(2))
json.dump({"sf": f"{sf} (10x derived)", "head": head,
           "total": len(ok) + len(fail), "ok": len(ok),
           "fail": len(fail), "failed": sorted(fail),
           "generated_by": "tools/sf1_gate.sh"},
          open("CORRECTNESS_sf1.json", "w"), indent=1)
print(f"CORRECTNESS_sf1.json: {len(ok)}/{len(ok) + len(fail)} ok")
EOF
rm -rf "$GRAFT_DUCKDB_TMP"
if [ "$ORACLE_RC" -ne 0 ]; then echo "oracle FAILURES — gate red"; exit 1; fi

# Bench clobbers bench_samples.json / bench_last.json (the driver's sf0.1
# artifacts) — stash and restore around each bench run.
stash=$(mktemp -d)
cp bench_samples.json bench_last.json "$stash/" 2>/dev/null || true
restore() { cp "$stash"/bench_samples.json "$stash"/bench_last.json . 2>/dev/null || true; }
trap restore EXIT

if [ "${GATE_REFRESH_SF01:-0}" = "1" ]; then
  echo "== [4a/5] refresh sf0.1 bench audit =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"
  cp bench_samples.json bench_samples_sf01.json
fi

echo "== [4/5] Bench at sf1.0 =="
SPARK_GRAFT_SF_DIR=$SF1 sbt -batch "runMain graft.Bench"
cp bench_samples.json bench_samples_sf1.json
cp bench_last.json BENCH_sf1.json
restore

echo "== [5/5] scaling report sf0.1 -> sf1.0 =="
python3 tools/scaling_report.py bench_samples_sf01.json bench_samples_sf1.json \
  10 2 SCALING_sf1.json
echo "sf1.0 gate green at $HEAD_SHA"
