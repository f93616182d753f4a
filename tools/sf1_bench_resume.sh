#!/usr/bin/env bash
# Resume of sf1_gate.sh from step [4/5]: the verify+oracle phases are
# already green at HEAD (CORRECTNESS_sf1.json / verify_hashes_sf1.json);
# this reruns only the sf1.0 bench + scaling report, with the same
# stash/restore discipline around the driver's sf0.1 bench artifacts.
set -euo pipefail
cd "$(dirname "$0")/.."
SF1=${SF1_DIR:-testdata_sf1.0}

stash=$(mktemp -d)
cp bench_samples.json bench_last.json "$stash/" 2>/dev/null || true
restore() { cp "$stash"/bench_samples.json "$stash"/bench_last.json . 2>/dev/null || true; }
trap restore EXIT

echo "== [4/5] Bench at sf1.0 =="
SPARK_GRAFT_SF_DIR=$SF1 sbt -batch "runMain graft.Bench"
cp bench_samples.json bench_samples_sf1.json
cp bench_last.json BENCH_sf1.json
restore

echo "== [5/5] scaling report sf0.1 -> sf1.0 =="
python3 tools/scaling_report.py bench_samples_sf01.json bench_samples_sf1.json \
  10 2 SCALING_sf1.json
echo "sf1.0 bench resume green at $(git rev-parse HEAD)"
