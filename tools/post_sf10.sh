#!/usr/bin/env bash
# Post-process the sf10 heavy-tail subset bench into round artifacts:
# land the subset bench output under its BENCH_sf10_subset.json name and
# build the sf1.0 -> sf10 scaling report (growth=10, slack=2 => a query
# is flagged super-linear when it grew >20x on 10x data).
# Provenance for SCALING_sf10.json / BENCH_sf10_subset.json (VERDICT r13 #2).
set -euo pipefail
cd "$(dirname "$0")/.."
cp bench_last_subset.json BENCH_sf10_subset.json
cp bench_samples_subset.json bench_samples_sf10.json
python3 tools/scaling_report.py bench_samples_sf1.json bench_samples_sf10.json 10 2 SCALING_sf10.json
