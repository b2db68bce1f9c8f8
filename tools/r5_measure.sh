#!/bin/bash
# Round-5 measurement batch (VERDICT r4 next-#1): per-kernel device-time
# budget for all four bench workloads -> PROFILE_r05.json in the repo
# root, then the headline bench.  Run on the healthy chip FIRST and
# commit the JSON before optimizing anything.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r5_measure}
mkdir -p "$OUT"

for wl in headline blocky symmetric diagc; do
  echo "== profile $wl =="
  timeout 1800 python tools/profile_fused.py --workload "$wl" \
    --json PROFILE_r05.json 2>&1 | tee "$OUT/profile_$wl.log"
done

echo "== bench =="
timeout 3000 python bench.py 2>&1 | tee "$OUT/bench.log"
echo "ALL DONE -> $OUT"
