#!/bin/bash
# Round-4 measurement batch: run the moment the TPU is healthy.
# Usage: bash tools/r4_measure.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4_measure}
mkdir -p "$OUT"

echo "== bench ==" | tee "$OUT/bench.log"
timeout 3000 python bench.py 2>&1 | tee -a "$OUT/bench.log"

for wl in headline blocky symmetric diagc; do
  echo "== profile $wl ==" | tee "$OUT/profile_$wl.log"
  timeout 1800 python tools/profile_fused.py --workload "$wl" \
    --json PROFILE_r04.json 2>&1 | tee -a "$OUT/profile_$wl.log"
done

# sb_pages sweep on the two run-heavy workloads
for sbp in 1 2 4; do
  for wl in blocky headline; do
    echo "== sbp=$sbp $wl ==" | tee "$OUT/sbp${sbp}_$wl.log"
    SPX_SB_PAGES=$sbp timeout 1800 python tools/profile_fused.py \
      --workload "$wl" --json "$OUT/SBP${sbp}.json" \
      2>&1 | tee -a "$OUT/sbp${sbp}_$wl.log"
  done
done
echo "ALL DONE -> $OUT"
