#!/bin/bash
# Follow-ups to r3_bisect_batch.sh: isolate the b_xla 30.7→27.4 regression
# (suspect: virtual-concat decoders, commit 52c627b) and cross-combos with
# whatever won the main batch.
set -u
OUT=${OUT:-/tmp/r3bisect}
mkdir -p "$OUT"
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
  timeout 1200 env "$@" > "$OUT/$name.log" 2>&1
  st=$?
  grep -E '"metric"|patches' "$OUT/$name.log" | tail -2 | tee -a "$OUT/summary.log"
  echo "exit=$st" | tee -a "$OUT/summary.log"
}

run b_xla_realconcat     SPCCT_REAL_CONCAT=1 python bench.py
run b_mega_realconcat    SPCCT_MEGAKERNEL=1 SPCCT_REAL_CONCAT=1 python bench.py
echo "EXTRAS DONE $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
