#!/bin/bash
# Round-3 perf experiment batch (VERDICT task 1a + task 5).
# Each measurement runs in its own process (one executable per process —
# the jax persistent cache keys whole executables). Logs to $OUT.
set -u
OUT=${OUT:-/tmp/r3perf}
mkdir -p "$OUT"
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
  timeout 900 env "$@" > "$OUT/$name.log" 2>&1
  st=$?
  tail -2 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "exit=$st" | tee -a "$OUT/summary.log"
}

# 1-4: bench.py donation x pallas matrix (20 dispatched steps)
run bench_xla_donate        python bench.py
run bench_xla_nodonate      SPCCT_NO_DONATE=1 python bench.py
run bench_pallas_donate     SPCCT_PALLAS_CONV=1 python bench.py
run bench_pallas_nodonate   SPCCT_PALLAS_CONV=1 SPCCT_NO_DONATE=1 python bench.py

# 5-6: unrolled 10-step single-executable full step (dispatch-overhead test)
run phase_full_xla          python scripts/phase_bench.py --phase full --steps 10
run phase_full_pallas       SPCCT_PALLAS_CONV=1 python scripts/phase_bench.py --phase full --steps 10

# 7-8: scan-epoch on/off, real fit() loop, full-res device data
run scanep_off              python scripts/scan_epoch_bench.py
run scanep_on               SPCCT_SCAN_EPOCH=1 python scripts/scan_epoch_bench.py

echo "ALL DONE $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
