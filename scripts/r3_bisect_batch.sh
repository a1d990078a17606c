#!/bin/bash
# Round-3 Pallas step-regression bisection (VERDICT r2 task 1).
# Facts so far (BASELINE.md round-3 log): regression is not donation, not
# per-step dispatch, and the Pallas HLO carries LESS data movement than the
# XLA graph (scripts/hlo_diff.py) — so the +98 ms appears when optimizer +
# metrics join the grad graph, or is per-custom-call serialization. This
# batch bisects exactly that, one executable per process.
#
# Run inside a protocol pause window (`touch /tmp/spcct_pause`, wait for
# the current training run to finish).
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

# 0-1: post-concat-elim baselines (VERDICT task 8: record the step delta)
run b_xla               python bench.py
run b_pallas            SPCCT_PALLAS_CONV=1 python bench.py

# 2-5: which step component interacts with the custom calls?
run b_pallas_nometrics  SPCCT_PALLAS_CONV=1 SPCCT_NO_METRICS=1 python bench.py
run b_pallas_noopt      SPCCT_PALLAS_CONV=1 SPCCT_NO_OPT=1 python bench.py
run b_pallas_neither    SPCCT_PALLAS_CONV=1 SPCCT_NO_METRICS=1 SPCCT_NO_OPT=1 python bench.py
run b_xla_neither       SPCCT_NO_METRICS=1 SPCCT_NO_OPT=1 python bench.py

# 6-7: forward-only custom calls / shape restriction
run b_pallas_fwdonly    SPCCT_PALLAS_CONV=1 SPCCT_PALLAS_BWD=0 python bench.py
run b_pallas_cout32     SPCCT_PALLAS_CONV=1 SPCCT_PALLAS_MAXCOUT=32 python bench.py

# 8-9: grid-step granularity
run b_pallas_ht32       SPCCT_PALLAS_CONV=1 SPCCT_PALLAS_HT=32 python bench.py
run b_pallas_ht64       SPCCT_PALLAS_CONV=1 SPCCT_PALLAS_HT=64 python bench.py

# 10-12: megakernel (fused IN+lrelu+conv junctions, commit 393b4b9)
run b_mega              SPCCT_MEGAKERNEL=1 python bench.py
run b_mega_pallas       SPCCT_MEGAKERNEL=1 SPCCT_PALLAS_CONV=1 python bench.py
run b_mega_minw128      SPCCT_MEGAKERNEL=1 SPCCT_MEGA_MINW=128 SPCCT_MEGA_MAXCOUT=128 python bench.py

echo "ALL DONE $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
