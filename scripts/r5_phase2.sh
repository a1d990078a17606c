#!/usr/bin/env bash
# r5_phase2.sh — round-5 perf arms, take 2 (VERDICT r5 task 1), run in a
# PAUSED-protocol chip slot (touch /tmp/spcct_pause first; rm after).
#
# The remat arms from r5_phase1.sh are excluded: full-forward remat did
# not finish compiling in 20 min through the tunnel's serialized compile
# service and the abandoned compile poisoned the next two arms' gate
# probes (BASELINE.md round-5 remat note). What remains are the
# cheap-compile arms: compiler-option sweeps (same HLO, new options) and
# two source-level byte cuts (fused IN+lrelu custom-VJP, virtual-concat
# thresholds) whose programs are ordinary-sized.
#   bash scripts/r5_phase2.sh
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p perf_logs

run_cfg() {  # run_cfg <name> [K=V ...]
  local name=$1; shift
  if [ -s "perf_logs/r5_$name.json" ] && \
     ! grep -q '"skipped"' "perf_logs/r5_$name.json"; then
    echo "=== r5 $name already measured, skipping ==="
    return
  fi
  echo "=== r5 $name ($(date -u +%H:%M:%S)) ==="
  env "$@" timeout 1200 python bench.py 2>"perf_logs/r5_$name.err" \
    | tee "perf_logs/r5_$name.json" \
    || echo "FAILED rc=$? (see perf_logs/r5_$name.err)"
}

run_cfg flag_sched_exp SPCCT_XLA_OPTS=xla_tpu_enable_all_experimental_scheduler_features=true
run_cfg flag_vmem32_sched SPCCT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=32768,xla_tpu_enable_all_experimental_scheduler_features=true
run_cfg fused_norm SPCCT_FUSED_NORM=1
run_cfg vcat32 SPCCT_VCAT_MAXC=32
run_cfg vcat64 SPCCT_VCAT_MAXC=64

echo "=== r5 phase2 bench matrix ==="
for f in perf_logs/r5_flag_*.json perf_logs/r5_fused_norm.json \
         perf_logs/r5_vcat*.json; do
  echo "$f: $(cat "$f" 2>/dev/null)"
done
