#!/usr/bin/env bash
# r5_phase1.sh — round-5 consolidated perf batch (VERDICT r5 task 1 + 6).
# Runs every remaining single-knob attack on the ~69 ms HBM-bound
# elementwise tail (BASELINE.md round-5 bytes memo: 35.8 p/s ceiling at
# current fusion, 70.5 p/s physical) as sequential bench.py runs, then the
# SP_UNet level-remat AOT memory A/B (compile-only).
#   bash scripts/r5_phase1.sh
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p perf_logs

run_cfg() {  # run_cfg <name> [K=V ...]
  local name=$1; shift
  if [ -s "perf_logs/r5_$name.json" ]; then
    echo "=== r5 $name already measured, skipping ==="
    return
  fi
  echo "=== r5 $name ($(date -u +%H:%M:%S)) ==="
  env "$@" timeout 1200 python bench.py 2>"perf_logs/r5_$name.err" \
    | tee "perf_logs/r5_$name.json" \
    || echo "FAILED rc=$? (see perf_logs/r5_$name.err)"
}

# -- rematerialization granularities (trade idle MXU FLOPs for residual
#    traffic; the step is bandwidth-bound so this can win) --
run_cfg remat_full  SPCCT_BENCH_REMAT=1
run_cfg remat_block SPCCT_BLOCK_REMAT=1
run_cfg remat_level SPCCT_LEVEL_REMAT_ALL=1

# -- virtual-concat thresholds (the level-1 concat + layout copies are
#    ~1.3 GiB of HLO traffic; r3 measured vcat-EVERYWHERE at -11%, these
#    isolate the biggest joins only) --
run_cfg vcat32 SPCCT_VCAT_MAXC=32
run_cfg vcat64 SPCCT_VCAT_MAXC=64

# -- pure-lax fused IN+lrelu (no custom call; reshapes the norm chain so
#    XLA sees one fusion region) --
run_cfg fused_norm SPCCT_FUSED_NORM=1

# -- remaining compiler-option configs from the interrupted r5 sweep --
run_cfg flag_sched_exp SPCCT_XLA_OPTS=xla_tpu_enable_all_experimental_scheduler_features=true
run_cfg flag_vmem32_sched SPCCT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=32768,xla_tpu_enable_all_experimental_scheduler_features=true

echo "=== r5 phase1 bench matrix done ==="
for f in perf_logs/r5_remat_*.json perf_logs/r5_vcat*.json perf_logs/r5_fused_norm.json perf_logs/r5_flag_*.json; do
  echo "$f: $(cat "$f" 2>/dev/null)"
done

# -- VERDICT task 6: SP_UNet level-remat headroom A/B (AOT, compile-only) --
echo "=== SP_UNet mem A/B ($(date -u +%H:%M:%S)) ==="
timeout 1200 python scripts/mem_probe.py SP_UNet \
  >perf_logs/r5_mem_spunet_default.log 2>&1 || echo "mem A failed"
SPCCT_LEVEL_REMAT=1 timeout 1200 python scripts/mem_probe.py SP_UNet \
  >perf_logs/r5_mem_spunet_levelremat.log 2>&1 || echo "mem B failed"
tail -3 perf_logs/r5_mem_spunet_default.log perf_logs/r5_mem_spunet_levelremat.log
echo "=== r5 phase1 complete ($(date -u +%H:%M:%S)) ==="
