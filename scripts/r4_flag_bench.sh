#!/usr/bin/env bash
# r4_flag_bench.sh — step-level bench matrix over XLA compiler options
# (SPCCT_XLA_OPTS, utils/xla_opts.py), attacking both ends of the round-4
# perf picture (BASELINE.md round-4):
#   * default path: can a bigger scoped-VMEM budget speed up XLA's own
#     conv/fusion tiling? (default scoped limit is 16 MB of the 128 MB VMEM)
#   * pallas/megakernel paths: is the step-level regression the compiler
#     shrinking scoped VMEM around custom calls
#     (xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments /
#      xla_tpu_msa_reduce_scoped_vmem_limit)?
#
# Run AFTER the protocol deadline so nothing else holds the chip; caches
# should be warm from the compile-only s1_probe passes (same program).
#   bash scripts/r4_flag_bench.sh
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p perf_logs

run_cfg() {  # run_cfg <name> [K=V ...]
  local name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  env "$@" timeout 900 python bench.py | tee "perf_logs/r4_flag_$name.json"
}

run_cfg vmem64_default  SPCCT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536
run_cfg vmem64_pallas   SPCCT_PALLAS_CONV=1 \
                        SPCCT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536
run_cfg ccadj_pallas    SPCCT_PALLAS_CONV=1 \
                        SPCCT_XLA_OPTS=xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments=false
run_cfg vmem64_mega     SPCCT_MEGAKERNEL=1 \
                        SPCCT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536
run_cfg sched_exp       SPCCT_XLA_OPTS=xla_tpu_enable_all_experimental_scheduler_features=true
echo "=== flag matrix done ==="
