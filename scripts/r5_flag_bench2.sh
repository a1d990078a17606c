#!/usr/bin/env bash
# r5_flag_bench2.sh — finish the round-5 SPCCT_XLA_OPTS sweep interrupted
# by the session restart (vmem96 died on a transient TPU_WORKER_HOSTNAMES
# tunnel error; sched_exp / the combo never ran). Adds the combo with the
# current best single flag (vmem32, 30.83 p/s).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p perf_logs

run_cfg() {
  local name=$1; shift
  echo "=== r5_flag $name ($(date -u +%H:%M:%S)) ==="
  env "$@" timeout 1200 python bench.py 2>"perf_logs/r5_flag_$name.err" \
    | tee "perf_logs/r5_flag_$name.json" \
    || echo "FAILED rc=$? (see perf_logs/r5_flag_$name.err)"
}

run_cfg vmem96    SPCCT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=98304
run_cfg sched_exp SPCCT_XLA_OPTS=xla_tpu_enable_all_experimental_scheduler_features=true
run_cfg vmem32_sched SPCCT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=32768,xla_tpu_enable_all_experimental_scheduler_features=true

echo "=== r5 flag matrix (part 2) done ==="
for f in perf_logs/r5_flag_*.json; do echo "$f: $(cat "$f" 2>/dev/null)"; done
