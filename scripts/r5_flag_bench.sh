#!/usr/bin/env bash
# r5_flag_bench.sh — XLA compiler-option sweep on the DEFAULT (XLA conv)
# headline path, attacking the ~69 ms HBM-bound elementwise tail named by
# BASELINE.md round-4 as the owner of the 30.7-vs-45 p/s gap (VERDICT r5
# task 1a). All options travel per-program via SPCCT_XLA_OPTS
# (utils/xla_opts.py) because server-side XLA_FLAGS are out of reach
# through the tunnel.
#
# Each config is one bench.py run (20 timed steps, dependent-scalar
# completion barrier). Unknown-flag configs fail their compile; the sweep
# tolerates that and records the failure line.
#   bash scripts/r5_flag_bench.sh
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p perf_logs

run_cfg() {  # run_cfg <name> [K=V ...]
  local name=$1; shift
  echo "=== r5_flag $name ($(date -u +%H:%M:%S)) ==="
  env "$@" timeout 1200 python bench.py 2>"perf_logs/r5_flag_$name.err" \
    | tee "perf_logs/r5_flag_$name.json" \
    || echo "FAILED rc=$? (see perf_logs/r5_flag_$name.err)"
}

# scoped-VMEM budget: default 16 MB of the 128 MB VMEM; more lets the
# fusion tiler keep bigger elementwise working sets on-chip
run_cfg vmem32  SPCCT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=32768
run_cfg vmem64  SPCCT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536
run_cfg vmem96  SPCCT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=98304

# scheduler features (latency hiding / experimental set)
run_cfg sched_exp SPCCT_XLA_OPTS=xla_tpu_enable_all_experimental_scheduler_features=true

# combo of the two levers
run_cfg vmem64_sched SPCCT_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536,xla_tpu_enable_all_experimental_scheduler_features=true

echo "=== r5 flag matrix done ==="
for f in perf_logs/r5_flag_*.json; do echo "$f: $(cat "$f" 2>/dev/null)"; done
