#!/usr/bin/env bash
# launch_multihost.sh — multi-host training launch helper.
#
# On a TPU pod (one process per host, runtime metadata present):
#   SPCCT_AUTO_DISTRIBUTED=1 python train.py --mesh [...]
# on every host (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`).
#
# Bare-metal / CPU simulation (this script): spawns N local processes with
# an explicit coordinator, each seeing DEVICES_PER_PROC virtual CPU devices.
# Validates the same code path the pod launch uses
# (spcct_tpu/parallel/distributed.py; tests/test_distributed.py is the CI
# version of this).
#
# Usage: scripts/launch_multihost.sh [NPROC] [-- train.py args...]
set -euo pipefail
NPROC="${1:-2}"; shift || true
[ "${1:-}" = "--" ] && shift
DEVICES_PER_PROC="${DEVICES_PER_PROC:-4}"
PORT=$((20000 + RANDOM % 20000))
cd "$(dirname "$0")/.."

pids=()
for RANK in $(seq 0 $((NPROC - 1))); do
  SPCCT_COORDINATOR="127.0.0.1:${PORT}" \
  SPCCT_NUM_PROCESSES="${NPROC}" \
  SPCCT_PROCESS_ID="${RANK}" \
  JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=${DEVICES_PER_PROC}" \
  python train.py --mesh "$@" > "/tmp/spcct_multihost_rank${RANK}.log" 2>&1 &
  pids+=($!)
done

rc=0
for p in "${pids[@]}"; do wait "$p" || rc=$?; done
echo "=== rank 0 tail ==="
tail -5 /tmp/spcct_multihost_rank0.log
exit $rc
