#!/bin/bash
# v2_cpu_check.sh — CPU-scale sanity of the hard phantom (VERDICT r3 task
# 4 acceptance): at small-scale CPU budget (64² default; SPCCT_SYNTH_HW overrides), (a) validation must NOT
# saturate at ~0.9998 like v1 did, (b) record the SPFF-vs-PlainCore gap
# in the regime that discriminated on v1 (BASELINE.md round-3: +7.5 pt).
set -uo pipefail
cd "$(dirname "$0")/.."
export SPCCT_PHANTOM=v2 SPCCT_SYNTH_HW=${SPCCT_SYNTH_HW:-64} SPCCT_SYNTH_SLICES=${SPCCT_SYNTH_SLICES:-6}
export JAX_PLATFORMS=cpu
export CHECKPOINT_DIR="$PWD/runs_v2_cpu/checkpoints"
export LOG_DIR="$PWD/runs_v2_cpu/logs"
mkdir -p "$CHECKPOINT_DIR" "$LOG_DIR"
for v in SPFF-UNet PlainCore_UNet; do
  if [ -f "$LOG_DIR/all_results.csv" ] && grep -q "^$v,42," "$LOG_DIR/all_results.csv"; then
    echo "[v2-cpu] $v done, skipping"; continue
  fi
  echo "[v2-cpu] === $v ($(date -u +%H:%M:%S)) ==="
  timeout 14400 python train.py --variant "$v" --seeds 42 --epochs 25 \
    || echo "[v2-cpu] $v FAILED rc=$?"
done

# v1 control at the identical budget — the saturation CONTRAST is the
# acceptance evidence, not the absolute v2 number
export SPCCT_PHANTOM=v1
export CHECKPOINT_DIR="$PWD/runs_v2_cpu/checkpoints_v1ctrl"
export LOG_DIR="$PWD/runs_v2_cpu/logs_v1ctrl"
mkdir -p "$CHECKPOINT_DIR" "$LOG_DIR"
if ! { [ -f "$LOG_DIR/all_results.csv" ] && grep -q "^PlainCore_UNet,42," "$LOG_DIR/all_results.csv"; }; then
  echo "[v2-cpu] === PlainCore_UNet v1 control ($(date -u +%H:%M:%S)) ==="
  timeout 14400 python train.py --variant PlainCore_UNet --seeds 42 --epochs 25 \
    || echo "[v2-cpu] v1 control FAILED rc=$?"
fi
echo "[v2-cpu] complete"
