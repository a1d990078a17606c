#!/usr/bin/env bash
# run_protocol_r3.sh — round-3 CONVERGED full-resolution protocol:
# 10 variants x 3 seeds, 200-epoch budget with early stopping (patience 12)
# — the reference configuration (train.py:1451-1458, config.py:25,33),
# replacing round-2's 20-epoch equal-budget table.
#
# Results land in runs_protocol_r3/ (round-2's 20-epoch artifacts in
# runs_protocol/ are kept as-is for comparison).
#
# Pause mechanism: `touch /tmp/spcct_pause` makes the loop wait before
# launching the next run — used to grab exclusive chip windows for perf
# measurements mid-protocol. `rm /tmp/spcct_pause` resumes.
set -uo pipefail
cd "$(dirname "$0")/.."

DEADLINE="${1:-0}"
export CHECKPOINT_DIR="${CHECKPOINT_DIR:-$PWD/runs_protocol_r3/checkpoints}"
export LOG_DIR="${LOG_DIR:-$PWD/runs_protocol_r3/logs}"
# device->host checkpoint pulls run ~41 MB/s here; coarsen 'last' saves
# (resume granularity only; 'best' still saved on every improvement)
export SPCCT_CKPT_EVERY="${SPCCT_CKPT_EVERY:-10}"
EPOCHS="${EPOCHS:-200}"
SEEDS=(42 123 999)

mkdir -p "$CHECKPOINT_DIR" "$LOG_DIR"

run_one() {
  v=$1; s=$2
  while [ -f /tmp/spcct_pause ]; do sleep 30; done
  if [ "$DEADLINE" != "0" ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[protocol] deadline reached; stopping before $v/seed$s"
    exit 0
  fi
  if [ -f "$LOG_DIR/all_results.csv" ] && \
     grep -q "^$v,$s," "$LOG_DIR/all_results.csv"; then
    echo "[protocol] $v/seed$s already done, skipping"
    return
  fi
  echo "[protocol] === $v seed $s ($(date -u +%H:%M:%S)) ==="
  timeout 10800 python train.py --variant "$v" --seeds "$s" --epochs "$EPOCHS" \
    || echo "[protocol] $v/seed$s FAILED (rc=$?)"
}

# Phase 1: flagship vs its ablation control, all seeds — settles the
# round-2 equal-budget inversion (VERDICT r2 weak #3) first.
for v in SPFF-UNet PlainCore_UNet; do
  for s in "${SEEDS[@]}"; do run_one "$v" "$s"; done
done

# Phase 2: remaining ablations + baselines, seed-outer so every variant
# gets a seed-42 row before any gets a second seed.
for s in "${SEEDS[@]}"; do
  for v in E_SP_UNet FG_SP_UNet R2UNet3D "ResUNet++" UNETR \
           SP_UNet 3DUNet SwinUNETR; do
    run_one "$v" "$s"
  done
done
echo "[protocol] complete"
