#!/usr/bin/env bash
# run_protocol.sh — full-resolution (512^2) 3-seed synthetic protocol over all
# 10 variants (reference protocol: train.py main loop, SURVEY §3.1), run as
# one process per (variant, seed) so an interruption costs at most one run
# (auto-resume picks up last.ckpt on restart).
#
# Usage: scripts/run_protocol.sh [DEADLINE_EPOCH_SECONDS]
#   stops launching new runs once `date +%s` exceeds the deadline (default:
#   no deadline). Progress: $LOG_DIR/all_results.csv gains one row per run.
set -uo pipefail
cd "$(dirname "$0")/.."

DEADLINE="${1:-0}"
export CHECKPOINT_DIR="${CHECKPOINT_DIR:-$PWD/runs_protocol/checkpoints}"
export LOG_DIR="${LOG_DIR:-$PWD/runs_protocol/logs}"
# device->host checkpoint pulls run ~41 MB/s here; save 'last' every 5
# epochs (resume granularity only; 'best' still saved on every improvement)
export SPCCT_CKPT_EVERY="${SPCCT_CKPT_EVERY:-5}"
EPOCHS="${EPOCHS:-25}"
SEEDS=(42 123 999)
# priority order: flagship + control first, then ablations, then baselines
VARIANTS=(SPFF-UNet PlainCore_UNet E_SP_UNet FG_SP_UNet SP_UNet
          3DUNet R2UNet3D ResUNet++ UNETR SwinUNETR)

mkdir -p "$CHECKPOINT_DIR" "$LOG_DIR"
# seed-outer: every variant gets its seed-42 full-res row before any variant
# gets a second seed (robust to hitting the wall-clock deadline mid-protocol)
for s in "${SEEDS[@]}"; do
  for v in "${VARIANTS[@]}"; do
    if [ "$DEADLINE" != "0" ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
      echo "[protocol] deadline reached; stopping before $v/seed$s"
      exit 0
    fi
    # skip runs already recorded (idempotent re-launch)
    if [ -f "$LOG_DIR/all_results.csv" ] && \
       grep -q "^$v,$s," "$LOG_DIR/all_results.csv"; then
      echo "[protocol] $v/seed$s already done, skipping"
      continue
    fi
    echo "[protocol] === $v seed $s ($(date -u +%H:%M:%S)) ==="
    timeout 7200 python train.py --variant "$v" --seeds "$s" --epochs "$EPOCHS" \
      || echo "[protocol] $v/seed$s FAILED (rc=$?)"
  done
done
echo "[protocol] complete"
