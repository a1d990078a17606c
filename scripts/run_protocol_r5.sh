#!/usr/bin/env bash
# run_protocol_r5.sh — round-5 master protocol runner (VERDICT r5 tasks
# 2/3/4), priority-ordered for a chip-time-limited window:
#
#   Phase B  v2 hard-phantom flagship protocol: SPFF vs PlainCore x 3
#            seeds, full resolution, 200-epoch early-stopped
#            (calibration greenlit — BASELINE.md round-5). -> runs_protocol_v2/
#   Phase C  Swin window 2^3 vs 7^3 matched budget (2.5-round-old
#            commitment; the 2^3 row already exists from Phase A r4).
#            -> runs_swin_window/
#   Phase D  the 16 missing v1 converged rows (seeds 123/999), ordered
#            fast-first so each hour buys the most mean±SD variants.
#            -> runs_protocol_r3/
#
#   bash scripts/run_protocol_r5.sh <deadline-epoch-seconds>
# Pause: touch /tmp/spcct_pause. Resumable: CSV skip logic + checkpoints.
set -uo pipefail
cd "$(dirname "$0")/.."

DEADLINE="${1:-0}"
EPOCHS="${EPOCHS:-200}"
export SPCCT_CKPT_EVERY="${SPCCT_CKPT_EVERY:-10}"

R3_CK="$PWD/runs_protocol_r3/checkpoints"; R3_LOG="$PWD/runs_protocol_r3/logs"
SW_CK="$PWD/runs_swin_window/checkpoints"; SW_LOG="$PWD/runs_swin_window/logs"
mkdir -p "$R3_CK" "$R3_LOG" "$SW_CK" "$SW_LOG"

past_deadline() {
  [ "$DEADLINE" != "0" ] && [ "$(date +%s)" -gt "$DEADLINE" ]
}

run_one() {  # run_one <variant> <seed> <ckdir> <logdir> [extra env as K=V ...]
  local v=$1 s=$2 ck=$3 log=$4 t; shift 4
  while [ -f /tmp/spcct_pause ]; do sleep 30; done
  if past_deadline; then
    echo "[protocol-r5] deadline reached; stopping before $v/seed$s"
    exit 0
  fi
  if [ -f "$log/all_results.csv" ] && grep -q "^$v,$s," "$log/all_results.csv"; then
    echo "[protocol-r5] $v/seed$s already done in $log, skipping"
    return
  fi
  echo "[protocol-r5] === $v seed $s -> $log ($(date -u +%H:%M:%S)) ==="
  t=10800
  if [ "$DEADLINE" != "0" ]; then
    t=$(( DEADLINE - $(date +%s) + 600 ))
    [ "$t" -gt 10800 ] && t=10800
    [ "$t" -lt 60 ] && t=60  # floor: `timeout 0` would DISABLE the bound
  fi
  env CHECKPOINT_DIR="$ck" LOG_DIR="$log" "$@" \
    timeout "$t" python train.py --variant "$v" --seeds "$s" --epochs "$EPOCHS" \
    || echo "[protocol-r5] $v/seed$s FAILED (rc=$?)"
}

echo "[protocol-r5] phase B: v2 hard-phantom flagship protocol"
bash scripts/run_protocol_v2.sh "$DEADLINE"
past_deadline && exit 0

echo "[protocol-r5] phase C: Swin window 7^3 (2^3 row = r4 Phase A default)"
run_one SwinUNETR 42 "$SW_CK" "$SW_LOG" SPCCT_SWIN_WINDOW=7

echo "[protocol-r5] phase D: remaining v1 seeds, fast-first"
# order by measured two-seed cost (seed-42 epoch times x early-stop epochs,
# BASELINE.md round-3 table): E_SP ~30m, FG_SP ~35m, 3DUNet ~45m,
# SP_UNet ~50m, SwinUNETR ~70m, UNETR ~75m, ResUNet++ ~85m, R2U ~90m —
# each completed PAIR upgrades a variant to the reference's mean+-SD unit.
for v in E_SP_UNet FG_SP_UNet 3DUNet; do
  for s in 123 999; do
    run_one "$v" "$s" "$R3_CK" "$R3_LOG"
  done
done
for s in 123 999; do
  run_one SP_UNet "$s" "$R3_CK" "$R3_LOG" SPCCT_LEVEL_REMAT=1
done
for v in SwinUNETR UNETR "ResUNet++" R2UNet3D; do
  for s in 123 999; do
    run_one "$v" "$s" "$R3_CK" "$R3_LOG"
  done
done

echo "[protocol-r5] phase B-extras: v2 ablation trio (chip time permitting)"
export SPCCT_PHANTOM=v2
for s in 42 123 999; do
  for v in SP_UNet E_SP_UNet FG_SP_UNet; do
    run_one "$v" "$s" "$PWD/runs_protocol_v2/checkpoints" "$PWD/runs_protocol_v2/logs"
  done
done
echo "[protocol-r5] complete"
