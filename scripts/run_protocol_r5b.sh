#!/usr/bin/env bash
# run_protocol_r5b.sh — round-5 tail runner, relaunched after the first
# r5 slot's 07:30 deadline. Differences vs run_protocol_r5.sh:
#
#   * the SwinUNETR recipe default is now window 7^3 (BASELINE.md round-5
#     Phase C), so the v1-protocol SwinUNETR rows pin SPCCT_SWIN_WINDOW=2
#     explicitly — they must stay consistent with the existing 2^3
#     seed-42 row in runs_protocol_r3/.
#   * Phase B-extras: once Phase D is complete, the remaining SPFF-family
#     variants run on the hard phantom (v2) so the flagship table gains
#     its ablation arms (E_SP / FG_SP / SP).
#
#   bash scripts/run_protocol_r5b.sh <deadline-epoch-seconds>
# Pause: touch /tmp/spcct_pause. Resumable: CSV skip logic + checkpoints.
set -uo pipefail
cd "$(dirname "$0")/.."

DEADLINE="${1:?deadline epoch required}"
EPOCHS="${EPOCHS:-200}"
export SPCCT_CKPT_EVERY="${SPCCT_CKPT_EVERY:-10}"

R3_CK="$PWD/runs_protocol_r3/checkpoints"; R3_LOG="$PWD/runs_protocol_r3/logs"
V2_CK="$PWD/runs_protocol_v2/checkpoints"; V2_LOG="$PWD/runs_protocol_v2/logs"
mkdir -p "$R3_CK" "$R3_LOG" "$V2_CK" "$V2_LOG"

past_deadline() {
  [ "$(date +%s)" -gt "$DEADLINE" ]
}

run_one() {  # run_one <variant> <seed> <ckdir> <logdir> [extra env as K=V ...]
  local v=$1 s=$2 ck=$3 log=$4 t; shift 4
  while [ -f /tmp/spcct_pause ]; do sleep 30; done
  if past_deadline; then
    echo "[protocol-r5b] deadline reached; stopping before $v/seed$s"
    exit 0
  fi
  if [ -f "$log/all_results.csv" ] && grep -q "^$v,$s," "$log/all_results.csv"; then
    echo "[protocol-r5b] $v/seed$s already done in $log, skipping"
    return
  fi
  echo "[protocol-r5b] === $v seed $s -> $log ($(date -u +%H:%M:%S)) ==="
  t=$(( DEADLINE - $(date +%s) + 600 ))
  [ "$t" -gt 10800 ] && t=10800
  [ "$t" -lt 60 ] && t=60  # floor: `timeout 0` would DISABLE the bound
  env CHECKPOINT_DIR="$ck" LOG_DIR="$log" "$@" \
    timeout "$t" python train.py --variant "$v" --seeds "$s" --epochs "$EPOCHS" \
    || echo "[protocol-r5b] $v/seed$s FAILED (rc=$?)"
}

echo "[protocol-r5b] phase D (cont.): remaining v1 seeds, fast-first"
for v in E_SP_UNet FG_SP_UNet 3DUNet; do
  for s in 123 999; do
    run_one "$v" "$s" "$R3_CK" "$R3_LOG"
  done
done
for s in 123 999; do
  run_one SP_UNet "$s" "$R3_CK" "$R3_LOG" SPCCT_LEVEL_REMAT=1
done
for s in 123 999; do
  # pin 2^3: consistency with the r4 seed-42 row (default is now 7^3)
  run_one SwinUNETR "$s" "$R3_CK" "$R3_LOG" SPCCT_SWIN_WINDOW=2
done
for v in UNETR "ResUNet++" R2UNet3D; do
  for s in 123 999; do
    run_one "$v" "$s" "$R3_CK" "$R3_LOG"
  done
done

echo "[protocol-r5b] phase B-extras: SPFF ablation arms on the hard phantom"
for v in SP_UNet E_SP_UNet FG_SP_UNet; do
  for s in 42 123 999; do
    if [ "$v" = SP_UNet ]; then
      run_one "$v" "$s" "$V2_CK" "$V2_LOG" SPCCT_PHANTOM=v2 SPCCT_LEVEL_REMAT=1
    else
      run_one "$v" "$s" "$V2_CK" "$V2_LOG" SPCCT_PHANTOM=v2
    fi
  done
done

echo "[protocol-r5b] all scheduled rows done ($(date -u +%H:%M:%S))"
