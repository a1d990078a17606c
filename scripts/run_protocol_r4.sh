#!/usr/bin/env bash
# run_protocol_r4.sh — round-4 master protocol runner, priority-ordered for
# a chip-time-limited window (the tunnel died for most of round 3; assume
# it can die again — every phase is individually resumable via CSV skip
# logic, and a deadline bounds the whole thing).
#
#   Phase A  first-ever executed full-resolution runs (VERDICT r3 missing
#            #2): SP_UNet, 3DUNet, SwinUNETR seed 42 — then the other two
#            missing seed-42 rows (ResUNet++, UNETR). → runs_protocol_r3/
#   Phase B  hard-phantom protocol (VERDICT r3 task 4): SPFF vs PlainCore
#            x 3 seeds on SPCCT_PHANTOM=v2. → runs_protocol_v2/
#   Phase C  Swin window 2^3 vs 7^3 matched-budget comparison (VERDICT r3
#            task 6). → runs_swin_window/
#   Phase D  remaining r3 seeds (123/999 for the eight non-flagship
#            variants). → runs_protocol_r3/
#
#   bash scripts/run_protocol_r4.sh <deadline-epoch-seconds>
#
# Pause: `touch /tmp/spcct_pause` (same contract as the r3 runner).
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
  local v=$1 s=$2 ck=$3 log=$4; shift 4
  while [ -f /tmp/spcct_pause ]; do sleep 30; done
  if past_deadline; then
    echo "[protocol-r4] deadline reached; stopping before $v/seed$s"
    exit 0
  fi
  if [ -f "$log/all_results.csv" ] && grep -q "^$v,$s," "$log/all_results.csv"; then
    echo "[protocol-r4] $v/seed$s already done in $log, skipping"
    return
  fi
  echo "[protocol-r4] === $v seed $s -> $log ($(date -u +%H:%M:%S)) ==="
  # Bound the in-flight run by the deadline too (plus a short grace for the
  # test pass): runs checkpoint every SPCCT_CKPT_EVERY epochs and auto-resume,
  # so a timeout kill loses at most a few epochs — while an unbounded run
  # would still hold the chip when the driver's round-end bench needs it.
  local t=10800
  if [ "$DEADLINE" != "0" ]; then
    t=$(( DEADLINE - $(date +%s) + 600 ))
    [ "$t" -gt 10800 ] && t=10800
    [ "$t" -lt 60 ] && t=60  # floor: `timeout 0` would DISABLE the bound
  fi
  env CHECKPOINT_DIR="$ck" LOG_DIR="$log" "$@" \
    timeout "$t" python train.py --variant "$v" --seeds "$s" --epochs "$EPOCHS" \
    || echo "[protocol-r4] $v/seed$s FAILED (rc=$?)"
}

echo "[protocol-r4] phase A: first executed full-res rows + missing seed-42"
# SP_UNet's AOT fit is marginal (15.55 of ~15.7 GiB usable; VERDICT r3
# weak #5) — run it under decoder-level remat, which is parity-locked
# (tests/test_models.py::test_level_remat_decoder_is_math_identical: logits exact, grads
# per-leaf) and trades recompute for the boundary saves. A guaranteed row
# beats a possibly-OOM'd 3 h slot.
run_one SP_UNet 42 "$R3_CK" "$R3_LOG" SPCCT_LEVEL_REMAT=1
for v in 3DUNet SwinUNETR "ResUNet++" UNETR; do
  run_one "$v" 42 "$R3_CK" "$R3_LOG"
done

echo "[protocol-r4] phase B: hard-phantom (v2) flagship protocol"
bash scripts/run_protocol_v2.sh "$DEADLINE"
past_deadline && exit 0

echo "[protocol-r4] phase C: Swin window 2^3 vs 7^3 (matched budget)"
# 2^3 row: reuse the phase-A SwinUNETR/seed42 row (default window).
run_one SwinUNETR 42 "$SW_CK" "$SW_LOG" SPCCT_SWIN_WINDOW=7

echo "[protocol-r4] phase D: remaining r3 seeds"
for s in 123 999; do
  for v in E_SP_UNet FG_SP_UNet R2UNet3D "ResUNet++" UNETR \
           3DUNet SwinUNETR; do
    run_one "$v" "$s" "$R3_CK" "$R3_LOG"
  done
  run_one SP_UNet "$s" "$R3_CK" "$R3_LOG" SPCCT_LEVEL_REMAT=1
done
echo "[protocol-r4] complete"
