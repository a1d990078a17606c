#!/usr/bin/env bash
# run_protocol_v2.sh — SPFF-UNet vs PlainCore_UNet on the HARD phantom
# (SPCCT_PHANTOM=v2, data/phantom_v2.py), 3 seeds, converged reference
# budget (200-epoch early-stopped full resolution).
#
# VERDICT r3 task 4: the v1 phantom saturates (0.9997+ val dice for every
# variant), so the flagship-vs-control comparison had no statistical
# teeth. v2's per-slice jitter + partial-volume + correlated noise keep
# validation off the ceiling; this protocol is the first SPFF-vs-PlainCore
# table where the result can mean something. Results land in
# runs_protocol_v2/ — NEVER mix with runs_protocol_r3/ (different data).
set -uo pipefail
cd "$(dirname "$0")/.."

DEADLINE="${1:-0}"
export SPCCT_PHANTOM=v2
export CHECKPOINT_DIR="${CHECKPOINT_DIR:-$PWD/runs_protocol_v2/checkpoints}"
export LOG_DIR="${LOG_DIR:-$PWD/runs_protocol_v2/logs}"
export SPCCT_CKPT_EVERY="${SPCCT_CKPT_EVERY:-10}"
EPOCHS="${EPOCHS:-200}"

mkdir -p "$CHECKPOINT_DIR" "$LOG_DIR"

run_one() {
  local v=$1 s=$2 t
  while [ -f /tmp/spcct_pause ]; do sleep 30; done
  if [ "$DEADLINE" != "0" ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[protocol-v2] deadline reached; stopping before $v/seed$s"
    exit 0
  fi
  if [ -f "$LOG_DIR/all_results.csv" ] && \
     grep -q "^$v,$s," "$LOG_DIR/all_results.csv"; then
    echo "[protocol-v2] $v/seed$s already done, skipping"
    return
  fi
  echo "[protocol-v2] === $v seed $s ($(date -u +%H:%M:%S)) ==="
  # Bound the in-flight run by the deadline (+grace) as well — runs
  # checkpoint every SPCCT_CKPT_EVERY epochs and auto-resume, so a timeout
  # kill loses little, while an unbounded run holds the chip past the slot.
  t=10800
  if [ "$DEADLINE" != "0" ]; then
    t=$(( DEADLINE - $(date +%s) + 600 ))
    [ "$t" -gt 10800 ] && t=10800
    [ "$t" -lt 60 ] && t=60  # floor: `timeout 0` would DISABLE the bound
  fi
  timeout "$t" python train.py --variant "$v" --seeds "$s" --epochs "$EPOCHS" \
    || echo "[protocol-v2] $v/seed$s FAILED (rc=$?)"
}

# seed-outer so both variants get each seed before any gets the next one
for s in 42 123 999; do
  for v in SPFF-UNet PlainCore_UNet; do
    run_one "$v" "$s"
  done
done
echo "[protocol-v2] complete"
