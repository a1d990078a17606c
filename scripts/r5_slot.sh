#!/usr/bin/env bash
# r5_slot.sh — round-5 mid-round chip schedule (this session):
#   1. perf arms (r5_phase2.sh): cheap-compile XLA-option + source-level
#      byte-cut benches — VERDICT r5 task 1.
#   2. SP_UNet level-remat AOT headroom A/B (mem_probe) — VERDICT r5 task 6.
#   3. unpause + relaunch the master protocol (Phases C/D/B-extras) with
#      the session-end deadline passed in $1.
#   bash scripts/r5_slot.sh <protocol-deadline-epoch>
set -uo pipefail
cd "$(dirname "$0")/.."
DEADLINE="${1:?deadline epoch required}"

echo "=== r5 slot: perf arms ($(date -u +%H:%M:%S)) ==="
bash scripts/r5_phase2.sh

echo "=== r5 slot: SP_UNet level-remat AOT A/B ($(date -u +%H:%M:%S)) ==="
timeout 1200 python scripts/mem_probe.py SP_UNet \
  >perf_logs/r5_memprobe_spunet_off.log 2>&1 \
  || echo "mem_probe off-arm FAILED rc=$?"
SPCCT_LEVEL_REMAT=1 timeout 1200 python scripts/mem_probe.py SP_UNet \
  >perf_logs/r5_memprobe_spunet_on.log 2>&1 \
  || echo "mem_probe on-arm FAILED rc=$?"

echo "=== r5 slot: resuming protocol, deadline $DEADLINE ($(date -u +%H:%M:%S)) ==="
rm -f /tmp/spcct_pause
exec bash scripts/run_protocol_r5.sh "$DEADLINE"
