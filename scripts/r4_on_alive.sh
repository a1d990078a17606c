#!/bin/bash
# r4_on_alive.sh — poll the tunneled TPU; the moment it answers, run the
# round-4 measurement sequence (VERDICT r3 task 2) serially and exit:
#   1. percall_probe --mode pallas / --mode xla  → settles the ~3.7 ms
#      per-custom-call-tax hypothesis from the round-3 bisect
#   2. bench.py at default / SPCCT_PALLAS_CONV=1 / SPCCT_MEGAKERNEL=1
#      → step-level numbers for the default decision
# Logs land in perf_logs/r4_*.log. Protocol launch is a separate, manual
# step after reviewing these (compile service serializes; never overlap).
set -u
cd "$(dirname "$0")/.."
mkdir -p perf_logs

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
from spcct_tpu.utils.jax_cache import enable
enable()
import jax, jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0
EOF
}

while ! probe; do
  echo "[r4_on_alive] dead at $(date -u +%H:%M:%S)"
  sleep 240
done
echo "[r4_on_alive] TPU alive at $(date -u +%H:%M:%S); starting sequence"

run() {  # run <logname> <cmd...>
  log="perf_logs/$1"; shift
  echo "[r4_on_alive] $* -> $log ($(date -u +%H:%M:%S))"
  timeout 2700 "$@" > "$log" 2>&1
  echo "[r4_on_alive] rc=$? for $log"
}

run r4_percall_pallas.log python scripts/percall_probe.py --mode pallas
run r4_percall_xla.log    python scripts/percall_probe.py --mode xla
run r4_bench_default.log  python bench.py
run r4_bench_pallas.log   env SPCCT_PALLAS_CONV=1 python bench.py
run r4_bench_megakernel.log env SPCCT_MEGAKERNEL=1 python bench.py
# one-dispatch scan chunks: discriminate per-dispatch vs in-executable
# custom-call cost (if the r3 tax is per dispatch, pallas+scan wins)
run r4_bench_scan_xla.log    env SPCCT_BENCH_SCAN=1 python bench.py
run r4_bench_scan_pallas.log env SPCCT_BENCH_SCAN=1 SPCCT_PALLAS_CONV=1 python bench.py
run r4_bench_scan_mega.log   env SPCCT_BENCH_SCAN=1 SPCCT_MEGAKERNEL=1 python bench.py
run r4_mem_spunet.log     python scripts/mem_probe.py SP_UNet
echo "[r4_on_alive] measurement sequence complete at $(date -u +%H:%M:%S)"

# chain straight into the priority-ordered protocol so no chip time is
# wasted between operator check-ins; individually resumable, deadline 9 h
DEADLINE=$(( $(date +%s) + 9 * 3600 ))
echo "[r4_on_alive] launching run_protocol_r4.sh (deadline $DEADLINE)"
nohup bash scripts/run_protocol_r4.sh "$DEADLINE" \
  > /tmp/protocol_r4.log 2>&1 & echo $! > /tmp/protocol_r4.pid
echo "[r4_on_alive] protocol pid $(cat /tmp/protocol_r4.pid)"
