#!/usr/bin/env bash
# r5_remat_bench.sh — round-5 bandwidth-remat experiment on the headline
# SPFF-UNet train step. The step is HBM-bound (BASELINE.md round-5 bytes
# memo: 139.5 ms bandwidth floor vs 75.9 ms compute floor at the measured
# 763 GB/s / 38 TF/s) — rematerialization trades idle MXU FLOPs for
# saved-residual traffic, and lets XLA fuse recomputed norm/act/gate
# chains into their gradient consumers instead of round-tripping HBM.
# Three granularities, each one bench.py run:
#   full  — jax.checkpoint around the whole forward (SPCCT_BENCH_REMAT)
#   block — nn.remat per DoubleConvSpectral     (SPCCT_BLOCK_REMAT)
#   level — nn.remat per decoder level          (SPCCT_LEVEL_REMAT_ALL)
#   bash scripts/r5_remat_bench.sh
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p perf_logs

run_cfg() {
  local name=$1; shift
  echo "=== r5_remat $name ($(date -u +%H:%M:%S)) ==="
  env "$@" timeout 1200 python bench.py 2>"perf_logs/r5_remat_$name.err" \
    | tee "perf_logs/r5_remat_$name.json" \
    || echo "FAILED rc=$? (see perf_logs/r5_remat_$name.err)"
}

run_cfg full  SPCCT_BENCH_REMAT=1
run_cfg block SPCCT_BLOCK_REMAT=1
run_cfg level SPCCT_LEVEL_REMAT_ALL=1

# virtual-concat threshold probes (knob exists in layers.py::skip_join):
# r3 measured vcat-everywhere at -11%; these test vcat at ONLY the largest
# (512^2, 32ch) join — the level-1 concat+its layout copies are ~1.3 GiB
# of the step's HLO traffic (scripts/hlo_bytes.py on /tmp/spff_step.hlo)
run_cfg vcat32 SPCCT_VCAT_MAXC=32
run_cfg vcat64 SPCCT_VCAT_MAXC=64

echo "=== r5 remat matrix done ==="
for f in perf_logs/r5_remat_*.json; do echo "$f: $(cat "$f" 2>/dev/null)"; done
