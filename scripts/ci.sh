#!/usr/bin/env bash
# ci.sh — the repo's verification recipe, one command.
#
#   scripts/ci.sh            # full: tests + entry-point checks + fast drive
#   scripts/ci.sh --quick    # tests only
#
# Tests run on a virtual 8-device CPU mesh (tests/conftest.py forces the CPU
# platform); the fast drive and bench need the attached accelerator and are
# skipped automatically when only CPU is available.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== pytest (virtual 8-device CPU mesh) ==="
python -m pytest tests/ -q

echo "=== graft entry: single-chip compile check ==="
python - << 'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__
fn, args = __graft_entry__.entry()
jax.jit(fn).lower(*args).compile()
print("entry() compiles")
EOF

echo "=== graft entry: multichip dryrun (virtual mesh) ==="
python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

if [ "${1:-}" = "--quick" ]; then exit 0; fi

echo "=== fast end-to-end drive ==="
SPCCT_SYNTH_HW=64 SPCCT_SYNTH_SLICES=6 \
CHECKPOINT_DIR="$(mktemp -d)" LOG_DIR="$(mktemp -d)" \
python train.py --fast --variant PlainCore_UNet --seeds 42 --epochs 2

echo "=== bench (one JSON line) ==="
python bench.py

echo "CI GREEN"
