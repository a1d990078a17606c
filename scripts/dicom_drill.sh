#!/bin/bash
# dicom_drill.sh — mount-day rehearsal (VERDICT r3 task 8): prove the
# codec → rasterize → train chain end-to-end through the REAL DICOM loader
# path (not the synthetic fallback) using a self-written fixture.
#
#   bash scripts/dicom_drill.sh [workdir]
#
# Expect: loader verification line, then a 1-epoch full-resolution (512²,
# the fixed DICOM-path resolution) training run that writes a finite
# all_results.csv row. On mount day, replace the fixture dir with the real
# SPCCT_DATA_DIR and drop --fast.
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp/dicom_drill}"
rm -rf "$WORK"
mkdir -p "$WORK"

# 1 file/scan keeps the 512^2 CPU training phase tractable on small hosts
# (the DICOM path's resolution is the fixed reference 512^2 — no shrink knob)
python scripts/make_dicom_fixture.py "$WORK/data" --hw 192 --files-per-scan 1

# 1. loader-level verification: the fixture is read via the DICOM path
SPCCT_DATA_DIR="$WORK/data" python - <<'EOF'
import os

import jax

# honor JAX_PLATFORMS under the axon PJRT plugin (env var is overridden by
# the sitecustomize; only the config API works — same as train.py:30)
if os.getenv("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.getenv("JAX_PLATFORMS"))
import numpy as np
# config reads SPCCT_DATA_DIR at import time
from spcct_tpu.config import dataset_configs
from spcct_tpu.data import loader
paths = loader._find_dicoms(dataset_configs[0]["dir"])
assert paths, f"no DICOMs found under {dataset_configs[0]['dir']} - fixture broken"
imgs, lbls = loader.load_scan(dataset_configs[0], 5)
assert imgs.shape[1:] == (5, 512, 512), imgs.shape
assert set(np.unique(lbls)) > {0}, "ROI labels not painted"
print(f"[drill] DICOM loader path OK: {len(paths)} files -> {imgs.shape}, "
      f"classes {sorted(set(np.unique(lbls)))}")
EOF

# 2. end-to-end: 1-epoch training through the same path (512² full res —
# slow on CPU, so cap samples with --fast-limit)
SPCCT_DATA_DIR="$WORK/data" \
CHECKPOINT_DIR="$WORK/ck" LOG_DIR="$WORK/logs" \
timeout "${SPCCT_DRILL_TIMEOUT:-9000}" python train.py --fast --fast-limit 2 \
  --fast-skip-viz --variant PlainCore_UNet --seeds 42 --epochs 1

python - "$WORK/logs/all_results.csv" <<'EOF'
import csv, math, sys
rows = list(csv.DictReader(open(sys.argv[1])))
assert rows, "no all_results row written"
d = float(rows[-1]["test_macro_dice"])
assert math.isfinite(d), f"non-finite test dice {d}"
print(f"[drill] end-to-end OK: test_macro_dice={d:.4f}")
EOF
echo "[drill] PASS"
