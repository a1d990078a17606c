# config.py — constants, label space, ROI tables, env contract, variant registry glue.
#
# TPU-native rebuild of the reference configuration module
# (reference: innovative3D/config.py:15-124 for constants/labels/ROIs,
#  config.py:232-258 for loss/VMI/env, config.py:271-482 for VARIANTS).
#
# Differences from the reference, by design:
#   * INNOVATIVE3D_VARIANT is honored (reference defines it at config.py:482 but
#     train.py:1615 ignores it — quirk #3 in SURVEY.md §8).
#   * The data root defaults to a synthetic phantom generator when no DICOM
#     directory is present, so every entry point runs end-to-end out of the box.
from __future__ import annotations

import os
from pathlib import Path

# ─────────────────────────────────────────────────────────────
# Paths & core constants (reference config.py:15-33)
# ─────────────────────────────────────────────────────────────
BASE_DIR = Path(os.getenv("SPCCT_DATA_DIR", os.getenv("BASE_DIR", "/root/data/Fivedatasets")))

IMAGE_HEIGHT, IMAGE_WIDTH = 512, 512
NUM_FRAMES = 5
NUM_CLASSES = 13
FINAL_EPOCHS = 200
BEST_LR = 1e-4
IGNORE_INDEX = 255
BATCH_SIZE = 1
NUM_WORKERS = int(os.getenv("SPCCT_NUM_WORKERS", "8"))
num_workers = NUM_WORKERS  # alias kept for API parity

grid_size = 10
SEEDS = [42, 123, 999]

# ─────────────────────────────────────────────────────────────
# Label space (reference config.py:43-51)
# ─────────────────────────────────────────────────────────────
global_label_names = {
    0: "BG", 1: "HA800", 2: "HA400", 3: "HA200", 4: "HA100", 5: "Lung",
    6: "Liver", 7: "Adipose", 8: "Water", 9: "I15", 10: "I10", 11: "I5",
    12: "HA50",
}
label_colors = {
    0: (0, 0, 0), 1: (255, 0, 0), 2: (255, 127, 0), 3: (255, 255, 0),
    4: (0, 255, 0), 5: (0, 255, 255), 6: (0, 0, 255), 7: (139, 69, 19),
    8: (255, 255, 255), 9: (255, 0, 255), 10: (128, 0, 128),
    11: (0, 128, 128), 12: (128, 128, 0),
}

# ─────────────────────────────────────────────────────────────
# Per-scan dataset configs: elliptical ROIs in native 1300x1300 coords
# (reference config.py:56-113; offsets and ROI tables reproduced verbatim —
#  they are physical phantom geometry, not code)
# ─────────────────────────────────────────────────────────────
DATA_DIRS = {
    f"set{i + 1}": BASE_DIR / d
    for i, d in enumerate(["firstscan", "filtered", "filtered2", "filtered3", "filtered4"])
}

dataset_configs = [
    {
        "name": "set1",
        "dir": DATA_DIRS["set1"],
        "original_rois": [
            (652, 378, 186, 182, "HA800"), (880, 498, 186, 182, "HA400"),
            (934, 750, 186, 182, "HA200"), (761, 950, 186, 182, "HA100"),
            (513, 934, 186, 182, "Lung"), (349, 727, 186, 182, "Liver"),
            (416, 479, 186, 182, "Adipose"), (648, 670, 186, 182, "Water"),
        ],
        "offset": (-95, -90),
    },
    {
        "name": "set2",
        "dir": DATA_DIRS["set2"],
        "original_rois": [
            (342, 569, 188, 186, "HA800"), (532, 385, 188, 186, "HA100"),
            (786, 413, 188, 186, "Lung"), (928, 637, 188, 186, "HA200"),
            (840, 881, 188, 186, "Liver"), (594, 969, 188, 186, "HA400"),
            (378, 827, 188, 186, "Adipose"), (631, 667, 188, 186, "Water"),
        ],
        "offset": (-95, -90),
    },
    {
        "name": "set3",
        "dir": DATA_DIRS["set3"],
        "original_rois": [
            (828, 441, 182, 180, "HA100"), (930, 679, 182, 180, "HA200"),
            (808, 913, 182, 180, "HA400"), (555, 956, 182, 180, "HA800"),
            (358, 784, 182, 180, "Adipose"), (376, 529, 182, 180, "Lung"),
            (578, 375, 182, 180, "Liver"), (628, 668, 182, 180, "Water"),
        ],
        "offset": (-95, -90),
    },
    {
        "name": "set4",
        "dir": DATA_DIRS["set4"],
        "original_rois": [
            (773, 409, 184, 188, "HA800"), (922, 620, 184, 188, "I15"),
            (845, 867, 184, 188, "I10"), (606, 964, 184, 188, "I5"),
            (377, 835, 184, 188, "HA100"), (339, 582, 184, 188, "HA200"),
            (516, 390, 184, 188, "HA400"), (627, 660, 184, 188, "Water"),
        ],
        "offset": (-95, -90),
    },
    {
        "name": "set5",
        "dir": DATA_DIRS["set5"],
        "original_rois": [
            (523, 388, 186, 184, "HA800"), (778, 409, 186, 184, "I5"),
            (921, 625, 186, 184, "HA50"), (844, 878, 186, 184, "HA400"),
            (598, 965, 186, 184, "I10"), (373, 829, 186, 184, "HA200"),
            (341, 575, 186, 184, "I15"), (631, 666, 186, 184, "HA100"),
        ],
        "offset": (-95, -90),
    },
]

# Scan-level split (reference config.py:117-124)
TRAIN_INDICES = [0, 1, 2, 4]
TEST_INDICES = [3]
trainval_sets = [dataset_configs[i] for i in TRAIN_INDICES]
test_set = [dataset_configs[i] for i in TEST_INDICES]

# ─────────────────────────────────────────────────────────────
# Training recipe selection (reference config.py:232-245)
# ─────────────────────────────────────────────────────────────
LOSS_NAME = os.getenv("SPCCT_LOSS", "ce_plus_macro_dice")
FOCAL_ALPHA = 0.25
FOCAL_GAMMA = 2.0
GRAD_WEIGHT = 1.0

USE_VMI = os.getenv("SPCCT_USE_VMI", "0") == "1"  # default OFF (reference config.py:240)
VMI_MODE = "linear"
VMI_WEIGHTS = [[0.10, 0.20, 0.40, 0.20, 0.10]]  # K x F
VMI_CLIP = (None, None)
VMI_RETURN_DEPTH = 1

# Quirk flags (SURVEY.md §8) — defaults match the reference.
#  * SOFT_DICE_IN_LOSS=0: the default loss's dice term is a hard, non-
#    differentiable macro dice added through stop_gradient (reference
#    helpers.py:782-803 — gradient flows only through CE). Set 1 for a
#    differentiable soft-dice term instead.
#  * GRID_STAMP=1: burn the bright 32x32 top-left stamp into grid-shuffled
#    training inputs (reference datasets.py:199-204).
SOFT_DICE_IN_LOSS = os.getenv("SPCCT_SOFT_DICE", "0") == "1"
GRID_STAMP = os.getenv("SPCCT_GRID_STAMP", "1") == "1"

# ─────────────────────────────────────────────────────────────
# Env contract (reference config.py:252-258, 482)
# ─────────────────────────────────────────────────────────────
_PROJECT_ROOT = Path(__file__).resolve().parents[1]
CHECKPOINT_DIR = Path(os.getenv("CHECKPOINT_DIR", str(_PROJECT_ROOT / "checkpoints"))).resolve()
LOG_DIR = Path(os.getenv("LOG_DIR", str(_PROJECT_ROOT / "runs"))).resolve()
CKPT_DIR = CHECKPOINT_DIR  # back-compat alias

SELECTED_VARIANT = os.getenv("INNOVATIVE3D_VARIANT")

# Synthetic-data controls. When the DICOM root is absent the data pipeline
# generates a procedural 5-bin phantom with the same ROI geometry so every
# entry point runs end-to-end (reference has no such fallback).
SYNTHETIC_SLICES_PER_SCAN = int(os.getenv("SPCCT_SYNTH_SLICES", "12"))
SYNTHETIC_IMAGE_HW = int(os.getenv("SPCCT_SYNTH_HW", str(IMAGE_HEIGHT)))

# Mesh / performance knobs (TPU-native additions; no reference equivalent —
# the reference hard-codes devices=1 at train.py:1489).
MESH_DATA = int(os.getenv("SPCCT_MESH_DATA", "0"))   # 0 → all visible devices
MESH_MODEL = int(os.getenv("SPCCT_MESH_MODEL", "1"))
COMPUTE_DTYPE = os.getenv("SPCCT_COMPUTE_DTYPE", "bfloat16")

# Kernel-path knobs (read at trace time where they act; index here for
# discoverability — measurements in BASELINE.md/DESIGN.md):
#  SPCCT_PALLAS_CONV=1    CW Pallas convs in the _profitable region (opt-in:
#                         each custom call costs ~3.7 ms through the axon
#                         tunnel; re-measure on directly-attached TPUs)
#  SPCCT_MEGAKERNEL=1     fused IN+lrelu+conv junctions (opt-in, same reason)
#  SPCCT_MEGA_MINW/MAXCOUT    megakernel region bounds (256 / 64)
#  SPCCT_PALLAS_RESCUE=0  disable the small-channel memory-rescue kernels
#                         (default ON — they are what fits SwinUNETR in HBM)
#  SPCCT_VCAT_MAXC        virtual-concat join threshold (16)
#  SPCCT_REAL_CONCAT=1    force real concatenate joins everywhere
#  SPCCT_PALLAS_HT        kernel row-tile (8; 32+ exceeds 16 MB VMEM scope)
#  SPCCT_PALLAS_BWD=0     Pallas forward with XLA backward (bisection)
#  SPCCT_SCAN_EPOCH=1     one-dispatch compiled epochs (measured neutral)
#  SPCCT_BENCH_WATCHDOG   bench.py abort timeout, seconds (1800)
# Round-4 additions:
#  SPCCT_PHANTOM=v2       hard synthetic phantom (data/phantom_v2.py);
#                         default v1 keeps runs_protocol*/ comparable
#  SPCCT_BENCH_SCAN=1     bench.py one-dispatch scan-chunk mode
#  SPCCT_BENCH_WAIT       bench.py liveness-probe retry budget, s (900)
#  SPCCT_BENCH_RETRY_SLEEP  probe retry sleep, s (120)
#  SPCCT_DRYRUN_FORCE_CPU=1 dryrun_multichip: skip the device probe
#  SPCCT_DRYRUN_WATCHDOG  dryrun subprocess budget, s (1800)
#  SPCCT_XLA_OPTS         comma-separated KEY=VALUE XLA compiler options
#                         passed to every jitted step (utils/xla_opts.py);
#                         the only per-program flag path that reaches the
#                         tunneled backend's compiler


def ensure_dirs() -> None:
    """Create checkpoint/log dirs on demand (reference does this at import,
    config.py:258-259; we defer so library import has no side effects)."""
    CHECKPOINT_DIR.mkdir(parents=True, exist_ok=True)
    LOG_DIR.mkdir(parents=True, exist_ok=True)
