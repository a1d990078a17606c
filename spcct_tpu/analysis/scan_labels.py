# scan_labels.py — scan-level presence labels from voxel predictions.
#
# Rebuild of reference train.py:379-501: a class is "present" in a scan when
# its predicted voxel count ≥ SCAN_MIN_VOX (default 800, env-overridable);
# per-case presence vectors → scan_labels.csv. (The reference defines this
# machinery but comments out the call site at train.py:1558-1570; here it is
# callable and wired behind SPCCT_SCAN_LABELS=1.)
from __future__ import annotations

import csv
import os
from pathlib import Path
from typing import List

import numpy as np

from ..config import NUM_CLASSES, global_label_names

SCAN_MIN_VOX = int(os.getenv("SCAN_MIN_VOX", "800"))


def presence_vector(pred: np.ndarray, num_classes: int = NUM_CLASSES,
                    min_vox: int = SCAN_MIN_VOX) -> np.ndarray:
    """pred: int voxel predictions (any shape) → (C,) 0/1 presence."""
    counts = np.bincount(pred.ravel(), minlength=num_classes)[:num_classes]
    return (counts >= min_vox).astype(np.int64)


def write_scan_labels(preds_per_case: List[np.ndarray],
                      gts_per_case: List[np.ndarray], out_path):
    """Per-case predicted + GT presence vectors → scan_labels.csv."""
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    names = [global_label_names[i] for i in range(NUM_CLASSES)]
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["case"] + [f"pred_{n}" for n in names] + [f"gt_{n}" for n in names])
        for i, (p, g) in enumerate(zip(preds_per_case, gts_per_case)):
            pv = presence_vector(p)
            gv = presence_vector(np.where(g >= NUM_CLASSES, 0, g))
            w.writerow([i] + pv.tolist() + gv.tolist())
