#!/usr/bin/env python
# make_dicom_fixture.py — write a tiny self-contained DICOM dataset with the
# reference's on-disk layout (BASE_DIR/{firstscan,filtered,filtered2,
# filtered3,filtered4}/*.dcm, multi-frame stacks) so the REAL loader path —
# dicom_lite codec → 512² resize → ROI rasterization → training — can be
# rehearsed end-to-end with no data mount (VERDICT r3 task 8; reference
# helpers.py:132-211).
#
#   python scripts/make_dicom_fixture.py /tmp/dicom_fixture [--hw 256]
#
# Frames are rendered from the scan's own ROI geometry with the synthetic
# material spectra (labels correlate with pixels, so a drill run trains on
# a real, if easy, task), quantized to uint16 like the SPCCT export.
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spcct_tpu.config import dataset_configs  # noqa: E402
from spcct_tpu.data.dicom_lite import write_dicom  # noqa: E402
from spcct_tpu.data.loader import _MATERIAL_SPECTRA  # noqa: E402
from spcct_tpu.data.rasterize import paint_labels  # noqa: E402

SET_DIRS = ["firstscan", "filtered", "filtered2", "filtered3", "filtered4"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dest")
    ap.add_argument("--hw", type=int, default=256,
                    help="stored frame size (loader resizes to 512)")
    ap.add_argument("--files-per-scan", type=int, default=2)
    ap.add_argument("--frames-per-file", type=int, default=7,
                    help="frames stored; the loader keeps the first 5")
    args = ap.parse_args()

    dest = Path(args.dest)
    rng = np.random.default_rng(0)
    for cfg, d in zip(dataset_configs, SET_DIRS):
        scan_dir = dest / d
        scan_dir.mkdir(parents=True, exist_ok=True)
        lbl = paint_labels(cfg, (args.hw, args.hw))
        spectra = np.stack([
            np.asarray(_MATERIAL_SPECTRA.get(c, (0.3,) * 5), np.float32)
            for c in range(13)])
        base = spectra[lbl]                       # (H, W, 5)
        base = np.transpose(base, (2, 0, 1))      # (5, H, W)
        for i in range(args.files_per_scan):
            F = args.frames_per_file
            fr = np.empty((F, args.hw, args.hw), np.float32)
            for f in range(F):
                fr[f] = base[min(f, 4)] * (1.0 + 0.05 * rng.standard_normal())
            fr += 0.02 * rng.standard_normal(fr.shape).astype(np.float32)
            px = np.clip(fr * 2000.0, 0, 65535).astype(np.uint16)
            write_dicom(scan_dir / f"stack{i}.dcm", px)
        print(f"{scan_dir}: {args.files_per_scan} x {args.frames_per_file}"
              f"-frame uint16 {args.hw}^2 stacks")


if __name__ == "__main__":
    main()
