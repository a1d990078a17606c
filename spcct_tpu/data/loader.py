# loader.py — scan loading: DICOM when available, procedural phantom otherwise.
#
# TPU-native rebuild of reference create_image_and_labels_for_dataset
# (innovative3D/helpers.py:132-211): recursive walk for .dcm/.dicom, first
# num_frames frames of each multi-frame file, bilinear resize to 512x512, and
# elliptical ROI label painting — here vectorized + cached (see rasterize.py)
# instead of the per-pixel Python loop.
#
# Additions over the reference:
#   * synthetic phantom fallback: when a scan directory has no DICOMs, volumes
#     are generated procedurally from the same ROI geometry (per-material
#     spectral signatures + noise), so the full train/eval stack runs with no
#     data mounted. Controlled by SPCCT_DATA_DIR / SPCCT_SYNTH_SLICES.
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Sequence, Tuple, Union

import numpy as np

from ..config import (
    IMAGE_HEIGHT,
    IMAGE_WIDTH,
    NUM_CLASSES,
    SYNTHETIC_IMAGE_HW,
    SYNTHETIC_SLICES_PER_SCAN,
)
from .rasterize import paint_labels

Cfg = Union[dict, Sequence[dict]]


def _find_dicoms(root: Path) -> List[str]:
    exts = (".dcm", ".dicom")
    out: List[str] = []
    if not root.is_dir():
        return out
    for dirpath, _, files in os.walk(root):
        out += [os.path.join(dirpath, f) for f in files if f.lower().endswith(exts)]
    return sorted(out)


def _resize_hw(frame: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize (antialiased on downscale) to match torchvision
    TF.resize defaults used at reference helpers.py:199."""
    if frame.shape == hw:
        return frame.astype(np.float32)
    import jax

    x = np.asarray(frame, np.float32)
    return np.asarray(jax.image.resize(x, hw, method="linear")).astype(np.float32)


# ─────────────────────────────────────────────────────────────
# Synthetic phantom (no reference equivalent — enables DICOM-free runs)
# ─────────────────────────────────────────────────────────────
# Per-material mean attenuation per spectral bin (5 bins), loosely shaped like
# SPCCT phantom contrast: HA rods brighter at low bins, iodine shows K-edge
# style contrast between bins, soft tissue flat. Values are arbitrary but
# stable — they only need to make classes separable.
_MATERIAL_SPECTRA = {
    0: (0.10, 0.10, 0.10, 0.10, 0.10),   # BG
    1: (0.95, 0.90, 0.82, 0.74, 0.68),   # HA800
    2: (0.80, 0.74, 0.66, 0.58, 0.52),   # HA400
    3: (0.66, 0.60, 0.53, 0.46, 0.41),   # HA200
    4: (0.55, 0.50, 0.44, 0.38, 0.34),   # HA100
    5: (0.18, 0.16, 0.15, 0.14, 0.13),   # Lung
    6: (0.42, 0.40, 0.38, 0.37, 0.36),   # Liver
    7: (0.30, 0.29, 0.28, 0.28, 0.27),   # Adipose
    8: (0.38, 0.37, 0.36, 0.36, 0.35),   # Water
    9: (0.50, 0.72, 0.60, 0.45, 0.40),   # I15 (K-edge bump)
    10: (0.46, 0.64, 0.54, 0.42, 0.38),  # I10
    11: (0.42, 0.55, 0.48, 0.40, 0.36),  # I5
    12: (0.48, 0.44, 0.39, 0.35, 0.32),  # HA50
}


def synth_scan(cfg: dict, num_frames: int, num_slices: int, hw: Tuple[int, int],
               seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Procedural 5-bin phantom volume stack for one scan config.

    Returns (imgs [N, F, H, W] float32, lbls [N, F, H, W] int64) with the same
    ROI geometry as the real phantom.
    """
    H, W = hw
    lbl2d = paint_labels(cfg, (H, W))
    rng = np.random.default_rng(seed)
    spectra = np.zeros((NUM_CLASSES, num_frames), np.float32)
    for c in range(NUM_CLASSES):
        s = _MATERIAL_SPECTRA.get(c, (0.3,) * 5)
        spectra[c] = np.asarray(s[:num_frames], np.float32)

    base = spectra[lbl2d]                       # (H, W, F)
    base = np.transpose(base, (2, 0, 1))        # (F, H, W)
    # phantom body: bright disk so BG inside the body != outside
    yy, xx = np.mgrid[0:H, 0:W]
    body = (((xx - W / 2) ** 2 + (yy - H / 2) ** 2) <= (0.46 * min(H, W)) ** 2)
    base = base + 0.15 * body[None, :, :].astype(np.float32)

    imgs = np.empty((num_slices, num_frames, H, W), np.float32)
    lbls = np.broadcast_to(lbl2d[None, None], (num_slices, num_frames, H, W)).copy()
    for i in range(num_slices):
        gain = 1.0 + 0.05 * rng.standard_normal()
        noise = 0.03 * rng.standard_normal((num_frames, H, W)).astype(np.float32)
        # scale roughly like CT numbers so intensity stats resemble DICOM floats
        imgs[i] = (base * gain + noise) * 1000.0
    return imgs, lbls.astype(np.int64)


def load_scan(cfg: dict, num_frames: int) -> Tuple[np.ndarray, np.ndarray]:
    """One scan → (imgs [N,F,H,W] float32, lbls [N,F,H,W] int64).

    DICOM path mirrors reference helpers.py:169-207; falls back to synth_scan
    when the directory has no DICOM files.
    """
    paths = _find_dicoms(Path(cfg["dir"]))
    if not paths:
        # crc32, not hash(): str hash is salted per process, which made the
        # synthetic noise realization differ between train.py and test.py
        # invocations (and between protocol runs) — deterministic now.
        import zlib
        seed = zlib.crc32(cfg.get("name", "scan").encode()) % (2 ** 31)
        hw = (SYNTHETIC_IMAGE_HW, SYNTHETIC_IMAGE_HW)
        if os.getenv("SPCCT_PHANTOM", "v1") == "v2":
            # hard phantom: per-slice geometric jitter, partial-volume
            # boundaries, correlated spectral noise, beam hardening, rings
            # (phantom_v2.py) — the benchmark with discrimination power
            from .phantom_v2 import synth_scan_v2
            return synth_scan_v2(cfg, num_frames, SYNTHETIC_SLICES_PER_SCAN,
                                 hw, seed, _MATERIAL_SPECTRA)
        return synth_scan(cfg, num_frames, SYNTHETIC_SLICES_PER_SCAN, hw, seed)

    # pydicom when available (full format coverage); otherwise the built-in
    # minimal codec (data/dicom_lite.py: uncompressed little-endian, which is
    # what the SPCCT export produces).
    try:
        import pydicom

        def _read(fn):
            return pydicom.dcmread(fn).pixel_array
    except ImportError:
        from .dicom_lite import read_dicom as _read

    hw = (IMAGE_HEIGHT, IMAGE_WIDTH)
    lbl2d = paint_labels(cfg, hw)
    imgs, lbls = [], []
    for fn in paths:
        frames = _read(fn)
        if frames.ndim == 2:
            frames = frames[None]
        n = min(frames.shape[0], num_frames)
        im = np.stack([_resize_hw(frames[f].astype(np.float32), hw) for f in range(n)])
        lb = np.broadcast_to(lbl2d[None], (n, *hw)).copy()
        imgs.append(im)
        lbls.append(lb)
    return np.stack(imgs), np.stack(lbls).astype(np.int64)


def load_config_set(cfg: Cfg, num_frames: int) -> Tuple[np.ndarray, np.ndarray]:
    """Single config dict or list → concatenated arrays
    (reference helpers.py:139-159)."""
    if isinstance(cfg, (list, tuple)):
        parts = [load_config_set(c, num_frames) for c in cfg]
        return (np.concatenate([p[0] for p in parts], axis=0),
                np.concatenate([p[1] for p in parts], axis=0))
    return load_scan(cfg, num_frames)
