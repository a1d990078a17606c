# rasterize.py — vectorized elliptical-ROI label painting.
#
# TPU-native rebuild of the reference's per-pixel triple loop
# (innovative3D/helpers.py:126-129 is_pixel_in_ellipse + helpers.py:202-206),
# the slowest code in the reference (SURVEY.md §3.1 "CPU hot loop #1").
# Here each ROI is painted with one vectorized mask over a coordinate grid —
# identical integer-pixel semantics, ~3 orders of magnitude faster — and the
# painted mask is computed once per scan geometry and cached.
#
# A native C++ fast path (runtime/libspcct_data.so) is used when present;
# numpy is the always-available fallback with identical output.
from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import numpy as np

from ..config import IMAGE_HEIGHT, IMAGE_WIDTH, global_label_names

Roi = Tuple[int, int, int, int, int]  # (x, y, w, h, label_index)


def scale_rois(cfg: dict, image_hw: Tuple[int, int] = (IMAGE_HEIGHT, IMAGE_WIDTH)) -> List[Roi]:
    """Scale 1300x1300 ROI coords to the working resolution with the
    reference's exact int() truncation and offset handling
    (helpers.py:177-186)."""
    H, W = image_hw
    scale_x, scale_y = W / 1300.0, H / 1300.0
    ox, oy = cfg["offset"]
    name_to_idx = {n: i for i, n in global_label_names.items()}
    rois = []
    for (x, y, w, h, lab_str) in cfg["original_rois"]:
        rx = int((x + ox) * scale_x)
        ry = int((y + oy) * scale_y)
        rw = int(w * scale_x)
        rh = int(h * scale_y)
        rois.append((rx, ry, rw, rh, name_to_idx.get(lab_str, 0)))
    return rois


def _paint_numpy(rois: Sequence[Roi], H: int, W: int) -> np.ndarray:
    """Paint ROIs in table order (later ROIs overwrite earlier ones, matching
    the reference's sequential per-ROI loop)."""
    lbl = np.zeros((H, W), dtype=np.int64)
    yy, xx = np.mgrid[0:H, 0:W]
    for (x0, y0, w0, h0, lab) in rois:
        cx, cy = x0 + w0 / 2.0, y0 + h0 / 2.0
        a, b = w0 / 2.0, h0 / 2.0
        if a <= 0 or b <= 0:
            continue
        # reference iterates px in [x0, x0+w0), py in [y0, y0+h0) and tests the
        # ellipse inequality (helpers.py:202-206); the bbox clip reproduces
        # that iteration domain exactly (out-of-image coords write nowhere).
        ys = slice(max(0, y0), min(H, y0 + h0))
        xs = slice(max(0, x0), min(W, x0 + w0))
        py, px = yy[ys, xs], xx[ys, xs]
        inside = ((px - cx) ** 2) / (a * a) + ((py - cy) ** 2) / (b * b) <= 1.0
        region = lbl[ys, xs]
        region[inside] = lab
        lbl[ys, xs] = region
    return lbl


_native = None


def _load_native():
    global _native
    if _native is None:
        try:
            from ..runtime.native import lib  # ctypes handle or None
            _native = lib if lib is not None else False
        except Exception:
            _native = False
    return _native


@lru_cache(maxsize=64)
def _painted_cached(rois_key: tuple, H: int, W: int) -> np.ndarray:
    rois = list(rois_key)
    lib = _load_native()
    if lib:
        out = np.zeros((H, W), dtype=np.int64)
        arr = np.asarray(rois, dtype=np.int64).reshape(-1, 5)
        lib.paint_ellipses(out, H, W, arr, arr.shape[0])
        return out
    return _paint_numpy(rois, H, W)


def paint_labels(cfg: dict, image_hw: Tuple[int, int] = (IMAGE_HEIGHT, IMAGE_WIDTH)) -> np.ndarray:
    """(H, W) int64 label mask for a scan config; cached per geometry."""
    rois = tuple(scale_rois(cfg, image_hw))
    return _painted_cached(rois, image_hw[0], image_hw[1]).copy()
