# resize.py — linear resampling matching torch `align_corners=False` semantics.
#
# The reference leans on F.interpolate(mode="trilinear", align_corners=False)
# for depth adapters and skip alignment (reference models.py:157,163,690,1028).
# jax.image.resize(method="linear") uses the same half-pixel-center convention,
# so these are drop-in numerical equivalents (validated in
# tests/test_ops.py::test_trilinear_matches_torch).
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def trilinear_resize(x: jnp.ndarray, dhw: Tuple[int, int, int]) -> jnp.ndarray:
    """Resize (B,D,H,W,C) to (B,*dhw,C) with trilinear interpolation."""
    B, _, _, _, C = x.shape
    out = jax.image.resize(x, (B, dhw[0], dhw[1], dhw[2], C), method="linear")
    return out.astype(x.dtype)


def bilinear_resize_2d(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize (..., H, W) to (..., *hw) bilinearly (used by the DICOM loader;
    reference helpers.py:199 uses torchvision TF.resize, bilinear+antialias-off
    equivalent)."""
    shape = x.shape[:-2] + (hw[0], hw[1])
    return jax.image.resize(x, shape, method="linear").astype(x.dtype)
