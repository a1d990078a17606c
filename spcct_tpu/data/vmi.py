# vmi.py — optional virtual-monoenergetic-image preprocessing.
#
# Rebuild of reference apply_vmi_preprocess (helpers.py:915-943): linear
# bin-mixing einsum("kf,bfhw->bkhw") producing K monoenergetic images from F
# spectral bins, optional clipping, tiled/stacked back to a depth axis.
# Default OFF (config.USE_VMI, reference config.py:240).
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def apply_vmi_preprocess(
    x: jnp.ndarray,
    weights: Sequence[Sequence[float]],
    clip: Tuple[Optional[float], Optional[float]] = (None, None),
    return_depth: int = 1,
) -> jnp.ndarray:
    """x: (B, F, H, W, 1) channels-last spectral stack → (B, D, H, W, 1).

    K==1: the single VMI is tiled to `return_depth`; K>1: K becomes the depth
    axis directly (matches reference semantics on the (B,1,F,H,W) layout).
    """
    if x.ndim != 5 or x.shape[-1] != 1:
        raise ValueError(f"expected (B,F,H,W,1), got {x.shape}")
    B, F, H, W, _ = x.shape
    Wm = jnp.asarray(weights, x.dtype)  # (K, F)
    if Wm.shape[1] != F:
        raise ValueError(f"weights expect F={F}, got {Wm.shape[1]}")
    vmi = jnp.einsum("kf,bfhw->bkhw", Wm, x[..., 0])  # (B, K, H, W)

    lo, hi = clip
    if lo is not None or hi is not None:
        vmi = jnp.clip(vmi,
                       lo if lo is not None else vmi.min(),
                       hi if hi is not None else vmi.max())

    if vmi.shape[1] == 1:
        D = max(1, int(return_depth))
        vmi = jnp.broadcast_to(vmi[:, 0:1], (B, D, H, W))
    return vmi[..., None]


def apply_vmi_np(
    x: np.ndarray,
    weights: Sequence[Sequence[float]],
    clip: Tuple[Optional[float], Optional[float]] = (None, None),
    return_depth: int = 1,
) -> np.ndarray:
    """Host-side (numpy) twin of apply_vmi_preprocess for the input pipeline —
    same semantics, no device round-trip from the prefetch thread. Tested
    against the jnp version in tests/test_data.py."""
    if x.ndim != 5 or x.shape[-1] != 1:
        raise ValueError(f"expected (B,F,H,W,1), got {x.shape}")
    B, F, H, W, _ = x.shape
    Wm = np.asarray(weights, x.dtype)  # (K, F)
    if Wm.shape[1] != F:
        raise ValueError(f"weights expect F={F}, got {Wm.shape[1]}")
    vmi = np.einsum("kf,bfhw->bkhw", Wm, x[..., 0])

    lo, hi = clip
    if lo is not None or hi is not None:
        vmi = np.clip(vmi,
                      lo if lo is not None else vmi.min(),
                      hi if hi is not None else vmi.max())

    if vmi.shape[1] == 1:
        D = max(1, int(return_depth))
        vmi = np.broadcast_to(vmi[:, 0:1], (B, D, H, W))
    return np.ascontiguousarray(vmi[..., None])
