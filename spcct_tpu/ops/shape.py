# shape.py — static pad/crop/resize-adapters for (B, D, H, W, C) volumes.
#
# TPU-native equivalents of the reference pad/crop helpers
# (reference: innovative3D/models.py:106-163). Channels-last layout; all
# shapes are static under jit — padding amounts are Python ints resolved at
# trace time (quirk #5/#6 of SURVEY.md §7: padded shapes are compile-time
# constants, no dynamic shapes).
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def next_mult(n: int, m: int = 16) -> int:
    return ((n + m - 1) // m) * m


def pad_to_mult_3d(x: jnp.ndarray, m: int = 16):
    """Replicate-pad (B,D,H,W,C) so D/H/W are multiples of m, centered.

    Mirrors reference models.py:109-120 (F.pad mode='replicate' with centered
    left/right splits). Returns (x_pad, orig_dhw_or_None).
    """
    if x.ndim != 5:
        raise ValueError(f"expect (B,D,H,W,C), got {x.shape}")
    _, D, H, W, _ = x.shape
    Dn, Hn, Wn = next_mult(D, m), next_mult(H, m), next_mult(W, m)
    pd, ph, pw = Dn - D, Hn - H, Wn - W
    if not (pd or ph or pw):
        return x, None
    pads = (
        (0, 0),
        (pd // 2, pd - pd // 2),
        (ph // 2, ph - ph // 2),
        (pw // 2, pw - pw // 2),
        (0, 0),
    )
    return jnp.pad(x, pads, mode="edge"), (D, H, W)


def center_crop_3d(x: jnp.ndarray, orig_dhw: Optional[Tuple[int, int, int]]):
    """Inverse of pad_to_mult_3d (reference models.py:122-127)."""
    if orig_dhw is None:
        return x
    D, H, W = orig_dhw
    _, Dn, Hn, Wn, _ = x.shape
    sd, sh, sw = (Dn - D) // 2, (Hn - H) // 2, (Wn - W) // 2
    return x[:, sd:sd + D, sh:sh + H, sw:sw + W, :]


def pad_to_mult_hw(x: jnp.ndarray, multiple: int = 16):
    """H/W-only replicate pad preserving spectral depth (models.py:139-146).

    Pads on the bottom/right only, like the reference.
    """
    if x.ndim != 5:
        raise ValueError(f"expect (B,D,H,W,C), got {x.shape}")
    _, D, H, W, _ = x.shape
    ph = (multiple - (H % multiple)) % multiple
    pw = (multiple - (W % multiple)) % multiple
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x, (D, H, W)


def crop_to_hw(x: jnp.ndarray, orig_dhw: Tuple[int, int, int]):
    """Inverse of pad_to_mult_hw (models.py:148-150): top-left crop."""
    D0, H0, W0 = orig_dhw
    return x[:, :D0, :H0, :W0, :]


def resize_depth(x: jnp.ndarray, target_depth: int) -> jnp.ndarray:
    """Trilinear-resize the depth axis only (models.py:153-163), (B,D,H,W,C)."""
    if x.shape[1] == target_depth:
        return x
    from .resize import trilinear_resize

    B, _, H, W, C = x.shape
    return trilinear_resize(x, (target_depth, H, W))
