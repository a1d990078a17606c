# Parity tests for shape/resize ops against torch oracles
# (reference semantics: innovative3D/models.py:106-163).
import numpy as np
import pytest

import jax.numpy as jnp

from spcct_tpu.ops.shape import (
    center_crop_3d,
    crop_to_hw,
    next_mult,
    pad_to_mult_3d,
    pad_to_mult_hw,
    resize_depth,
)
from spcct_tpu.ops.resize import trilinear_resize

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_next_mult():
    assert next_mult(5, 16) == 16
    assert next_mult(16, 16) == 16
    assert next_mult(17, 16) == 32


def test_pad_to_mult_matches_torch_replicate():
    x = _rand((2, 5, 30, 27, 3))
    xp, orig = pad_to_mult_3d(jnp.asarray(x), 16)
    assert orig == (5, 30, 27)
    assert xp.shape == (2, 16, 32, 32, 3)
    # torch oracle: (B,C,D,H,W) replicate pad, centered (models.py:109-120)
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    pd, ph, pw = 11, 2, 5
    pads = (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2, pd // 2, pd - pd // 2)
    xt_pad = F.pad(xt, pads, mode="replicate").numpy()
    np.testing.assert_allclose(
        np.transpose(np.asarray(xp), (0, 4, 1, 2, 3)), xt_pad, atol=1e-6
    )


def test_pad_crop_roundtrip():
    x = jnp.asarray(_rand((1, 5, 30, 27, 2)))
    xp, orig = pad_to_mult_3d(x, 16)
    back = center_crop_3d(xp, orig)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


def test_pad_hw_only_preserves_depth():
    x = jnp.asarray(_rand((1, 5, 30, 27, 2)))
    xp, orig = pad_to_mult_hw(x, 16)
    assert xp.shape == (1, 5, 32, 32, 2)
    back = crop_to_hw(xp, orig)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


def test_trilinear_matches_torch_align_corners_false():
    x = _rand((1, 5, 8, 8, 2))
    out = trilinear_resize(jnp.asarray(x), (16, 12, 20))
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    ot = F.interpolate(xt, size=(16, 12, 20), mode="trilinear", align_corners=False)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(ot.numpy(), (0, 2, 3, 4, 1)), atol=1e-4
    )


def test_resize_depth_matches_torch():
    x = _rand((1, 5, 6, 6, 1))
    out = resize_depth(jnp.asarray(x), 16)
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    ot = F.interpolate(xt, size=(16, 6, 6), mode="trilinear", align_corners=False)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(ot.numpy(), (0, 2, 3, 4, 1)), atol=1e-4
    )
