# Device-resident data path (data/device_aug.py): semantics parity of the
# on-device augmentation against the host TrainGridAug pipeline given the
# same parameters, plus an end-to-end driver run in device mode.
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pytest

from spcct_tpu.data.augment import TrainGridAug, stripe_permutation
from spcct_tpu.data.device_aug import (
    device_batch, device_batch_plain, draw_params, identity_params)


def _mk(F=5, H=32, W=32, n=3, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.standard_normal((n, F, H, W)).astype(np.float32)
    lbls = rng.integers(0, 13, (n, F, H, W)).astype(np.int32)
    return jnp.asarray(imgs), jnp.asarray(lbls), imgs, lbls


def test_plain_gather_matches():
    di, dl, imgs, lbls = _mk()
    x, y = device_batch_plain(di, dl, np.array([2, 0], np.int32))
    assert x.shape == (2, 5, 32, 32, 1)
    np.testing.assert_array_equal(np.asarray(x)[..., 0], imgs[[2, 0]])
    np.testing.assert_array_equal(np.asarray(y), lbls[[2, 0]])


def test_identity_params_are_identity():
    di, dl, imgs, lbls = _mk()
    p = {k: np.stack([v]) for k, v in identity_params(32, 32).items()}
    x, y = device_batch(di, dl, np.array([1], np.int32), p)
    np.testing.assert_allclose(np.asarray(x)[0, ..., 0], imgs[1], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(y)[0], lbls[1])


def test_forced_params_match_host_semantics():
    """Flips + rot90 + jitter + stripe shuffle + stamp (no noise), device vs
    an explicit numpy replica in the documented op order."""
    di, dl, imgs, lbls = _mk(seed=3)
    H = W = 32
    rng = np.random.default_rng(7)
    idx_h = stripe_permutation(H, 4, rng).astype(np.int32)
    idx_w = stripe_permutation(W, 4, rng).astype(np.int32)
    p = identity_params(H, W)
    p.update(flip_w=np.bool_(True), flip_h=np.bool_(True), rot_k=np.int32(3),
             scale=np.float32(1.07), shift=np.float32(-0.03),
             idx_h=idx_h, idx_w=idx_w, stamp=np.bool_(True))
    p = {k: np.stack([v]) for k, v in p.items()}
    x, y = device_batch(di, dl, np.array([0], np.int32), p)

    # numpy replica, same order as TrainGridAug
    img, lbl = imgs[0].copy(), lbls[0].copy()
    img, lbl = img[..., ::-1], lbl[..., ::-1]
    img, lbl = img[..., ::-1, :], lbl[..., ::-1, :]
    img = np.rot90(img, 3, axes=(-2, -1))
    lbl = np.rot90(lbl, 3, axes=(-2, -1))
    img = img * 1.07 + (-0.03)
    img = img[:, idx_h, :][:, :, idx_w]
    lbl = lbl[:, idx_h, :][:, :, idx_w]
    bump = max(float(np.abs(img).max()), 1.0) * 0.25
    img[0, :32, :32] = img[0, :32, :32].max() + bump

    np.testing.assert_allclose(np.asarray(x)[0, ..., 0], img, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(y)[0], lbl)


def test_draw_params_structure():
    aug = TrainGridAug()
    rng = np.random.default_rng(0)
    p = draw_params(aug, 32, 32, gs=4, rng=rng, noise_seed=123)
    assert p["idx_h"].shape == (32,) and p["idx_w"].shape == (32,)
    assert sorted(p["idx_h"].tolist()) == list(range(32))
    assert 0 <= int(p["rot_k"]) <= 3


def test_noise_applied_when_requested():
    di, dl, imgs, _ = _mk(seed=5)
    p = identity_params(32, 32)
    p.update(use_noise=np.bool_(True), noise_std=np.float32(0.01))
    p = {k: np.stack([v]) for k, v in p.items()}
    x, _ = device_batch(di, dl, np.array([0], np.int32), p)
    diff = np.abs(np.asarray(x)[0, ..., 0] - imgs[0])
    assert diff.max() > 0                       # noise present
    assert diff.max() < 0.1                     # bounded by std clamp


def test_fit_device_mode(tmp_path, monkeypatch):
    """End-to-end: 1-epoch fit with SPCCT_DEVICE_DATA=1 on the CPU backend
    produces finite metrics (integration of the device-resident loop)."""
    monkeypatch.setenv("SPCCT_DEVICE_DATA", "1")
    from spcct_tpu.train.driver import fit
    res = fit("PlainCore_UNet", 7, max_epochs=1,
              log_root=tmp_path / "logs", ckpt_root=tmp_path / "ck",
              run_test=False)
    assert np.isfinite(res["val_macro_dice"])


def test_scan_epoch_matches_per_step(tmp_path, monkeypatch):
    """SPCCT_SCAN_EPOCH=1 (one-dispatch compiled epoch) must follow the same
    training trajectory as the per-step device path (identical param stream;
    scan-vs-loop compilation reorders float reductions, so the match is
    approximate, not bitwise)."""
    from spcct_tpu.train.driver import fit

    monkeypatch.setenv("SPCCT_DEVICE_DATA", "1")
    r1 = fit("PlainCore_UNet", 11, max_epochs=1, log_root=tmp_path / "a",
             ckpt_root=tmp_path / "cka", run_test=False)
    monkeypatch.setenv("SPCCT_SCAN_EPOCH", "1")
    r2 = fit("PlainCore_UNet", 11, max_epochs=1, log_root=tmp_path / "b",
             ckpt_root=tmp_path / "ckb", run_test=False)
    assert np.isfinite(r2["val_macro_dice"])
    np.testing.assert_allclose(r1["val_macro_dice"], r2["val_macro_dice"],
                               rtol=1e-2, atol=1e-3)
