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


def test_scan_epoch_matches_per_step():
    """make_scan_epoch (one-dispatch compiled epoch) must follow the same
    training trajectory as the per-step device path given the identical
    (idx, aug-param) stream. Structural check: compare the full param tree
    leaf-by-leaf after K steps, not a post-fit dice scalar — the old
    fit-level scalar assertion at rtol 1e-2 was inherently near-threshold
    and flaked under full-suite load (VERDICT r3 weak #7 / task 7).

    Uses SGD, not the recipe's Adam: bias-corrected Adam's first steps are
    ~lr*sign(g), so scan-vs-loop reduction-order noise flips the sign of
    near-zero grads and elementwise closeness cannot hold. With SGD the
    trajectory difference is pure accumulation-order noise, so a tight
    tolerance is valid — and the scan wiring under test (idx/param
    threading, carry order, aug replay) is optimizer-independent."""
    import jax
    import optax

    from spcct_tpu.metrics import MetricAccum, metric_names
    from spcct_tpu.models.recipes import get_recipe
    from spcct_tpu.train.loop import create_state, make_scan_epoch, make_steps

    di, dl, _, _ = _mk(F=5, H=32, W=32, n=4, seed=9)
    recipe = get_recipe("PlainCore_UNet")
    aug = TrainGridAug()
    rng = np.random.default_rng(11)
    K, B = 3, 2
    idxs = rng.integers(0, 4, (K, B)).astype(np.int32)
    # per step: B per-sample param sets stacked to (B, ...); then the scan
    # stream stacks steps to (S, B, ...) exactly as driver.py:226-233 does
    per_step = []
    for s in range(K):
        ps = [draw_params(aug, 32, 32, gs=4, rng=rng, noise_seed=s * B + b)
              for b in range(B)]
        per_step.append({k: np.stack([p[k] for p in ps]) for k in ps[0]})
    stacked = {k: np.stack([p[k] for p in per_step]) for k in per_step[0]}

    opt = optax.sgd(5e-2)

    def fresh():
        x0, _ = device_batch(di, dl, idxs[0], per_step[0])
        state, _ = create_state(recipe, jax.random.PRNGKey(0), x0, K, 1)
        tree = state.tree()
        tree["opt_state"] = opt.init(tree["params"])
        acc = MetricAccum.zeros(len(metric_names("x")))
        return tree, acc

    # path A: per-step jitted train_step
    tree_a, acc_a = fresh()
    train_step, _ = make_steps(recipe, opt)
    for s in range(K):
        x, y = device_batch(di, dl, idxs[s], per_step[s])
        tree_a, acc_a = train_step(tree_a, acc_a, x, y)

    # path B: one lax.scan epoch over the same stream
    tree_b, acc_b = fresh()
    train_epoch = make_scan_epoch(recipe, opt)
    tree_b, acc_b = train_epoch(tree_b, acc_b, di, dl, idxs, stacked)

    leaves_a, treedef_a = jax.tree.flatten(tree_a["params"])
    leaves_b, treedef_b = jax.tree.flatten(tree_b["params"])
    assert treedef_a == treedef_b
    # Noise floor: XLA-CPU threaded reductions are not run-to-run
    # deterministic (measured max-abs 4e-6 solo, 7e-5 with warm caches /
    # under load — the round-3 suite-flake mechanism). A wiring bug shows
    # as ~5e-3 (the SGD update magnitude) on most elements, so a pure
    # absolute band an order of magnitude below that is decisive and
    # load-robust. No rtol: near-zero params make relative noise unbounded.
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=0, atol=5e-4)
