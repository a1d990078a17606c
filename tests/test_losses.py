# Loss parity tests against torch oracles implementing the reference formulas
# (innovative3D/helpers.py:782-803, models.py:227-302, 1206-1270).
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import spcct_tpu.losses as L

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

C = 5
IGN = 255


def _batch(seed=0, shape=(2, 3, 8, 8)):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal(shape + (C,)).astype(np.float32)
    labels = rng.integers(0, C, shape).astype(np.int64)
    labels[0, 0, 0, :3] = IGN
    return logits, labels


def _to_torch(logits, labels):
    lt = torch.from_numpy(np.moveaxis(logits, -1, 1))  # (B,C,D,H,W)
    yt = torch.from_numpy(labels)
    return lt, yt


def test_cross_entropy_matches_torch():
    logits, labels = _batch()
    got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), IGN))
    lt, yt = _to_torch(logits, labels)
    want = float(F.cross_entropy(lt, yt, ignore_index=IGN))
    assert abs(got - want) < 1e-5


def test_weighted_ce_matches_torch_reference_formula():
    # reference models.py:779-799: weighted CE normalized by valid count
    logits, labels = _batch(1)
    w = np.linspace(0.5, 2.0, C).astype(np.float32)
    got = float(L.weighted_softmax_ce(jnp.asarray(logits), jnp.asarray(labels),
                                      IGN, class_weights=jnp.asarray(w)))
    lt, yt = _to_torch(logits, labels)
    ce = F.cross_entropy(lt, yt, weight=torch.from_numpy(w),
                         ignore_index=IGN, reduction="none")
    valid = (yt != IGN).float()
    want = float((ce * valid).sum() / valid.sum().clamp_min(1.0))
    assert abs(got - want) < 1e-5


def _hard_macro_dice_torch(logits, labels, num_classes, ignore_index=255, smooth=1e-6):
    # oracle porting reference helpers.py:782-795
    preds = torch.argmax(logits, dim=1)
    mask = labels != ignore_index
    dice_list = []
    for c in range(1, num_classes):
        pred_c = (preds == c) & mask
        label_c = (labels == c) & mask
        tp = (pred_c & label_c).sum().item()
        fp = (pred_c & (~label_c)).sum().item()
        fn = ((~pred_c) & label_c).sum().item()
        dice_list.append((2 * tp + smooth) / (2 * tp + fp + fn + smooth))
    return 1.0 - float(np.mean(dice_list))


def test_ce_plus_macro_dice_matches_reference():
    logits, labels = _batch(2)
    got = float(L.ce_plus_macro_dice_loss(jnp.asarray(logits), jnp.asarray(labels), C, IGN))
    lt, yt = _to_torch(logits, labels)
    want = float(F.cross_entropy(lt, yt, ignore_index=IGN)) + \
        0.5 * _hard_macro_dice_torch(lt, yt, C, IGN)
    assert abs(got - want) < 1e-5


def test_hard_dice_term_carries_no_gradient():
    # quirk #1: gradient flows only through CE
    logits, labels = _batch(3)
    x = jnp.asarray(logits)
    y = jnp.asarray(labels)
    g_full = jax.grad(lambda z: L.ce_plus_macro_dice_loss(z, y, C, IGN))(x)
    g_ce = jax.grad(lambda z: L.cross_entropy(z, y, IGN))(x)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_ce), atol=1e-6)


def test_soft_dice_mode_carries_gradient():
    # SPCCT_SOFT_DICE=1 opt-in (quirk #1 fix): the dice term becomes
    # differentiable, so the full-loss gradient differs from CE-only
    logits, labels = _batch(8)
    x, y = jnp.asarray(logits), jnp.asarray(labels)
    g_soft = jax.grad(lambda z: L.ce_plus_macro_dice_loss(z, y, C, IGN,
                                                          soft_dice=True))(x)
    g_ce = jax.grad(lambda z: L.cross_entropy(z, y, IGN))(x)
    assert float(jnp.abs(g_soft - g_ce).max()) > 1e-6


def test_soft_dice_squared_denominator_matches_torch():
    # oracle: reference models.py:254-275
    logits, labels = _batch(4)
    got = float(L.soft_dice_loss_from_logits(jnp.asarray(logits), jnp.asarray(labels),
                                             C, IGN, False, 1e-5))
    lt, yt = _to_torch(logits, labels)
    valid = (yt != IGN).unsqueeze(1).float()
    probs = torch.softmax(lt, dim=1) * valid
    safe = yt.clone(); safe[safe == IGN] = 0
    tgt = F.one_hot(safe, C).permute(0, 4, 1, 2, 3).float() * valid
    p, t = probs[:, 1:], tgt[:, 1:]
    dims = (0, 2, 3, 4)
    inter = (p * t).sum(dims)
    den = (p * p).sum(dims) + (t * t).sum(dims)
    want = float(1.0 - ((2 * inter + 1e-5) / (den + 1e-5)).mean())
    assert abs(got - want) < 1e-5


def test_r2u_loss_empty_fg_batch_returns_zero_no_grad():
    # reference models.py:1232-1234/1269-1270: all-background batch → 0 loss
    logits = np.random.default_rng(0).standard_normal((2, 3, 4, 4, C)).astype(np.float32)
    labels = np.zeros((2, 3, 4, 4), np.int64)
    loss, dice = L.r2u_dice_only_loss(jnp.asarray(logits), jnp.asarray(labels), IGN)
    assert float(loss) == 0.0 and float(dice) == 0.0
    g = jax.grad(lambda z: L.r2u_dice_only_loss(z, jnp.asarray(labels), IGN)[0])(
        jnp.asarray(logits))
    assert float(jnp.abs(g).max()) == 0.0


def test_r2u_loss_skips_empty_fg_samples():
    logits, labels = _batch(5)
    labels[1] = 0  # second sample: no foreground
    got, _ = L.r2u_dice_only_loss(jnp.asarray(logits), jnp.asarray(labels), IGN)
    # oracle: only sample 0 contributes (reference models.py:1259-1268)
    got_single, _ = L.r2u_dice_only_loss(jnp.asarray(logits[:1]), jnp.asarray(labels[:1]), IGN)
    assert abs(float(got) - float(got_single)) < 1e-6


def test_transformer_loss_blend():
    logits, labels = _batch(6)
    lj, yj = jnp.asarray(logits), jnp.asarray(labels)
    full = float(L.transformer_dice_ce_loss(lj, yj, C, IGN, ce_weight=0.5))
    dice = float(L.per_sample_dice_loss(lj, yj, C, IGN, include_bg=False))
    ce = float(L.cross_entropy(lj, yj, IGN))
    assert abs(full - (0.5 * dice + 0.5 * ce)) < 1e-6


def test_focal_plus_gradient_runs_and_is_finite():
    logits, labels = _batch(7)
    v = float(L.focal_plus_gradient_loss(jnp.asarray(logits), jnp.asarray(labels), C, IGN))
    assert np.isfinite(v) and v > 0
