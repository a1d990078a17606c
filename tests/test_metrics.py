# Metric parity tests: confusion counts + Option-3 NaN rules vs a torch oracle
# porting reference per_class_metrics_3d (innovative3D/helpers.py:668-725).
import numpy as np
import pytest

import jax.numpy as jnp

from spcct_tpu.metrics import (
    MetricAccum,
    confusion_counts,
    metric_vector,
    metric_names,
    metrics_from_counts,
    step_metric_values,
)

torch = pytest.importorskip("torch")

C = 6
IGN = 255


def _oracle(preds_logits, labels, num_classes, smooth=1e-6, ignore_index=IGN):
    """Direct port of reference helpers.py:668-725 as test oracle."""
    preds = torch.argmax(preds_logits, dim=1)
    mask = labels != ignore_index
    dice_list, sens_list, spec_list = [], [], []
    for c in range(num_classes):
        pred_c = (preds == c) & mask
        label_c = (labels == c) & mask
        tp = (pred_c & label_c).sum().item()
        fp = (pred_c & (~label_c)).sum().item()
        fn = ((~pred_c) & label_c).sum().item()
        tn = ((~pred_c) & (~label_c)).sum().item()
        gt_present = label_c.sum().item() > 0
        if (not gt_present) and (fp == 0):
            dice = float("nan"); sens = float("nan")
        else:
            dice = (2 * tp + smooth) / (2 * tp + fp + fn + smooth)
            sens = (tp + smooth) / (tp + fn + smooth) if (tp + fn) > 0 else float("nan")
        spec = (tn + smooth) / (tn + fp + smooth) if (tn + fp) > 0 else float("nan")
        dice_list.append(dice); sens_list.append(sens); spec_list.append(spec)
    macro_dice = float(np.nanmean(dice_list[1:]))
    tp_sum = sum((((preds == c) & (labels == c) & mask).sum().item()) for c in range(1, num_classes))
    fp_sum = sum((((preds == c) & (labels != c) & mask).sum().item()) for c in range(1, num_classes))
    fn_sum = sum((((preds != c) & (labels == c) & mask).sum().item()) for c in range(1, num_classes))
    tn_sum = (((preds == 0) & (labels == 0) & mask).sum().item())
    micro_dice = (2 * tp_sum + smooth) / (2 * tp_sum + fp_sum + fn_sum + smooth) \
        if (2 * tp_sum + fp_sum + fn_sum) > 0 else float("nan")
    return dice_list, sens_list, spec_list, macro_dice, micro_dice, tn_sum


def _case(seed=0, absent_class=None, predicted_absent=False):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((2, 3, 8, 8, C)).astype(np.float32)
    labels = rng.integers(0, C, (2, 3, 8, 8)).astype(np.int64)
    labels[0, 0, :2, :2] = IGN
    if absent_class is not None:
        labels[labels == absent_class] = 0
        if not predicted_absent:
            logits[..., absent_class] = -100.0  # never predicted either
    return logits, labels


@pytest.mark.parametrize("absent,pred_absent", [(None, False), (3, False), (3, True)])
def test_metrics_match_reference_oracle(absent, pred_absent):
    logits, labels = _case(1, absent, pred_absent)
    lt = torch.from_numpy(np.moveaxis(logits, -1, 1))
    yt = torch.from_numpy(labels)
    o_dice, o_sens, o_spec, o_macro, o_micro, o_tn = _oracle(lt, yt, C)

    counts = np.asarray(confusion_counts(jnp.asarray(logits), jnp.asarray(labels), C, IGN))
    m = metrics_from_counts(counts)
    np.testing.assert_allclose(m["dice"], o_dice, atol=1e-9, equal_nan=True)
    np.testing.assert_allclose(m["sens"], o_sens, atol=1e-9, equal_nan=True)
    np.testing.assert_allclose(m["spec"], o_spec, atol=1e-9, equal_nan=True)
    assert np.isclose(m["macro_dice"], o_macro, equal_nan=True)
    assert np.isclose(m["micro_dice"], o_micro, equal_nan=True)

    # device-side variant agrees with host-side variant
    dice, sens, spec, macro, micro = step_metric_values(
        jnp.asarray(logits), jnp.asarray(labels), C, IGN)
    np.testing.assert_allclose(np.asarray(dice), m["dice"], atol=1e-5, equal_nan=True)
    np.testing.assert_allclose(float(macro[0]), m["macro_dice"], atol=1e-5)


def test_tn_includes_ignored_voxels_quirk():
    # reference quirk: per-class tn counts ignored voxels as negatives
    logits, labels = _case(2)
    lt = torch.from_numpy(np.moveaxis(logits, -1, 1))
    yt = torch.from_numpy(labels)
    counts = np.asarray(confusion_counts(jnp.asarray(logits), jnp.asarray(labels), C, IGN))
    preds = torch.argmax(lt, dim=1)
    mask = yt != IGN
    for c in range(C):
        pred_c = (preds == c) & mask
        label_c = (yt == c) & mask
        tn = ((~pred_c) & (~label_c)).sum().item()
        assert counts[c, 3] == tn


def test_metric_accum_nanmean():
    acc = MetricAccum.zeros(3)
    acc = acc.update(jnp.asarray([1.0, jnp.nan, 2.0]))
    acc = acc.update(jnp.asarray([3.0, jnp.nan, jnp.nan]))
    out = np.asarray(acc.result())
    assert out[0] == 2.0
    assert np.isnan(out[1])
    assert out[2] == 2.0


def test_metric_vector_layout():
    logits, labels = _case(3)
    mv = metric_vector(jnp.asarray(0.5), jnp.asarray(logits), jnp.asarray(labels), C, IGN)
    names = metric_names("t", C)
    assert mv.shape == (len(names),)
    assert names[0] == "t_loss" and float(mv[0]) == 0.5
