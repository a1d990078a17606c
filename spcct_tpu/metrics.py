# metrics.py — per-class dice/sensitivity/specificity with on-device accumulation.
#
# TPU-native rebuild of reference per_class_metrics_3d/2d
# (reference helpers.py:668-779). The reference computes 13 classes x 4 counts
# with `.item()` per count — a device→host sync on EVERY training step
# (SURVEY.md §8 quirk #8). Here the confusion matrix is a single (C, 4)
# on-device array produced by one fused pass (argmax + bincount over the joint
# (pred, label) histogram); "Option-3" NaN rules are applied functionally.
#
# Faithfully reproduced reference semantics, including its quirks:
#   * per-class TN counts IGNORED voxels as negatives (the reference masks
#     pred_c/label_c but computes tn = ~pred_c & ~label_c over all voxels —
#     helpers.py:684-690);
#   * micro TN is only the (pred==BG & label==BG & valid) count
#     (helpers.py:716);
#   * Option-3: class absent in GT and never predicted → dice/sens = NaN,
#     skipped by nanmean (helpers.py:692-699);
#   * macro = nanmean over FOREGROUND classes only (helpers.py:708-710).
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import IGNORE_INDEX, NUM_CLASSES

SMOOTH = 1e-6


def joint_histogram(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int = NUM_CLASSES,
    ignore_index: Optional[int] = IGNORE_INDEX,
) -> jnp.ndarray:
    """(C, C) [pred, label] count matrix over valid voxels, as one MXU matmul.

    TPU note: the obvious bincount/scatter-add formulation serializes on the
    scalar unit (~11 ms per step on 1.3M-voxel volumes); one-hot(preds)^T @
    one-hot(labels) is a (C, N) x (N, C) matmul the MXU eats in <1 ms.
    Counts stay exact: 0/1 bf16 operands, f32 accumulation (< 2^24 voxels).
    """
    preds = preds.reshape(-1).astype(jnp.int32)
    labels = labels.reshape(-1).astype(jnp.int32)
    valid = _mask(labels, ignore_index)
    cls = jax.lax.broadcasted_iota(jnp.int32, (preds.shape[0], num_classes), 1)
    pm = ((preds[:, None] == cls) & valid[:, None]).astype(jnp.bfloat16)
    lm = ((jnp.where(valid, labels, -1)[:, None] == cls)).astype(jnp.bfloat16)
    hist = jax.lax.dot_general(
        pm, lm, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return hist


def confusion_counts(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int = NUM_CLASSES,
    ignore_index: Optional[int] = IGNORE_INDEX,
) -> jnp.ndarray:
    """(C, 4) int32 array of [tp, fp, fn, tn] per class, on device.

    logits: (..., C) channel-last; labels: (...) int. Derived from one joint
    (pred, label) histogram; tn follows from the total voxel count
    (reference-faithful: tn includes ignored voxels — helpers.py:684-690).
    """
    preds = jnp.argmax(logits, axis=-1)
    return counts_from_histogram(
        joint_histogram(preds, labels, num_classes, ignore_index), labels.size
    )


def counts_from_histogram(hist: jnp.ndarray, total_voxels: int) -> jnp.ndarray:
    tp = jnp.diagonal(hist)
    pred_count = jnp.sum(hist, axis=1)   # (preds == c) & valid
    label_count = jnp.sum(hist, axis=0)  # (labels == c) & valid
    fp = pred_count - tp
    fn = label_count - tp
    tn = total_voxels - tp - fp - fn     # includes ignored voxels (reference quirk)
    return jnp.stack([tp, fp, fn, tn], axis=1).astype(jnp.int32)


def _mask(labels: jnp.ndarray, ignore_index: Optional[int]) -> jnp.ndarray:
    if ignore_index is None:
        return jnp.ones(labels.shape, dtype=bool)
    return labels != ignore_index


def metrics_from_counts(counts, smooth: float = SMOOTH) -> Dict[str, np.ndarray]:
    """Apply the reference's Option-3 rules to a (C, 4) count array.

    Host-side (numpy) — called once per step-result or per epoch, never in the
    hot loop. Returns per-class vectors and macro/micro scalars with NaN
    semantics identical to helpers.py:692-725.
    """
    counts = np.asarray(counts, dtype=np.float64)
    tp, fp, fn, tn = counts[:, 0], counts[:, 1], counts[:, 2], counts[:, 3]
    gt_present = (tp + fn) > 0

    dice = (2 * tp + smooth) / (2 * tp + fp + fn + smooth)
    sens = np.where((tp + fn) > 0, (tp + smooth) / (tp + fn + smooth), np.nan)
    spec = np.where((tn + fp) > 0, (tn + smooth) / (tn + fp + smooth), np.nan)
    absent_skip = (~gt_present) & (fp == 0)
    dice = np.where(absent_skip, np.nan, dice)
    sens = np.where(absent_skip, np.nan, sens)

    def _nanmean_fg(v):
        return float(np.nanmean(v[1:])) if len(v) > 1 else float("nan")

    macro_dice, macro_sens, macro_spec = map(_nanmean_fg, (dice, sens, spec))

    tp_sum = float(np.sum(tp[1:]))
    fp_sum = float(np.sum(fp[1:]))
    fn_sum = float(np.sum(fn[1:]))
    tn_sum = float(tp[0])  # (pred==BG & label==BG & valid): joint-hist diagonal of BG

    denom_dice = 2 * tp_sum + fp_sum + fn_sum
    micro_dice = (2 * tp_sum + smooth) / (denom_dice + smooth) if denom_dice > 0 else float("nan")
    micro_sens = (tp_sum + smooth) / (tp_sum + fn_sum + smooth) if (tp_sum + fn_sum) > 0 else float("nan")
    micro_spec = (tn_sum + smooth) / (tn_sum + fp_sum + smooth) if (tn_sum + fp_sum) > 0 else float("nan")

    return {
        "dice": dice, "sens": sens, "spec": spec,
        "macro_dice": macro_dice, "macro_sens": macro_sens, "macro_spec": macro_spec,
        "micro_dice": micro_dice, "micro_sens": micro_sens, "micro_spec": micro_spec,
    }


def step_metric_values(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int = NUM_CLASSES,
    ignore_index: Optional[int] = IGNORE_INDEX,
    smooth: float = SMOOTH,
):
    """Device-side per-step metric vectors with NaN semantics.

    Returns (dice (C,), sens (C,), spec (C,), macro3 (3,), micro3 (3,)) as
    float32 arrays on device; NaN encodes Option-3 skips. Jit-safe.
    """
    counts = confusion_counts(logits, labels, num_classes, ignore_index).astype(jnp.float32)
    tp, fp, fn, tn = counts[:, 0], counts[:, 1], counts[:, 2], counts[:, 3]
    nan = jnp.float32(jnp.nan)

    dice = (2 * tp + smooth) / (2 * tp + fp + fn + smooth)
    sens = jnp.where((tp + fn) > 0, (tp + smooth) / (tp + fn + smooth), nan)
    spec = jnp.where((tn + fp) > 0, (tn + smooth) / (tn + fp + smooth), nan)
    absent_skip = ((tp + fn) == 0) & (fp == 0)
    dice = jnp.where(absent_skip, nan, dice)
    sens = jnp.where(absent_skip, nan, sens)

    def _nanmean(v):
        finite = jnp.isfinite(v)
        return jnp.where(
            jnp.any(finite),
            jnp.sum(jnp.where(finite, v, 0.0)) / jnp.maximum(jnp.sum(finite), 1),
            nan,
        )

    macro = jnp.stack([_nanmean(dice[1:]), _nanmean(sens[1:]), _nanmean(spec[1:])])

    tp_s, fp_s, fn_s = jnp.sum(tp[1:]), jnp.sum(fp[1:]), jnp.sum(fn[1:])
    tn_s = tp[0]
    micro_dice = jnp.where(
        (2 * tp_s + fp_s + fn_s) > 0, (2 * tp_s + smooth) / (2 * tp_s + fp_s + fn_s + smooth), nan
    )
    micro_sens = jnp.where((tp_s + fn_s) > 0, (tp_s + smooth) / (tp_s + fn_s + smooth), nan)
    micro_spec = jnp.where((tn_s + fp_s) > 0, (tn_s + smooth) / (tn_s + fp_s + smooth), nan)
    micro = jnp.stack([micro_dice, micro_sens, micro_spec])
    return dice, sens, spec, macro, micro


class MetricAccum(NamedTuple):
    """On-device nan-aware running mean over steps.

    The reference logs per-step metric VALUES and Lightning averages them over
    the epoch; we match that (mean of per-step values, NaN steps skipped —
    where Lightning would propagate NaN into the epoch mean, we skip, which is
    strictly more informative and identical whenever no step is NaN).
    """
    sums: jnp.ndarray    # (K,) float32
    counts: jnp.ndarray  # (K,) float32

    @classmethod
    def zeros(cls, k: int) -> "MetricAccum":
        return cls(jnp.zeros((k,), jnp.float32), jnp.zeros((k,), jnp.float32))

    def update(self, values: jnp.ndarray) -> "MetricAccum":
        finite = jnp.isfinite(values)
        return MetricAccum(
            self.sums + jnp.where(finite, values, 0.0),
            self.counts + finite.astype(jnp.float32),
        )

    def result(self) -> jnp.ndarray:
        return jnp.where(self.counts > 0, self.sums / jnp.maximum(self.counts, 1.0), jnp.nan)


# Flat metric vector layout used by the train loop accumulators:
#   [loss, macro_dice, macro_sens, macro_spec, micro_dice, micro_sens,
#    micro_spec, dice_0..C-1, sens_0..C-1, spec_0..C-1]
def metric_vector(loss, logits, labels, num_classes=NUM_CLASSES, ignore_index=IGNORE_INDEX):
    dice, sens, spec, macro, micro = step_metric_values(logits, labels, num_classes, ignore_index)
    return jnp.concatenate([
        jnp.stack([loss.astype(jnp.float32)]), macro, micro, dice, sens, spec
    ])


def metric_names(prefix: str, num_classes: int = NUM_CLASSES):
    names = [
        f"{prefix}_loss",
        f"{prefix}_macro_dice", f"{prefix}_macro_sens", f"{prefix}_macro_spec",
        f"{prefix}_micro_dice", f"{prefix}_micro_sens", f"{prefix}_micro_spec",
    ]
    names += [f"{prefix}_dice_class_{i}" for i in range(num_classes)]
    names += [f"{prefix}_sens_class_{i}" for i in range(num_classes)]
    names += [f"{prefix}_spec_class_{i}" for i in range(num_classes)]
    return names
