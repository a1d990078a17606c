# viz.py — training-time visualization callback.
#
# Rebuild of reference VisualizeEveryNEpochsBuffered (train.py:881-1165):
# every VIZ_EVERY epochs, render for the first validation batch a 5-panel
# overlay — original center slice / GT / center-slice prediction /
# max-intensity-projection prediction / probability-weighted overlay — plus a
# frames montage (which shows the grid-shuffle stamp when present,
# train.py:976). PNGs are written atomically (tmp + rename, train.py:1157).
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ..config import label_colors


def _color_mask(mask: np.ndarray) -> np.ndarray:
    out = np.zeros((*mask.shape, 3), np.uint8)
    for cls, color in label_colors.items():
        out[mask == cls] = color
    return out


def _save_atomic(fig, path: Path):
    tmp = path.with_suffix(".tmp.png")
    fig.savefig(tmp, dpi=120, bbox_inches="tight")
    os.replace(tmp, path)


def viz_epoch(recipe, tree, dm, epoch: int, out_root):
    """viz_hook signature expected by train.driver.fit."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    out_dir = Path(out_root) / "viz"
    out_dir.mkdir(parents=True, exist_ok=True)
    x, y = next(iter(dm.val_batches(prefetch=False)))
    forward = recipe.wrap_forward(recipe.apply_fn())
    variables = {"params": tree["params"]}
    if tree.get("batch_stats") is not None:
        variables["batch_stats"] = tree["batch_stats"]
    logits, _ = forward(variables, jnp.asarray(x), train=False, mutable=False)
    lg = np.asarray(logits)[0]                       # (F,H,W,C)
    img = np.asarray(x)[0, ..., 0]                   # (F,H,W)
    gt = np.asarray(y)[0]                            # (F,H,W)
    center = img.shape[0] // 2

    probs = np.exp(lg - lg.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    pred = probs.argmax(-1)                          # (F,H,W)
    mip = probs.max(axis=0).argmax(-1)               # max over depth → argmax
    conf = probs.max(-1)[center]

    fig, axes = plt.subplots(1, 5, figsize=(16, 3.5))
    titles = ["Original", "GT", "Pred (center)", "Pred (MIP)", "Prob overlay"]
    axes[0].imshow(img[center], cmap="gray")
    axes[1].imshow(img[center], cmap="gray")
    axes[1].imshow(_color_mask(gt[center]), alpha=0.5)
    axes[2].imshow(img[center], cmap="gray")
    axes[2].imshow(_color_mask(pred[center]), alpha=0.5)
    axes[3].imshow(img[center], cmap="gray")
    axes[3].imshow(_color_mask(mip), alpha=0.5)
    axes[4].imshow(img[center], cmap="gray")
    axes[4].imshow(_color_mask(pred[center]), alpha=(0.5 * conf))
    for ax, t in zip(axes, titles):
        ax.set_title(t, fontsize=9)
        ax.axis("off")
    _save_atomic(fig, out_dir / f"val_epoch{epoch:03d}_overlay.png")
    plt.close(fig)

    # frames montage (shows grid-shuffle stamp if present)
    F = img.shape[0]
    fig, axes = plt.subplots(1, F, figsize=(2.6 * F, 3))
    for f in range(F):
        axes[f].imshow(img[f], cmap="gray")
        axes[f].set_title(f"frame {f}", fontsize=8)
        axes[f].axis("off")
    _save_atomic(fig, out_dir / f"val_epoch{epoch:03d}_frames.png")
    plt.close(fig)

    # per-class softmax heatmaps on the center slice
    # (reference _plot_softmax_per_class, helpers.py:369-408)
    from ..config import NUM_CLASSES, global_label_names
    ncol = NUM_CLASSES + 1
    fig, axes = plt.subplots(1, ncol, figsize=(2.2 * ncol, 2.6))
    axes[0].imshow(img[center], cmap="gray")
    axes[0].set_title("Input", fontsize=7)
    for c in range(NUM_CLASSES):
        ax = axes[c + 1]
        ax.imshow(img[center], cmap="gray")
        color = np.asarray(label_colors.get(c, (255, 255, 255))) / 255.0
        overlay = np.ones(probs[center, :, :, c].shape + (3,)) * color
        ax.imshow(overlay, alpha=np.clip(probs[center, :, :, c], 0, 1))
        ax.set_title(global_label_names.get(c, str(c)), fontsize=7)
    for ax in axes:
        ax.axis("off")
    _save_atomic(fig, out_dir / f"val_epoch{epoch:03d}_softmax.png")
    plt.close(fig)

    # grid-shuffle vs no-grid comparison (reference on_train_epoch_end,
    # helpers.py:557-613): one augmented train batch vs the identity val batch
    try:
        xg, yg = next(iter(dm.train_batches(seed=epoch, epoch=epoch,
                                            prefetch=False)))
        logits_g, _ = forward(variables, jnp.asarray(xg), train=False,
                              mutable=False)
        lgg = np.asarray(logits_g)[0]
        pred_g = lgg.argmax(-1)
        img_g = np.asarray(xg)[0, ..., 0]
        gt_g = np.asarray(yg)[0]
        cg = img_g.shape[0] // 2
        fig, axes = plt.subplots(2, 3, figsize=(10, 6.5))
        rows = [("no grid", img[center], gt[center], pred[center]),
                ("grid shuffle", img_g[cg], gt_g[cg], pred_g[cg])]
        for r, (tag, im0, g0, p0) in enumerate(rows):
            axes[r, 0].imshow(im0, cmap="gray")
            axes[r, 0].set_title(f"Input ({tag})", fontsize=8)
            axes[r, 1].imshow(im0, cmap="gray")
            axes[r, 1].imshow(_color_mask(np.where(g0 == 255, 0, g0)), alpha=0.5)
            axes[r, 1].set_title(f"GT ({tag})", fontsize=8)
            axes[r, 2].imshow(im0, cmap="gray")
            axes[r, 2].imshow(_color_mask(p0), alpha=0.5)
            axes[r, 2].set_title(f"Pred ({tag})", fontsize=8)
        for ax in axes.ravel():
            ax.axis("off")
        _save_atomic(fig, out_dir / f"train_epoch{epoch:03d}_compare.png")
        plt.close(fig)
    except Exception as e:  # viz must never kill training
        print(f"[viz] compare panel skipped: {e}")
