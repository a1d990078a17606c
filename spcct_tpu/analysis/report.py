# report.py — post-hoc analysis: heatmaps, Bland–Altman plots, overlays.
#
# Rebuild of reference test.py (810 LoC): checkpoint discovery
# (test.py:98-111), label canonicalization + HA/Iodine group inference
# (test.py:132-163), absent-GT artifact cleaning (test.py:185-203),
# per-class mean±std heatmaps across seeds (test.py:208-355), slice-wise
# Bland–Altman group plots (test.py:360-486), and qualitative overlays that
# run the SAME test batches through every variant's best checkpoint
# (test.py:581-744).
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..config import (
    CHECKPOINT_DIR,
    NUM_CLASSES,
    NUM_FRAMES,
    SEEDS,
    global_label_names,
    label_colors,
)

HA_RE = re.compile(r"^HA\d+")
IODINE_RE = re.compile(r"^I\d+")


def class_groups() -> Dict[str, List[int]]:
    """HA vs Iodine groups inferred by name regex (test.py:132-163)."""
    ha, iod = [], []
    for idx, name in global_label_names.items():
        if HA_RE.match(name):
            ha.append(idx)
        elif IODINE_RE.match(name):
            iod.append(idx)
    return {"HA": ha, "Iodine": iod}


def clean_absent_gt_artifacts(df):
    """Old runs wrote dice=sens=spec=1.0 for absent-GT classes; mask to NaN
    (test.py:185-203). Detect via tp+fn==0 when counts exist, else the
    all-exactly-1.0 signature."""
    df = df.copy()
    metrics = [c for c in ("dice", "sensitivity", "specificity") if c in df]
    if {"tp", "fn", "fp"} <= set(df.columns):
        absent = (df["tp"] + df["fn"] == 0) & (df["fp"] == 0)
    else:
        absent = np.ones(len(df), bool)
        for m in metrics:
            absent &= df[m] == 1.0
    for m in metrics:
        df.loc[absent, m] = np.nan
    return df


def per_class_heatmaps(ckpt_root, models: List[str], seeds: List[int],
                       out_dir, metrics=("dice", "sensitivity", "specificity",
                                         "precision", "iou")):
    """mean±std across seeds per (model, class) → one heatmap PNG per metric
    (test.py:208-355)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd
    from .stats import collect_details

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = collect_details(ckpt_root, models, seeds)
    if df is None:
        print("[report] no test_details.csv found; skipping heatmaps")
        return
    df = clean_absent_gt_artifacts(df)
    class_names = [global_label_names[i] for i in range(NUM_CLASSES)]
    for metric in metrics:
        if metric not in df:
            continue
        mean = df.pivot_table(index="model", columns="class", values=metric,
                              aggfunc="mean")
        std = df.pivot_table(index="model", columns="class", values=metric,
                             aggfunc="std")
        mean = mean.reindex(models)
        std = std.reindex(models).reindex(columns=mean.columns)
        fig, ax = plt.subplots(figsize=(1.0 * NUM_CLASSES, 0.6 * len(models) + 2))
        im = ax.imshow(mean.to_numpy(), vmin=0, vmax=1, cmap="viridis",
                       aspect="auto")
        ax.set_xticks(range(len(mean.columns)),
                      [class_names[int(c)] for c in mean.columns], rotation=45,
                      ha="right", fontsize=7)
        ax.set_yticks(range(len(mean.index)), mean.index, fontsize=8)
        for i in range(mean.shape[0]):
            for j in range(mean.shape[1]):
                m = mean.iloc[i, j]
                s = std.iloc[i, j]
                if np.isfinite(m):
                    stxt = f"±{s:.2f}" if np.isfinite(s) else ""
                    ax.text(j, i, f"{m:.2f}\n{stxt}",
                            ha="center", va="center", fontsize=6,
                            color="white" if m < 0.6 else "black")
        ax.set_title(f"{metric} (mean±std over seeds)")
        fig.colorbar(im, ax=ax, shrink=0.7)
        fig.tight_layout()
        fig.savefig(out_dir / f"heatmap_{metric}.png", dpi=130)
        plt.close(fig)
        print(f"[report] wrote heatmap_{metric}.png")


def bland_altman_group_per_model(ckpt_root, models: List[str], seeds: List[int],
                                 group: str, out_dir):
    """Slice-wise 1−mean(dice) per model for one material group with
    mean±1.96σ lines (test.py:360-486)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from .stats import collect_details

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    classes = class_groups()[group]
    df = collect_details(ckpt_root, models, seeds)
    if df is None:
        return
    df = clean_absent_gt_artifacts(df)
    df = df[df["class"].isin(classes)]
    n = len(models)
    ncol = min(3, n)
    nrow = (n + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=(4 * ncol, 3 * nrow),
                             squeeze=False)
    for k, model in enumerate(models):
        ax = axes[k // ncol][k % ncol]
        sub = df[df["model"] == model]
        per_slice = sub.groupby(["seed", "case"])["dice"].mean()
        errs = (1.0 - per_slice).to_numpy(float)
        errs = errs[np.isfinite(errs)]
        xs = np.arange(len(errs))  # global slice index across seeds
        ax.scatter(xs, errs, s=8)
        if len(errs):
            mu, sd = float(np.mean(errs)), float(np.std(errs))
            for yv, style in [(mu, "-"), (mu + 1.96 * sd, "--"),
                              (mu - 1.96 * sd, "--")]:
                ax.axhline(yv, color="r", ls=style, lw=0.8)
        ax.set_title(model, fontsize=9)
        ax.set_xlabel("slice")
        ax.set_ylabel(f"1 - mean Dice ({group})")
    for k in range(n, nrow * ncol):
        axes[k // ncol][k % ncol].axis("off")
    fig.tight_layout()
    fig.savefig(out_dir / f"bland_altman_{group}.png", dpi=130)
    plt.close(fig)
    print(f"[report] wrote bland_altman_{group}.png")


def _color_mask(mask: np.ndarray) -> np.ndarray:
    out = np.zeros((*mask.shape, 3), np.uint8)
    for cls, color in label_colors.items():
        out[mask == cls] = color
    return out


def qualitative_overlays(ckpt_root, models: List[str], out_dir,
                         max_batches: int = 2):
    """Rebuild every variant, load its best (else last) checkpoint, run the
    SAME test batches through all of them, and render
    Input/GT/per-model-prediction panels (test.py:581-744). 3D predictions
    are summarized per reference: per-slice softmax → max over depth →
    argmax (test.py:666-672)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax
    import jax.numpy as jnp
    from ..config import trainval_sets
    from ..data.pipeline import SpcctDataModule3D
    from ..models.recipes import get_recipe
    from ..train.checkpoint import CheckpointManager, seed_dir

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    dm = SpcctDataModule3D(trainval_sets, batch_size=1, num_frames=NUM_FRAMES)
    dm.setup("test")

    loaded = []
    for model in models:
        recipe = get_recipe(model)
        found = None
        for seed in SEEDS:
            mgr = CheckpointManager(seed_dir(ckpt_root, model, seed))
            kind = "best" if mgr.has("best") else ("last" if mgr.has("last") else None)
            if kind:
                found = (recipe, mgr, kind)
                break
        if found is None:
            print(f"[report] no checkpoint for {model}; skipping in overlays")
            continue
        recipe, mgr, kind = found
        x0 = jnp.zeros((1, NUM_FRAMES) + dm.test_set.images[0].shape[-2:] + (1,),
                       jnp.float32)
        template = recipe.init(jax.random.PRNGKey(0), x0)
        tree = {"params": template["params"],
                "opt_state": None, "batch_stats": template.get("batch_stats")}
        try:
            restored, _ = mgr.restore(kind, {"params": tree["params"],
                                             "batch_stats": tree["batch_stats"]})
        except Exception:
            # prefix-realignment equivalent: restore params subtree only
            restored, _ = mgr.restore(kind, {"params": tree["params"],
                                             "opt_state": None,
                                             "batch_stats": tree["batch_stats"]})
        forward = recipe.wrap_forward(recipe.apply_fn())
        loaded.append((model, restored, forward))

    if not loaded:
        print("[report] no checkpoints found; skipping overlays")
        return

    for bi, (x, y) in enumerate(dm.test_batches(prefetch=False)):
        if bi >= max_batches:
            break
        img = np.asarray(x)[0, ..., 0]       # (F,H,W)
        gt = np.asarray(y)[0]                # (F,H,W)
        center = img.shape[0] // 2
        panels = [("Input", img[center], None), ("GT", img[center], gt[center])]
        for model, restored, forward in loaded:
            variables = {"params": restored["params"]}
            if restored.get("batch_stats") is not None:
                variables["batch_stats"] = restored["batch_stats"]
            logits, _ = forward(variables, jnp.asarray(x), train=False, mutable=False)
            lg = np.asarray(logits)[0]        # (F,H,W,C)
            probs = np.exp(lg - lg.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            summary = probs.max(axis=0).argmax(-1)   # max over depth → argmax
            panels.append((model, img[center], summary))
        ncol = len(panels)
        fig, axes = plt.subplots(1, ncol, figsize=(3 * ncol, 3.4))
        for ax, (title, base, mask) in zip(axes, panels):
            ax.imshow(base, cmap="gray")
            if mask is not None:
                ax.imshow(_color_mask(mask), alpha=0.5)
            ax.set_title(title, fontsize=8)
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(out_dir / f"overlay_batch{bi}.png", dpi=130)
        plt.close(fig)
        print(f"[report] wrote overlay_batch{bi}.png")


def main():
    from ..models.recipes import VARIANT_NAMES

    ckpt_root = CHECKPOINT_DIR
    out_dir = Path(os.getenv("ANALYSIS_DIR", "analysis_plots"))
    models = VARIANT_NAMES
    seeds = SEEDS
    per_class_heatmaps(ckpt_root, models, seeds, out_dir)
    bland_altman_group_per_model(ckpt_root, models, seeds, "HA", out_dir)
    bland_altman_group_per_model(ckpt_root, models, seeds, "Iodine", out_dir)
    if os.getenv("DO_QUAL_VIZ", "1") == "1":
        qualitative_overlays(ckpt_root, models, out_dir)
