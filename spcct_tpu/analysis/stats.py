# stats.py — paired statistical comparison + ablation plots.
#
# Rebuild of reference stats_and_plots.py: summarize_and_test (paired
# per-(case,class) Wilcoxon signed-rank vs a baseline model, effect size r
# from the normal-approximated Z, Benjamini–Hochberg FDR across classes —
# stats_and_plots.py:7-54) and the violin/spaghetti ablation plots
# (stats_and_plots.py:56-106).
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def _load_details(ckpt_root: Path, model: str, seed: int):
    import pandas as pd

    p = Path(ckpt_root) / model / f"seed{seed}" / "test_details.csv"
    if not p.exists():
        return None
    df = pd.read_csv(p)
    df["model"] = model
    df["seed"] = seed
    return df


def collect_details(ckpt_root, models: List[str], seeds: List[int]):
    import pandas as pd

    frames = [d for m in models for s in seeds
              if (d := _load_details(Path(ckpt_root), m, s)) is not None]
    return pd.concat(frames, ignore_index=True) if frames else None


def summarize_and_test(df, baseline: str, variant: str, metric: str = "dice",
                       alpha: float = 0.05) -> List[Dict]:
    """Per-class paired Wilcoxon (variant vs baseline over matched
    (case, seed)), effect size r = Z/sqrt(n), BH-FDR across classes."""
    from scipy.stats import wilcoxon, norm

    out = []
    classes = sorted(df["class"].unique())
    pvals = []
    for c in classes:
        a = df[(df["model"] == baseline) & (df["class"] == c)]
        b = df[(df["model"] == variant) & (df["class"] == c)]
        merged = a.merge(b, on=["case", "seed", "class"], suffixes=("_base", "_var"))
        x = merged[f"{metric}_base"].to_numpy(float)
        y = merged[f"{metric}_var"].to_numpy(float)
        ok = np.isfinite(x) & np.isfinite(y)
        x, y = x[ok], y[ok]
        n = len(x)
        if n < 3 or np.allclose(x, y):
            out.append({"class": c, "n": n, "p": np.nan, "r": np.nan,
                        "delta": float(np.nanmean(y - x)) if n else np.nan})
            pvals.append(np.nan)
            continue
        try:
            stat, p = wilcoxon(y, x, zero_method="wilcox")
            # normal-approx Z from p (two-sided) → effect size r
            z = norm.isf(p / 2.0)
            r = z / np.sqrt(n)
        except ValueError:
            p, r = np.nan, np.nan
        out.append({"class": c, "n": n, "p": float(p), "r": float(r),
                    "delta": float(np.mean(y - x))})
        pvals.append(p)

    # Benjamini–Hochberg across classes (stats_and_plots.py:40-54)
    ps = np.asarray(pvals, float)
    finite = np.isfinite(ps)
    m = finite.sum()
    reject = np.zeros(len(ps), bool)
    if m:
        order = np.argsort(np.where(finite, ps, np.inf))
        thresh = alpha * (np.arange(1, len(ps) + 1)) / m
        passed = ps[order][:m] <= thresh[:m]
        k = np.max(np.nonzero(passed)[0]) + 1 if passed.any() else 0
        reject[order[:k]] = True
    for row, rej in zip(out, reject):
        row["significant_fdr"] = bool(rej)
    return out


def violin_delta(df, baseline: str, variants: List[str], out_path,
                 metric: str = "dice"):
    """ΔDice violins with jitter (stats_and_plots.py:56-83)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(2 + 1.5 * len(variants), 4))
    data, labels = [], []
    rng = np.random.default_rng(0)
    for v in variants:
        a = df[df["model"] == baseline]
        b = df[df["model"] == v]
        merged = a.merge(b, on=["case", "seed", "class"], suffixes=("_b", "_v"))
        d = (merged[f"{metric}_v"] - merged[f"{metric}_b"]).to_numpy(float)
        d = d[np.isfinite(d)]
        if len(d):
            data.append(d)
            labels.append(v)
    if data:
        ax.violinplot(data, showmeans=True)
        for i, d in enumerate(data):
            ax.scatter(np.full_like(d, i + 1) + rng.normal(0, 0.04, len(d)),
                       d, s=4, alpha=0.3)
        ax.set_xticks(range(1, len(labels) + 1), labels, rotation=30)
    ax.axhline(0, color="k", lw=0.5)
    ax.set_ylabel(f"Δ{metric} vs {baseline}")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def spaghetti_for(df, baseline: str, variant: str, out_path,
                  metric: str = "dice"):
    """Paired baseline→variant spaghetti per class
    (stats_and_plots.py:85-106)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    a = df[df["model"] == baseline]
    b = df[df["model"] == variant]
    merged = a.merge(b, on=["case", "seed", "class"], suffixes=("_b", "_v"))
    classes = sorted(merged["class"].unique())
    fig, axes = plt.subplots(1, max(1, len(classes)),
                             figsize=(1.6 * max(1, len(classes)), 3),
                             sharey=True)
    if len(classes) <= 1:
        axes = [axes]
    for ax, c in zip(axes, classes):
        sub = merged[merged["class"] == c]
        for _, row in sub.iterrows():
            ax.plot([0, 1], [row[f"{metric}_b"], row[f"{metric}_v"]],
                    "-o", ms=2, lw=0.5, alpha=0.5)
        ax.set_xticks([0, 1], [baseline[:6], variant[:6]], rotation=45)
        ax.set_title(f"cls {c}", fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
