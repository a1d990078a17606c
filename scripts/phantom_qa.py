#!/usr/bin/env python
# phantom_qa.py — visual + numeric QA of the v2 hard phantom
# (data/phantom_v2.py): one figure showing v1-vs-v2 slices, the
# partial-volume boundary profile, the inter-bin noise correlation matrix,
# and slice-to-slice geometric jitter. Writes
# analysis_plots/phantom_v2_qa.png + a printed numeric summary.
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from spcct_tpu.config import dataset_configs
from spcct_tpu.data.loader import _MATERIAL_SPECTRA, synth_scan
from spcct_tpu.data.phantom_v2 import synth_scan_v2


def main() -> None:
    cfg = dataset_configs[0]
    hw = (512, 512)
    i1, l1 = synth_scan(cfg, 5, 2, hw, 1234)
    i2, l2 = synth_scan_v2(cfg, 5, 3, hw, 1234, _MATERIAL_SPECTRA)

    fig, ax = plt.subplots(2, 3, figsize=(15, 9))
    kw = dict(cmap="gray", vmin=0, vmax=1200)
    ax[0, 0].imshow(i1[0, 0], **kw)
    ax[0, 0].set_title("v1 phantom, bin 0 (piecewise-constant + iid noise)")
    ax[0, 1].imshow(i2[0, 0], **kw)
    ax[0, 1].set_title("v2 phantom, bin 0 (PV + streaks + rings + texture)")

    # boundary profile through the HA800 rod: v1 steps, v2 ramps
    ys, xs = np.where(l2[0, 0] == 1)
    if len(ys):
        cy, cx = int(ys.mean()), int(xs.mean())
        half = (xs.max() - xs.min()) // 2 + 12
        ax[0, 2].plot(i1[0, 0][l1[0, 0].shape[0] // 2 if False else cy,
                               cx - half:cx + half], label="v1", lw=1)
        ax[0, 2].plot(i2[0, 0][cy, cx - half:cx + half], label="v2", lw=1)
        ax[0, 2].set_title("HA800 rod line profile (partial volume)")
        ax[0, 2].legend()

    # inter-bin noise correlation inside the water ROI (label 8)
    for k, (imgs, lbls, name) in enumerate(
            [(i1, l1, "v1"), (i2, l2, "v2")]):
        m = lbls[0, 0] == 8
        v = imgs[0][:, m]                      # (F, n)
        v = v - v.mean(axis=1, keepdims=True)
        C = np.corrcoef(v)
        im = ax[1, k].imshow(C, vmin=-0.2, vmax=1.0, cmap="viridis")
        ax[1, k].set_title(f"{name} inter-bin noise corr (water ROI)")
        for (a, b), val in np.ndenumerate(C):
            ax[1, k].text(b, a, f"{val:.2f}", ha="center", va="center",
                          color="w", fontsize=7)
        if k == 0:
            adj1 = np.mean([C[f, f + 1] for f in range(4)])
        else:
            adj2 = np.mean([C[f, f + 1] for f in range(4)])
    fig.colorbar(im, ax=ax[1, 1], shrink=0.8)

    # per-slice jitter: overlay of label-1 contours from 3 slices
    canvas = np.zeros(hw + (3,), np.float32)
    for s, col in zip(range(3), np.eye(3)):
        edge = np.zeros(hw, bool)
        lbl = l2[s, 0]
        edge[1:] |= lbl[1:] != lbl[:-1]
        edge[:, 1:] |= lbl[:, 1:] != lbl[:, :-1]
        canvas += edge[..., None] * col
    ax[1, 2].imshow(np.clip(canvas, 0, 1))
    ax[1, 2].set_title("v2 ROI boundaries, slices 0/1/2 (geometric jitter)")
    for a in ax.flat:
        a.set_xticks([]), a.set_yticks([])
    fig.tight_layout()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "analysis_plots", "phantom_v2_qa.png")
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")
    print(f"adjacent-bin noise correlation: v1 {adj1:+.3f}  v2 {adj2:+.3f} "
          "(v2 models charge-sharing; v1 is iid)")
    d12 = float((l2[0, 0] != l2[1, 0]).mean())
    print(f"slice-to-slice label disagreement (v2): {d12:.3%}")


if __name__ == "__main__":
    main()
