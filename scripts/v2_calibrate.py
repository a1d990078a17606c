#!/usr/bin/env python
# v2_calibrate.py — information-floor calibration of the v2 hard phantom
# (data/phantom_v2.py) BEFORE burning chip hours on the Phase-B protocol
# (VERDICT r4 weak #2 / next #2).
#
# Question it answers: is v2 (a) LEARNABLE at a given resolution — i.e. a
# spectra-template oracle with modest spatial context reaches high macro
# dice on the held-out scan — and (b) NON-SATURATING — the pixel-exact
# ceiling sits visibly below 1.0 (partial-volume boundaries + jitter)?
#
# Oracle: per-class mean spectrum templates are fit on the TRAIN scans
# (0,1,2,4), then test-scan pixels (scan 3, the held-out config) are
# classified by nearest template after k x k box averaging. Two modes:
#   raw   — Euclidean on raw spectra (amplitude carries the HA-density
#           series, which are the same material at different density =
#           same spectral SHAPE scaled; normalization collapses them)
#   shape — common-mode normalized (what a pure spectral-shape model sees;
#           measured 2026-08-19: tops out at 0.28 macro even at k=9/512²,
#           proving amplitude is load-bearing on this task)
# oracle-dice(k) bounds what a converged model can reach, and the
# 64^2-vs-512^2 contrast explains the SPFF val-0.71 / test-0.33 gap of the
# round-4 CPU acceptance leg.
#
#   python scripts/v2_calibrate.py [--hw 512 64] [--sig 0.055]
#
# Writes a table to stdout; record the verdict in BASELINE.md.
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import zlib

import numpy as np

from spcct_tpu.config import NUM_CLASSES, TEST_INDICES, TRAIN_INDICES, dataset_configs
from spcct_tpu.data.loader import _MATERIAL_SPECTRA
from spcct_tpu.data import phantom_v2
from spcct_tpu.data.phantom_v2 import synth_scan_v2


def _gen(idx: int, hw: int, slices: int):
    cfg = dataset_configs[idx]
    seed = zlib.crc32(cfg.get("name", "scan").encode()) % (2 ** 31)
    return synth_scan_v2(cfg, 5, slices, (hw, hw), seed, _MATERIAL_SPECTRA)


def _box(img: np.ndarray, k: int) -> np.ndarray:
    """k x k box average over the last two axes (edge padding)."""
    if k <= 1:
        return img
    r = k // 2
    pad = [(0, 0)] * (img.ndim - 2) + [(r, r), (r, r)]
    ap = np.pad(img, pad, mode="edge")
    c = np.cumsum(np.cumsum(ap, axis=-2), axis=-1)
    c = np.pad(c, [(0, 0)] * (img.ndim - 2) + [(1, 0), (1, 0)])
    H, W = img.shape[-2:]
    out = (c[..., k:k + H, k:k + W] - c[..., :H, k:k + W]
           - c[..., k:k + H, :W] + c[..., :H, :W])
    return out / float(k * k)


def _norm_spec(v: np.ndarray) -> np.ndarray:
    """Common-mode normalize: divide by the mean over bins (axis 0)."""
    return v / (np.abs(v).mean(axis=0, keepdims=True) + 1e-6)


def oracle_dice(hw: int, slices: int, ks=(1, 3, 5, 9), mode="raw") -> dict:
    # fit templates on train scans
    feat = (lambda v: v) if mode == "raw" else _norm_spec
    sums = np.zeros((NUM_CLASSES, 5), np.float64)
    cnts = np.zeros(NUM_CLASSES, np.int64)
    test_sets = []
    for idx in TRAIN_INDICES + TEST_INDICES:
        imgs, lbls = _gen(idx, hw, slices)
        if idx in TEST_INDICES:
            test_sets.append((imgs, lbls))
            continue
        v = feat(imgs.transpose(1, 0, 2, 3).reshape(5, -1))  # (F, n)
        lab = lbls[:, 0].reshape(-1)
        for c in range(NUM_CLASSES):
            m = lab == c
            if m.any():
                sums[c] += v[:, m].sum(axis=1)
                cnts[c] += int(m.sum())
    templates = sums / np.maximum(cnts, 1)[:, None]     # (C, F)
    present_c = np.where(cnts > 0)[0]

    out = {}
    for k in ks:
        inter = np.zeros(NUM_CLASSES, np.int64)
        psum = np.zeros(NUM_CLASSES, np.int64)
        gsum = np.zeros(NUM_CLASSES, np.int64)
        for imgs, lbls in test_sets:
            sm = _box(imgs, k)                          # (N, F, H, W)
            v = feat(sm.transpose(1, 0, 2, 3).reshape(5, -1))
            d = ((v[None, :, :] - templates[present_c][:, :, None]) ** 2
                 ).sum(axis=1)                          # (Cp, n)
            pred = present_c[np.argmin(d, axis=0)]
            gt = lbls[:, 0].reshape(-1)
            for c in range(1, NUM_CLASSES):             # FG macro, Option-3
                pm, gm = pred == c, gt == c
                inter[c] += int((pm & gm).sum())
                psum[c] += int(pm.sum())
                gsum[c] += int(gm.sum())
        dice = np.full(NUM_CLASSES, np.nan)
        for c in range(1, NUM_CLASSES):
            if gsum[c] == 0 and psum[c] == 0:
                continue                                # absent+unpredicted -> NaN
            dice[c] = 2.0 * inter[c] / max(psum[c] + gsum[c], 1)
        out[k] = (float(np.nanmean(dice[1:])), dice)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs="+", default=[64, 128, 512])
    ap.add_argument("--slices", type=int, default=12)
    ap.add_argument("--sig", type=float, nargs="+", default=None,
                    help="override phantom_v2 sig_pix values to sweep")
    ap.add_argument("--mode", default="raw", choices=["raw", "shape"])
    args = ap.parse_args()

    sigs = args.sig or [None]
    for sig in sigs:
        if sig is not None:
            phantom_v2._SIG_PIX_OVERRIDE = sig  # see phantom_v2.synth_scan_v2
        for hw in args.hw:
            res = oracle_dice(hw, args.slices, mode=args.mode)
            tag = (f"mode={args.mode} "
                   f"sig={sig if sig is not None else 'default'} hw={hw}")
            for k, (macro, dice) in sorted(res.items()):
                worst = np.nanargmin(dice[1:]) + 1
                per = " ".join(f"{c}:{dice[c]:.2f}" for c in range(1, NUM_CLASSES)
                               if not np.isnan(dice[c]))
                print(f"[{tag}] box k={k}: oracle FG macro dice "
                      f"{macro:.3f} (worst class {worst}: "
                      f"{dice[worst]:.3f}) | {per}", flush=True)


if __name__ == "__main__":
    main()
