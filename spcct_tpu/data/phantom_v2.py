# phantom_v2.py — a synthetic SPCCT phantom hard enough to discriminate
# architectures.
#
# The v1 phantom (loader.py::synth_scan) is piecewise-constant spectra +
# iid Gaussian noise with geometry identical across slices; at the
# converged reference budget every variant learns it to a 0.9997+ val
# ceiling and the protocol table degenerates into rare-class coin flips
# (BASELINE.md round-3 analysis). v2 adds the physics that analysis named
# as missing, each one targeting a failure mode of the ceiling:
#
#   * per-slice geometric jitter (random small affine) — the phantom is
#     repositioned between slices, so the per-scan label map cannot be
#     memorized; segmentation must come from image evidence;
#   * partial-volume boundaries — material one-hot maps are blurred before
#     spectral mixing, so ROI edges are genuinely ambiguous a few pixels
#     wide and pixel-exact Dice ceilings sit below 1.0;
#   * correlated spectral noise — adjacent energy bins mix (charge-sharing
#     style rho^|f-g| covariance) plus a spatially-smooth scatter term, so
#     per-bin averaging cannot remove it;
#   * beam hardening — cupping inside the body and dark streak bands
#     between dense inserts (HA800/HA400/I15), stronger in low bins;
#   * ring artifacts — smooth random radial detector-gain profile;
#   * per-slice per-bin gain drift + low-frequency intra-ROI texture —
#     absolute intensity is unreliable; spectral *shape* (the common-mode-
#     invariant part) carries the class signal, which is exactly the
#     structure the spectral-fusion variants are built to exploit.
#
# Selected with SPCCT_PHANTOM=v2 (loader.py). The v1 phantom remains the
# default so runs_protocol*/ stay internally comparable.
#
# Reference parity note: the reference has no synthetic generator at all —
# it requires mounted DICOMs (innovative3D/helpers.py:132-211). Both
# phantoms are additions; v2 exists to give the reference's central
# SPFF-vs-ablation claim a benchmark with statistical teeth before the
# real-data mount (VERDICT r3 task 4).
from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np

from ..config import NUM_CLASSES
from .rasterize import paint_labels, scale_rois

# Dense inserts that cause beam-hardening streaks: HA800, HA400, I15.
_DENSE_LABELS = (1, 2, 9)

# calibration hook (scripts/v2_calibrate.py): when set, overrides sig_pix
_SIG_PIX_OVERRIDE: float | None = None


# ── small numpy helpers (no scipy dependency) ─────────────────────────


def _gauss1d(sigma: float) -> np.ndarray:
    r = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _blur2d(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian blur over the last two axes (reflect padding)."""
    if sigma <= 0:
        return img
    k = _gauss1d(sigma)
    r = (len(k) - 1) // 2

    def conv_last(a: np.ndarray) -> np.ndarray:
        pad = [(0, 0)] * (a.ndim - 1) + [(r, r)]
        ap = np.pad(a, pad, mode="reflect")
        out = np.zeros_like(a, dtype=np.float32)
        for i, w in enumerate(k):
            out += w * ap[..., i : i + a.shape[-1]]
        return out

    x = conv_last(img.astype(np.float32))
    x = conv_last(np.swapaxes(x, -1, -2))
    return np.swapaxes(x, -1, -2)


def _smooth_field(rng: np.random.Generator, hw: Tuple[int, int],
                  coarse: int, amp: float) -> np.ndarray:
    """Low-frequency multiplicative field in [1-amp, 1+amp]: coarse noise
    grid, bilinear upsample, light blur."""
    H, W = hw
    ch, cw = max(2, H // coarse), max(2, W // coarse)
    g = rng.standard_normal((ch, cw)).astype(np.float32)
    ys = np.linspace(0, ch - 1, H, dtype=np.float32)
    xs = np.linspace(0, cw - 1, W, dtype=np.float32)
    y0 = np.clip(ys.astype(np.int32), 0, ch - 2)
    x0 = np.clip(xs.astype(np.int32), 0, cw - 2)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    up = ((1 - wy) * (1 - wx) * g[y0][:, x0]
          + (1 - wy) * wx * g[y0][:, x0 + 1]
          + wy * (1 - wx) * g[y0 + 1][:, x0]
          + wy * wx * g[y0 + 1][:, x0 + 1])
    up = _blur2d(up, 2.0)
    s = up.std() + 1e-6
    return 1.0 + amp * (up / s)


def _affine_warp_nn(lbl: np.ndarray, rot_deg: float, shift: Tuple[float, float],
                    scale: float) -> np.ndarray:
    """Nearest-neighbour warp of an integer label map by a small affine
    about the image center (phantom repositioning between slices)."""
    H, W = lbl.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    th = math.radians(rot_deg)
    c, s = math.cos(th), math.sin(th)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    # inverse map: output pixel -> source pixel
    yr = (yy - cy - shift[0]) / scale
    xr = (xx - cx - shift[1]) / scale
    ys = c * yr + s * xr + cy
    xs = -s * yr + c * xr + cx
    yi = np.clip(np.rint(ys).astype(np.int64), 0, H - 1)
    xi = np.clip(np.rint(xs).astype(np.int64), 0, W - 1)
    out = lbl[yi, xi]
    # outside the source frame -> background
    oob = (ys < -0.5) | (ys > H - 0.5) | (xs < -0.5) | (xs > W - 0.5)
    out[oob] = 0
    return out


# ── the phantom ───────────────────────────────────────────────────────


def synth_scan_v2(cfg: dict, num_frames: int, num_slices: int,
                  hw: Tuple[int, int], seed: int,
                  spectra_table: Dict[int, tuple]) -> Tuple[np.ndarray, np.ndarray]:
    """Procedural hard phantom for one scan config.

    Returns (imgs [N, F, H, W] float32, lbls [N, F, H, W] int64) with the
    scan's ROI geometry jittered per slice.
    """
    H, W = hw
    F = num_frames
    rng = np.random.default_rng(seed)
    lbl_base = paint_labels(cfg, (H, W))

    spectra = np.zeros((NUM_CLASSES, F), np.float32)
    for c in range(NUM_CLASSES):
        s = spectra_table.get(c, (0.3,) * 5)
        spectra[c] = np.asarray(s[:F], np.float32)

    # geometry shared across slices of one scan
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    R_body = 0.46 * min(H, W)
    # bin weighting for beam-hardening effects: strong in low-energy bins
    bh_w = np.linspace(1.0, 0.35, F, dtype=np.float32)[:, None, None]

    # ring artifacts: smooth random radial detector-gain profile (per scan)
    n_r = int(r.max()) + 2
    prof = rng.standard_normal(n_r).astype(np.float32)
    k = _gauss1d(6.0)
    prof = np.convolve(np.pad(prof, (len(k) // 2,) * 2, mode="reflect"),
                       k, mode="valid")[:n_r]
    prof = 1.0 + 0.03 * prof / (prof.std() + 1e-6)
    rings = prof[np.rint(r).astype(np.int64)]

    # streak geometry: dense-insert ROI centers at this resolution
    dense = [(x0 + w0 / 2.0, y0 + h0 / 2.0)
             for (x0, y0, w0, h0, lab) in scale_rois(cfg, (H, W))
             if lab in _DENSE_LABELS]

    # correlated spectral noise: C[f,g] = rho^|f-g|, Cholesky mixing
    rho = 0.45
    C = rho ** np.abs(np.subtract.outer(np.arange(F), np.arange(F)))
    L = np.linalg.cholesky(C).astype(np.float32)

    # noise-level profile: v1 used sigma 0.03 iid; v2's discrimination
    # pressure comes mostly from here (interior Mahalanobis distance between
    # confusable materials ~2.6 per pixel at 0.055). _SIG_PIX_OVERRIDE is the
    # calibration hook used by scripts/v2_calibrate.py sweeps; None = default.
    sig_pix = _SIG_PIX_OVERRIDE if _SIG_PIX_OVERRIDE is not None else 0.055
    sig_scatter = 0.02

    imgs = np.empty((num_slices, F, H, W), np.float32)
    lbls = np.empty((num_slices, F, H, W), np.int64)

    for i in range(num_slices):
        # 1. phantom repositioning: small per-slice affine
        rot = float(rng.uniform(-3.0, 3.0))
        shift = (float(rng.uniform(-0.012, 0.012)) * H,
                 float(rng.uniform(-0.012, 0.012)) * W)
        scale = float(rng.uniform(0.985, 1.015))
        lbl = _affine_warp_nn(lbl_base, rot, shift, scale)

        # 2. partial-volume spectral mixing: blur the one-hot fractions
        present = np.unique(lbl)
        frac = np.zeros((len(present), H, W), np.float32)
        for j, c in enumerate(present):
            frac[j] = (lbl == c)
        frac = _blur2d(frac, 1.2)
        frac /= frac.sum(axis=0, keepdims=True) + 1e-8
        base = np.einsum("chw,cf->fhw", frac, spectra[present])

        # 3. body disk (same as v1: BG inside the body != outside); the body
        # follows the per-slice shift/scale
        body = (((xx - cx - shift[1]) ** 2 + (yy - cy - shift[0]) ** 2)
                <= (scale * R_body) ** 2)
        bodyf = _blur2d(body.astype(np.float32), 1.0)
        base = base + 0.15 * bodyf[None]

        # 4. beam hardening: cupping (center depressed, low bins worst)
        rn = np.clip(r / (scale * R_body), 0.0, 1.0)
        cup = 1.0 - 0.08 * bh_w * ((1.0 - rn * rn) * bodyf)[None]
        base = base * cup

        # 5. streak bands between each pair of dense inserts
        if len(dense) >= 2:
            streak = np.zeros((H, W), np.float32)
            wband = 0.006 * min(H, W) + 1.0
            for a in range(len(dense)):
                for b in range(a + 1, len(dense)):
                    (x1, y1), (x2, y2) = dense[a], dense[b]
                    dx, dy = x2 - x1, y2 - y1
                    ln = math.hypot(dx, dy) + 1e-6
                    t = ((xx - x1) * dx + (yy - y1) * dy) / (ln * ln)
                    dperp = np.abs((xx - x1) * dy - (yy - y1) * dx) / ln
                    gate = np.clip(t * (1.0 - t) * 12.0, 0.0, 1.0)
                    streak += np.exp(-0.5 * (dperp / wband) ** 2) * gate
            base = base - 0.04 * bh_w * np.clip(streak, 0.0, 1.5)[None]

        # 6. rings + per-slice texture + per-bin gain drift
        tex = _smooth_field(rng, (H, W), coarse=32, amp=0.07)
        gain = (1.0 + 0.03 * rng.standard_normal(F).astype(np.float32))
        base = base * (rings * tex)[None] * gain[:, None, None]

        # 7. correlated spectral noise + smooth scatter noise
        eps = rng.standard_normal((F, H, W)).astype(np.float32)
        n_spec = np.einsum("fg,ghw->fhw", L, eps) * sig_pix
        n_scat = _blur2d(
            rng.standard_normal((H, W)).astype(np.float32), 8.0)
        n_scat = n_scat / (n_scat.std() + 1e-6) * sig_scatter
        imgs[i] = (base + n_spec + n_scat[None]) * 1000.0
        lbls[i] = lbl[None]

    return imgs, lbls
