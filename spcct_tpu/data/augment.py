# augment.py — train-time augmentation with reference-parity semantics.
#
# TPU-native rebuild of reference TrainGridAug + the ragged-safe separable
# stripe shuffle (innovative3D/datasets.py:56-206) and the grid-size
# assignment (helpers.py:280-289). Host-side numpy on (F, H, W) volumes:
# augmentation cost is O(volume) gathers, overlapped with TPU compute by the
# pipeline's prefetch thread, so the device never waits on it.
#
# Parity notes:
#   * stripe boundaries use the exact (i*n)//g ragged math (datasets.py:56-58);
#     stripes are permuted only within equal-size groups, rows first then
#     columns (datasets.py:60-115) — expressed here as two gather index
#     vectors, which is the same permutation applied in one shot;
#   * the bright 32x32 top-left stamp on frame 0 after a grid shuffle
#     (datasets.py:199-204) is reproduced behind config.GRID_STAMP (quirk #2);
#   * grid sizes: the reference builds a ~3N-long list and indexes the first N
#     (helpers.py:280-289, SURVEY.md §8 quirk #10) — we generate exactly N
#     draws with the same marginal distribution.
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..config import GRID_STAMP

# SPCCT_NATIVE_AUG=1 routes the jitter+noise elementwise tail through the
# C++ fused pass (runtime/spcct_data.cpp::stamp_and_noise). Jitter-only is
# bit-identical to the numpy path; the gaussian noise FIELD comes from the
# native mt19937_64 stream instead of the np.Generator stream (same
# distribution, different draws) — hence opt-in, keeping the default path's
# seeded-stream reproducibility. Off the TPU critical path since device-mode
# augmentation (data/device_aug.py); relevant for host-only training.
_NATIVE_AUG = os.getenv("SPCCT_NATIVE_AUG", "0") == "1"


def generate_cumulative_grid_sizes(
    num_images: int,
    num_grid_sizes: int = 10,
    cumulative_percentage: float = 0.3,
    rng: Optional[np.random.Generator] = None,
) -> List[int]:
    """Per-sample grid-size list (reference helpers.py:280-289).

    The reference over-generates (int(N*pct) per size, 10 sizes → ~3N entries)
    then only the first N shuffled entries are ever indexed; the effective
    marginal is uniform over the multiset. We produce exactly N entries with
    the same distribution.
    """
    rng = rng or np.random.default_rng()
    per = int(num_images * cumulative_percentage)
    pool: List[int] = []
    for gs in range(1, num_grid_sizes + 1):
        pool.extend([gs] * per)
    if len(pool) < num_images:
        pool.extend(rng.integers(1, num_grid_sizes + 1, size=num_images - len(pool)).tolist())
    pool = np.asarray(pool)
    rng.shuffle(pool)
    return pool[:num_images].astype(np.int64).tolist()


def grid_boundaries(n: int, g: int) -> List[int]:
    """Ragged stripe boundaries (reference datasets.py:56-58)."""
    return [(i * n) // g for i in range(g)] + [n]


def stripe_permutation(n: int, g: int, rng: np.random.Generator) -> np.ndarray:
    """Index vector idx[n] implementing the reference's group-wise stripe
    shuffle along one axis: stripes of equal size are permuted among
    themselves; out[t0:t1] = in[s0:s1] (datasets.py:60-98)."""
    bounds = grid_boundaries(n, max(1, int(g)))
    stripes = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
    groups: dict = {}
    for s in stripes:
        groups.setdefault(s[1] - s[0], []).append(s)
    idx = np.arange(n)
    for _, lst in groups.items():
        perm = list(lst)
        rng.shuffle(perm)
        for (t0, t1), (s0, s1) in zip(lst, perm):
            idx[t0:t1] = np.arange(s0, s1)
    return idx


def grid_shuffle_xy(
    img: np.ndarray, lbl: Optional[np.ndarray], gh: int, gw: int, rng: np.random.Generator
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Separable stripe shuffle on (..., H, W); rows first, then columns
    (datasets.py:93-115). The two gathers commute into one fancy-index."""
    if gh <= 1 and gw <= 1:
        return img, lbl
    H, W = img.shape[-2], img.shape[-1]
    idx_h = stripe_permutation(H, gh, rng)
    idx_w = stripe_permutation(W, gw, rng)
    img = img[..., idx_h, :][..., :, idx_w]
    if lbl is not None:
        lbl = lbl[..., idx_h, :][..., :, idx_w]
    return img, lbl


@dataclass
class TrainGridAug:
    """Per-sample training augmentation (reference datasets.py:131-206).

    Operates on img (F, H, W) float32 + lbl (F, H, W) int64 (the reference's
    (1,F,H,W) channel dim is implicit here; the dataset adds the channel axis
    after augmentation). All randomness flows from an explicit
    np.random.Generator for reproducibility across workers.
    """
    gs_choices: Tuple[int, ...] = (2, 3, 4, 5)
    p_grid: float = 1.0
    flip_p: float = 0.5
    rot90_p: float = 0.5
    jitter_p: float = 0.3
    noise_p: float = 0.3
    noise_std: float = 0.01
    stamp_top_left: bool = True

    def __call__(
        self,
        img: np.ndarray,
        lbl: Optional[np.ndarray],
        gs: Optional[int],
        rng: np.random.Generator,
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        # flips (W then H, independent p=flip_p each — datasets.py:163-168)
        if rng.random() < self.flip_p:
            img = img[..., ::-1]
            if lbl is not None:
                lbl = lbl[..., ::-1]
        if rng.random() < self.flip_p:
            img = img[..., ::-1, :]
            if lbl is not None:
                lbl = lbl[..., ::-1, :]

        # rot90 (datasets.py:171-175)
        if rng.random() < self.rot90_p:
            k = int(rng.integers(1, 4))
            img = np.rot90(img, k, axes=(-2, -1))
            if lbl is not None:
                lbl = np.rot90(lbl, k, axes=(-2, -1))

        # intensity jitter ±10% scale, ±0.05 shift (datasets.py:178-181)
        scale, shift = 1.0, 0.0
        if rng.random() < self.jitter_p:
            scale = 1.0 + 0.1 * (2 * rng.random() - 1)
            shift = 0.05 * (2 * rng.random() - 1)

        # gaussian noise, std = min(noise_std, 0.25 * std(x)) (datasets.py:184-188)
        use_noise = rng.random() < self.noise_p
        # post-jitter std without materializing: std(a*x+b) = |a|*std(x)
        v = abs(scale) * float(img.std()) if use_noise else 0.0
        std = min(self.noise_std, 0.25 * v) if (use_noise and v > 0) else 0.0

        from ..runtime.native import lib as _native_lib
        if _NATIVE_AUG and _native_lib is not None and img.ndim == 3 and \
                (scale != 1.0 or shift != 0.0 or std > 0.0):
            # stamp_and_noise mutates in place: when no flip/rot90 fired, img
            # can still alias the dataset's resident array (ascontiguousarray
            # is then a no-op view pass-through), and the mutation would
            # corrupt the stored training data cumulatively across epochs.
            # Always materialize a fresh owned buffer before the native call.
            img = np.array(img, np.float32, copy=True, order="C")
            _native_lib.stamp_and_noise(
                img, *img.shape, np.float32(scale), np.float32(shift),
                np.float32(std), np.uint64(rng.integers(0, 2 ** 63)))
        else:
            if scale != 1.0 or shift != 0.0:
                img = img * scale + shift
            if std > 0.0:
                img = img + rng.standard_normal(img.shape).astype(np.float32) * std

        # grid-shuffle with per-sample gs (datasets.py:191-197)
        run_grid = rng.random() < self.p_grid
        use_gs = int(gs) if (gs is not None) else 0
        if use_gs < 1:
            use_gs = int(rng.choice(self.gs_choices)) if self.gs_choices else 1

        if run_grid and use_gs > 1:
            img = np.ascontiguousarray(img)
            img, lbl = grid_shuffle_xy(img, lbl, use_gs, use_gs, rng)
            if self.stamp_top_left and GRID_STAMP:
                # bright stamp on frame 0 (datasets.py:199-204):
                # region = region.max() + max(|x|, 1) * 0.25
                img = np.ascontiguousarray(img)
                bump = max(float(np.abs(img).max()), 1.0) * 0.25
                img[0, :32, :32] = img[0, :32, :32].max() + bump

        return np.ascontiguousarray(img, np.float32), (
            None if lbl is None else np.ascontiguousarray(lbl)
        )


@dataclass
class AugmentImageAndLabels:
    """Legacy full-grid patch-shuffle augmenter (reference helpers.py:43-124):
    flips/rotate/brightness/noise, then all F*g^2 patches shuffled JOINTLY
    across frames (unlike TrainGridAug's per-axis stripe shuffle). Superseded
    by TrainGridAug but kept as exported public API, matching the reference.
    """
    p_flip: float = 0.5
    p_rotate: float = 0.5
    brightness_range: Tuple[float, float] = (0.9, 1.1)
    noise_std: float = 0.01

    def __call__(self, image: np.ndarray, label: np.ndarray, grid_size: int,
                 rng: Optional[np.random.Generator] = None):
        """image: (F, H, W); label: (F, H, W)."""
        rng = rng or np.random.default_rng()
        if rng.random() < self.p_flip:
            if rng.random() < 0.5:
                image, label = image[..., ::-1], label[..., ::-1]
            else:
                image, label = image[..., ::-1, :], label[..., ::-1, :]
        if rng.random() < self.p_rotate:
            k = int(rng.choice([1, 2, 3]))
            image = np.rot90(image, k, axes=(-2, -1))
            label = np.rot90(label, k, axes=(-2, -1))
        image = image * rng.uniform(*self.brightness_range)
        image = image + rng.standard_normal(image.shape).astype(np.float32) * (
            float(image.std()) * self.noise_std)

        F, H, W = image.shape
        g = int(grid_size)
        if g > 1:
            ph, pw = H // g, W // g
            if ph and pw:
                coords, pimgs, plbls = [], [], []
                for f in range(F):
                    for i in range(g):
                        for j in range(g):
                            y0, x0 = i * ph, j * pw
                            y1, x1 = min(H, y0 + ph), min(W, x0 + pw)
                            if y1 > y0 and x1 > x0:
                                coords.append((f, y0, x0))
                                pimgs.append(image[f, y0:y1, x0:x1].copy())
                                plbls.append(label[f, y0:y1, x0:x1].copy())
                idxs = rng.permutation(len(coords))
                out_img = np.zeros_like(image)
                out_lbl = np.zeros_like(label)
                for new, old in enumerate(idxs):
                    df, dy, dx = coords[new]
                    sp, sl = pimgs[old], plbls[old]
                    h, w = sp.shape
                    out_img[df, dy:dy + h, dx:dx + w] = sp
                    out_lbl[df, dy:dy + h, dx:dx + w] = sl
                return out_img, out_lbl
        return np.ascontiguousarray(image), np.ascontiguousarray(label)


def identity_aug() -> TrainGridAug:
    """Validation transform: all probabilities zero, no stamp
    (reference datasets.py:306-308 quirk #4 — val routes through TrainGridAug
    with everything off, i.e. identity)."""
    return TrainGridAug(p_grid=0.0, flip_p=0.0, rot90_p=0.0, jitter_p=0.0,
                        noise_p=0.0, stamp_top_left=False)
