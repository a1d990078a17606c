# device_aug.py — on-device training augmentation for device-resident data.
#
# Motivation (measured, BASELINE.md round-2): the axon-tunneled host→device
# link moves ~41 MB/s, so shipping each (1,5,512,512) batch costs ~255 ms —
# longer than the 161 ms train step. The TPU-native fix is to keep the
# dataset resident in HBM and ship only the per-sample augmentation
# *parameters* (~5 KB/step): flips, rot90 k, jitter scalars, noise key, the
# two stripe-permutation index vectors, and the stamp flag. The augmentation
# itself runs as a jitted gather/elementwise pass on device (<1 ms).
#
# Semantics mirror data/augment.py::TrainGridAug (reference
# innovative3D/datasets.py:131-206) op-for-op in the same order:
# flipW → flipH → rot90 → intensity jitter → gaussian noise
# (std = min(0.01, 0.25·std(x))) → separable stripe shuffle → bright 32×32
# stamp on frame 0. Randomness comes from a dedicated np.random.Generator
# stream (host) + jax.random for the noise field (device); distributions
# match the host path, streams do not (cross-framework RNG parity is already
# out of scope — SURVEY.md §7 hard-part #2).
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GRID_STAMP
from .augment import TrainGridAug, stripe_permutation


def draw_params(aug: TrainGridAug, H: int, W: int, gs: Optional[int],
                rng: np.random.Generator, noise_seed: int) -> Dict[str, np.ndarray]:
    """Host-side: draw one sample's augmentation decisions (same decision
    structure as TrainGridAug.__call__, returned as arrays instead of being
    applied)."""
    flip_w = rng.random() < aug.flip_p
    flip_h = rng.random() < aug.flip_p
    rot_k = int(rng.integers(1, 4)) if rng.random() < aug.rot90_p else 0
    if rng.random() < aug.jitter_p:
        scale = 1.0 + 0.1 * (2 * rng.random() - 1)
        shift = 0.05 * (2 * rng.random() - 1)
    else:
        scale, shift = 1.0, 0.0
    use_noise = rng.random() < aug.noise_p

    run_grid = rng.random() < aug.p_grid
    use_gs = int(gs) if (gs is not None) else 0
    if use_gs < 1:
        use_gs = int(rng.choice(aug.gs_choices)) if aug.gs_choices else 1
    if run_grid and use_gs > 1:
        idx_h = stripe_permutation(H, use_gs, rng).astype(np.int32)
        idx_w = stripe_permutation(W, use_gs, rng).astype(np.int32)
        stamp = bool(aug.stamp_top_left and GRID_STAMP)
    else:
        idx_h = np.arange(H, dtype=np.int32)
        idx_w = np.arange(W, dtype=np.int32)
        stamp = False
    return {
        "flip_w": np.bool_(flip_w), "flip_h": np.bool_(flip_h),
        "rot_k": np.int32(rot_k),
        "scale": np.float32(scale), "shift": np.float32(shift),
        "use_noise": np.bool_(use_noise),
        "noise_std": np.float32(aug.noise_std),
        "idx_h": idx_h, "idx_w": idx_w,
        "stamp": np.bool_(stamp),
        "noise_seed": np.uint32(noise_seed & 0xFFFFFFFF),
    }


def identity_params(H: int, W: int) -> Dict[str, np.ndarray]:
    return {
        "flip_w": np.bool_(False), "flip_h": np.bool_(False),
        "rot_k": np.int32(0),
        "scale": np.float32(1.0), "shift": np.float32(0.0),
        "use_noise": np.bool_(False), "noise_std": np.float32(0.0),
        "idx_h": np.arange(H, dtype=np.int32),
        "idx_w": np.arange(W, dtype=np.int32),
        "stamp": np.bool_(False),
        "noise_seed": np.uint32(0),
    }


def _apply_one(img: jnp.ndarray, lbl: jnp.ndarray, p) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """img (F,H,W) f32, lbl (F,H,W) i32 — requires H == W (rot90 under jit)."""
    # flips (W then H) — jnp.where computes both branches; cheap elementwise
    img = jnp.where(p["flip_w"], img[..., ::-1], img)
    lbl = jnp.where(p["flip_w"], lbl[..., ::-1], lbl)
    img = jnp.where(p["flip_h"], img[..., ::-1, :], img)
    lbl = jnp.where(p["flip_h"], lbl[..., ::-1, :], lbl)

    # rot90 about (H, W); static branches under lax.switch
    img = jax.lax.switch(p["rot_k"], [lambda a, k=k: jnp.rot90(a, k, axes=(-2, -1))
                                      for k in range(4)], img)
    lbl = jax.lax.switch(p["rot_k"], [lambda a, k=k: jnp.rot90(a, k, axes=(-2, -1))
                                      for k in range(4)], lbl)

    # intensity jitter
    img = img * p["scale"] + p["shift"]

    # gaussian noise: std = min(noise_std, 0.25*std(x)), skipped when std==0
    v = jnp.std(img)
    std = jnp.minimum(p["noise_std"], 0.25 * v)
    key = jax.random.fold_in(jax.random.PRNGKey(0), p["noise_seed"])
    noise = jax.random.normal(key, img.shape, jnp.float32)
    img = jnp.where(p["use_noise"] & (v > 0), img + noise * std, img)

    # separable stripe shuffle (two gathers; identity perms when off)
    img = img[:, p["idx_h"], :][:, :, p["idx_w"]]
    lbl = lbl[:, p["idx_h"], :][:, :, p["idx_w"]]

    # bright 32x32 stamp on frame 0 (reference datasets.py:199-204)
    bump = jnp.maximum(jnp.max(jnp.abs(img)), 1.0) * 0.25
    region = jnp.max(img[0, :32, :32]) + bump
    stamped = img.at[0, :32, :32].set(region)
    img = jnp.where(p["stamp"], stamped, img)
    return img, lbl


def batch_from_params(images: jnp.ndarray, labels: jnp.ndarray,
                      idx: jnp.ndarray, params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather batch `idx` from the device-resident (N,F,H,W)/(N,F,H,W) arrays
    and apply per-sample augmentation. Returns ((B,F,H,W,1) f32, (B,F,H,W) i32)
    — the train-step input contract. Unjitted so it composes into larger
    compiled programs (train/loop.py make_scan_epoch); device_batch is the
    standalone jitted form."""
    img = images[idx]                       # (B,F,H,W)
    lbl = labels[idx].astype(jnp.int32)     # stored uint8, widened per batch
    img, lbl = jax.vmap(_apply_one)(img, lbl, params)
    return img[..., None], lbl


device_batch = jax.jit(batch_from_params)


@jax.jit
def device_batch_plain(images: jnp.ndarray, labels: jnp.ndarray,
                       idx: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Un-augmented gather (val/test): identity transform."""
    return images[idx][..., None], labels[idx].astype(jnp.int32)
