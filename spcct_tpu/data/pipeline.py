# pipeline.py — datasets, class-coverage split, datamodules, device prefetch.
#
# TPU-native rebuild of reference innovative3D/datasets.py:212-422. The
# reference feeds a Lightning Trainer from 16 DataLoader worker processes;
# here a single background prefetch thread assembles numpy batches (loading +
# augmentation are vectorized, see loader.py/augment.py) and ships them to the
# device asynchronously so the accelerator never blocks on input
# (SURVEY.md §7 build-plan item 7: "device-prefetch double-buffer").
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import (
    BATCH_SIZE,
    IGNORE_INDEX,
    NUM_CLASSES,
    NUM_FRAMES,
    USE_VMI,
    VMI_CLIP,
    VMI_RETURN_DEPTH,
    VMI_WEIGHTS,
    grid_size as GRID_SIZE,
    test_set as TEST_SET,
)
from .augment import TrainGridAug, generate_cumulative_grid_sizes, identity_aug
from .loader import load_config_set
from .vmi import apply_vmi_np


def sanitize_labels(lbl: np.ndarray, num_classes: int = NUM_CLASSES,
                    ignore_index: Optional[int] = IGNORE_INDEX) -> np.ndarray:
    """Out-of-range labels → ignore_index (reference datasets.py:41-50,232)."""
    lbl = lbl.astype(np.int64, copy=True)
    if ignore_index is None:
        lbl[(lbl < 0) | (lbl >= num_classes)] = 0
    else:
        lbl[(lbl < 0) | (lbl >= num_classes)] = ignore_index
    return lbl


def ensure_all_classes_in_training(
    X: np.ndarray, Y: np.ndarray, G: Sequence[int], num_classes: int,
    test_size: float = 0.2, val_size: float = 1.0, random_state: int = 42,
):
    """Class-coverage-aware split (reference datasets.py:340-364): one
    representative sample per present class is pinned into train, the rest is
    filled to (1-test_size) with an np-seeded shuffle; val gets val_size of the
    remainder. Representative = lowest index containing the class (the
    reference takes next(iter(set)) — unspecified order; lowest index is the
    deterministic choice)."""
    total = np.arange(len(X))
    required: List[int] = []
    seen = set()
    for cls in range(num_classes):
        hits = np.where([(y == cls).any() for y in Y])[0]
        if len(hits):
            first = int(hits[0])
            if first not in seen:
                required.append(first)
                seen.add(first)
    remaining = sorted(set(total.tolist()) - seen)
    np.random.seed(random_state)
    remaining = np.asarray(remaining)
    np.random.shuffle(remaining)

    n_train = int(len(X) * (1 - test_size))
    extra = max(0, n_train - len(required))
    train_inds = required + remaining[:extra].tolist()
    testval = remaining[extra:].tolist()
    n_val = int(len(testval) * val_size)
    val_inds, test_inds = testval[:n_val], testval[n_val:]
    G = np.asarray(G)
    return (
        X[train_inds], Y[train_inds], G[train_inds],
        X[val_inds], Y[val_inds], G[val_inds],
        X[test_inds], Y[test_inds], G[test_inds],
    )


class SpcctDataset3D:
    """3D dataset: items are (img [F,H,W] float32, lbl [F,H,W] int64)
    (reference DicomDataset3D, datasets.py:212-238). Out-of-range labels map
    to IGNORE_INDEX at access time."""

    def __init__(self, images, labels, grid_sizes, transform: Optional[TrainGridAug] = None):
        self.images = images
        self.labels = labels
        self.grid_sizes = list(grid_sizes)
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def get(self, idx: int, rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
        img = np.asarray(self.images[idx], np.float32)
        lbl = np.asarray(self.labels[idx], np.int64)
        lbl = np.where(lbl >= NUM_CLASSES, IGNORE_INDEX, lbl)
        if self.transform is not None:
            img, lbl = self.transform(img, lbl, self.grid_sizes[idx], rng)
        return img, lbl


class SpcctDataset2D:
    """2D dataset: frames become channels, labels collapse to (H, W) via
    per-class any-over-frames OR (reference DicomDataset2D,
    datasets.py:241-274)."""

    def __init__(self, images, labels, grid_sizes, transform: Optional[TrainGridAug] = None):
        self.images = images
        self.labels = labels
        self.grid_sizes = list(grid_sizes)
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def get(self, idx: int, rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
        img = np.asarray(self.images[idx], np.float32)  # (F,H,W) as channels
        lbl3d = np.asarray(self.labels[idx])
        combined = np.zeros(lbl3d.shape[-2:], np.int64)
        for c in range(1, NUM_CLASSES):
            combined[np.any(lbl3d == c, axis=0)] = c
        lbl = sanitize_labels(combined)
        if self.transform is not None:
            img, lbl = self.transform(img, lbl, self.grid_sizes[idx], rng)
            lbl = sanitize_labels(lbl)
        return img, lbl


class _Prefetcher:
    """Background thread: host batch assembly + async device_put, depth-2
    double buffering."""

    def __init__(self, gen, depth: int = 2, device_put: bool = True):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._device_put = device_put
        self._thread = threading.Thread(target=self._run, args=(gen,), daemon=True)
        self._err = None
        self._thread.start()

    def _run(self, gen):
        try:
            for item in gen:
                if self._device_put:
                    item = jax.device_put(item)
                self._q.put(item)
        except Exception as e:  # surface worker errors on the consumer side
            self._err = e
        finally:
            self._q.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class SpcctDataModule3D:
    """Datamodule (reference MultiDicomDataModule3D, datasets.py:280-364).

    setup(): load all configured scans → concat → per-sample grid sizes →
    coverage-aware 80/20 split (np seed 42) → train aug (stamp on) / val
    identity / test raw from the held-out scan. Batches are (B,F,H,W,1)
    channels-last float32 + (B,F,H,W) int64 labels.
    """

    def __init__(self, configs, batch_size: int = BATCH_SIZE, num_frames: int = NUM_FRAMES,
                 patch_hw: Optional[int] = None):
        self.configs = configs
        self.batch_size = batch_size
        self.num_frames = num_frames
        self.patch_hw = patch_hw  # optional random (patch_hw x patch_hw) crop for patch training
        self.train_set = self.val_set = self.test_set = None

    dataset_cls = SpcctDataset3D

    def setup(self, stage: Optional[str] = None):
        if stage in (None, "fit") and self.train_set is None:
            all_imgs, all_lbls = [], []
            for cfg in self.configs:
                imgs, lbls = load_config_set(cfg, self.num_frames)
                all_imgs.append(imgs)
                all_lbls.append(lbls)
            X = np.concatenate(all_imgs, axis=0)
            Y = np.concatenate(all_lbls, axis=0)
            G = generate_cumulative_grid_sizes(len(X), 10, 0.3,
                                               rng=np.random.default_rng(0))
            tr_x, tr_y, tr_g, val_x, val_y, val_g, _, _, _ = ensure_all_classes_in_training(
                X, Y, G, NUM_CLASSES, test_size=0.2, val_size=1.0, random_state=42
            )
            self.train_set = self.dataset_cls(tr_x, tr_y, tr_g, transform=TrainGridAug())
            self.val_set = self.dataset_cls(val_x, val_y, val_g, transform=identity_aug())
        if stage in (None, "test") and self.test_set is None:
            test_imgs, test_lbls = load_config_set(TEST_SET, self.num_frames)
            test_g = generate_cumulative_grid_sizes(
                len(test_imgs), GRID_SIZE, 0.3, rng=np.random.default_rng(1))
            self.test_set = self.dataset_cls(test_imgs, test_lbls, test_g, transform=None)

    # ── batch iterators ────────────────────────────────────────
    def _batches(self, ds, indices: np.ndarray, rng: np.random.Generator,
                 batch_size: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for start in range(0, len(indices), batch_size):
            chunk = indices[start:start + batch_size]
            imgs, lbls = [], []
            for i in chunk:
                im, lb = ds.get(int(i), rng)
                if self.patch_hw is not None and im.shape[-1] > self.patch_hw:
                    H, W = im.shape[-2:]
                    ph = int(rng.integers(0, H - self.patch_hw + 1))
                    pw = int(rng.integers(0, W - self.patch_hw + 1))
                    im = im[..., ph:ph + self.patch_hw, pw:pw + self.patch_hw]
                    lb = lb[..., ph:ph + self.patch_hw, pw:pw + self.patch_hw]
                imgs.append(im)
                lbls.append(lb)
            x = np.stack(imgs)[..., None].astype(np.float32)  # (B,F,H,W,1) / 2D: (B,C,H,W,1)
            y = np.stack(lbls).astype(np.int32)
            if self.use_vmi and x.ndim == 5:
                x, y = self._apply_vmi(x, y)
            yield x, y

    # VMI preprocessing (reference helpers.py:915-943; imported by the
    # reference's datasets.py:29-33 but never called there — this wiring
    # defines the runtime behavior when USE_VMI / SPCCT_USE_VMI=1 is set).
    use_vmi = USE_VMI

    @staticmethod
    def _apply_vmi(x: np.ndarray, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """x (B,F,H,W,1) → (B,D,H,W,1) virtual monoenergetic stack. Labels are
        depth-aligned: if D != F they are collapsed over frames (per-class
        any-over-frames, same rule as the 2D dataset) and broadcast to D."""
        x2 = apply_vmi_np(x, VMI_WEIGHTS, VMI_CLIP, return_depth=VMI_RETURN_DEPTH)
        D, F = x2.shape[1], y.shape[1]
        if D != F:
            combined = np.zeros((y.shape[0],) + y.shape[2:], y.dtype)
            for c in range(1, NUM_CLASSES):
                combined[np.any(y == c, axis=1)] = c
            combined[np.all(y == IGNORE_INDEX, axis=1)] = IGNORE_INDEX
            y = np.repeat(combined[:, None], D, axis=1)
        return x2, y

    def train_batches(self, seed: int, epoch: int, prefetch: bool = True):
        """Fresh shuffle + fresh augmentation stream every epoch (matches the
        reference's reload_dataloaders_every_n_epochs=1, train.py:1502)."""
        rng = np.random.default_rng((seed, epoch, 0xA5))
        idx = rng.permutation(len(self.train_set))
        gen = self._batches(self.train_set, idx, rng, self.batch_size)
        return _Prefetcher(gen) if prefetch else gen

    # ── device-resident mode ───────────────────────────────────
    # The tunneled host→device link moves ~41 MB/s (BASELINE.md round-2), so
    # per-step batch shipping dominates the train step. In device mode the
    # whole train/val split lives in HBM and only per-sample augmentation
    # parameters (~5 KB/step) cross the link; data/device_aug.py applies them
    # in a jitted gather/elementwise pass.
    _dev = None

    def device_capable(self) -> bool:
        if self.use_vmi or self.patch_hw is not None or self.train_set is None:
            return False
        s = np.asarray(self.train_set.images[0]).shape
        return s[-1] == s[-2]  # rot90 under jit needs square H == W

    def setup_device(self):
        if self._dev is not None:
            return
        import jax.numpy as jnp

        def push(ds):
            img = np.stack([np.asarray(i, np.float32) for i in ds.images])
            lbl = np.stack([np.asarray(l) for l in ds.labels])
            # labels live in HBM as uint8 (13 classes + IGNORE_INDEX=255 all
            # fit) — 4x less resident memory than int32 at full resolution
            # (~240 MB back on the 16 GB budget for the depth-padded
            # variants); widened to int32 per-batch after the gather
            lbl = np.where(lbl >= NUM_CLASSES, IGNORE_INDEX, lbl).astype(np.uint8)
            return jax.device_put(jnp.asarray(img)), jax.device_put(jnp.asarray(lbl))

        self._dev = {"train": push(self.train_set), "val": push(self.val_set)}

    def train_param_batches(self, seed: int, epoch: int):
        """Device-mode counterpart of train_batches: yields (idx, params)
        pairs; same epoch shuffle stream, augmentation decisions drawn from
        the same generator (different stream position than the host path —
        documented in device_aug.py)."""
        from .device_aug import draw_params

        rng = np.random.default_rng((seed, epoch, 0xA5))
        idx = rng.permutation(len(self.train_set))
        aug = self.train_set.transform
        H, W = np.asarray(self.train_set.images[0]).shape[-2:]
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start:start + self.batch_size]
            plist = [draw_params(aug, H, W, self.train_set.grid_sizes[int(i)],
                                 rng, noise_seed=int(rng.integers(0, 2 ** 32)))
                     for i in chunk]
            params = {k: np.stack([p[k] for p in plist]) for k in plist[0]}
            yield np.asarray(chunk, np.int32), params

    def val_index_batches(self):
        n = len(self.val_set)
        for start in range(0, n, self.batch_size):
            yield np.arange(start, min(start + self.batch_size, n), dtype=np.int32)

    def val_batches(self, prefetch: bool = True):
        rng = np.random.default_rng(0)
        idx = np.arange(len(self.val_set))
        gen = self._batches(self.val_set, idx, rng, self.batch_size)
        return _Prefetcher(gen) if prefetch else gen

    def test_batches(self, prefetch: bool = True):
        if self.test_set is None:
            raise AttributeError("Test dataset not set. Did setup('test') run?")
        rng = np.random.default_rng(0)
        idx = np.arange(len(self.test_set))
        gen = self._batches(self.test_set, idx, rng, self.batch_size)
        return _Prefetcher(gen) if prefetch else gen


class SpcctDataModule2D(SpcctDataModule3D):
    """2D datamodule (reference MultiDicomDataModule2D, datasets.py:367-422).
    Batches are (B,C=F,H,W) → reshaped to (B,H,W,C) channels-last by 2D
    recipes; labels (B,H,W)."""

    dataset_cls = SpcctDataset2D


# Back-compat aliases matching the reference's public names
# (config.py:131-143).
MultiDicomDataModule3D = SpcctDataModule3D
MultiDicomDataModule2D = SpcctDataModule2D
