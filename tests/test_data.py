# Data pipeline tests: rasterizer parity, grid sizes, stripe shuffle,
# augmentation semantics, split coverage (reference innovative3D/datasets.py,
# helpers.py:126-289).
import numpy as np
import pytest

from spcct_tpu.config import NUM_CLASSES, dataset_configs
from spcct_tpu.data.augment import (
    TrainGridAug,
    generate_cumulative_grid_sizes,
    grid_boundaries,
    grid_shuffle_xy,
    stripe_permutation,
)
from spcct_tpu.data.pipeline import (
    SpcctDataModule3D,
    ensure_all_classes_in_training,
    sanitize_labels,
)
from spcct_tpu.data.rasterize import paint_labels, scale_rois, _paint_numpy


def test_rasterizer_matches_per_pixel_reference():
    """Brute-force per-pixel ellipse loop (reference helpers.py:126-129,
    202-206) vs the vectorized painter."""
    cfg = dataset_configs[0]
    H = W = 128
    rois = scale_rois(cfg, (H, W))
    want = np.zeros((H, W), np.int64)
    for (x0, y0, w0, h0, lab) in rois:
        cx, cy = x0 + w0 / 2, y0 + h0 / 2
        a, b = w0 / 2, h0 / 2
        for px in range(x0, x0 + w0):
            for py in range(y0, y0 + h0):
                if ((px - cx) ** 2) / (a * a) + ((py - cy) ** 2) / (b * b) <= 1:
                    want[py, px] = lab
    got = paint_labels(cfg, (H, W))
    np.testing.assert_array_equal(got, want)


def test_rasterizer_all_rois_present():
    cfg = dataset_configs[3]  # held-out scan with iodine inserts
    lbl = paint_labels(cfg)
    present = set(np.unique(lbl).tolist())
    expected = {lab for (_, _, _, _, lab) in scale_rois(cfg)}
    assert expected <= present


def test_grid_boundaries_match_reference_math():
    # reference datasets.py:56-58: n=512, g=5 → [0,102,204,307,409,512]
    assert grid_boundaries(512, 5) == [0, 102, 204, 307, 409, 512]


def test_stripe_permutation_is_group_preserving(rng):
    n, g = 512, 5
    idx = stripe_permutation(n, g, rng)
    assert sorted(idx.tolist()) == list(range(n))
    bounds = grid_boundaries(n, g)
    sizes = {}
    for i in range(g):
        t0, t1 = bounds[i], bounds[i + 1]
        src = idx[t0:t1]
        # each target stripe is a contiguous source stripe of the same size
        assert np.all(np.diff(src) == 1)
        s0 = int(src[0])
        assert (s0, s0 + (t1 - t0)) in [(bounds[j], bounds[j + 1]) for j in range(g)]
        sizes.setdefault(t1 - t0, []).append(s0)


def test_grid_shuffle_preserves_image_label_alignment(rng):
    img = rng.standard_normal((5, 64, 64)).astype(np.float32)
    lbl = rng.integers(0, 13, (5, 64, 64))
    # encode pixel identity in both; after shuffle they must still align
    tag = np.arange(64 * 64).reshape(1, 64, 64).repeat(5, 0)
    i2, l2 = grid_shuffle_xy(tag.astype(np.float32), tag.copy(), 4, 4, rng)
    np.testing.assert_array_equal(i2.astype(np.int64), l2)


def test_grid_shuffle_is_permutation(rng):
    img = np.arange(5 * 60 * 60, dtype=np.float32).reshape(5, 60, 60)
    out, _ = grid_shuffle_xy(img, None, 7, 7, rng)
    assert sorted(out.ravel().tolist()) == sorted(img.ravel().tolist())


def test_generate_grid_sizes_length_and_range(rng):
    gs = generate_cumulative_grid_sizes(100, 10, 0.3, rng)
    assert len(gs) == 100
    assert set(gs) <= set(range(1, 11))


def test_train_aug_stamp_and_determinism():
    img = np.random.default_rng(1).standard_normal((5, 64, 64)).astype(np.float32)
    lbl = np.random.default_rng(2).integers(0, 13, (5, 64, 64))
    aug = TrainGridAug()
    a1 = aug(img.copy(), lbl.copy(), 4, np.random.default_rng(7))
    a2 = aug(img.copy(), lbl.copy(), 4, np.random.default_rng(7))
    np.testing.assert_array_equal(a1[0], a2[0])
    np.testing.assert_array_equal(a1[1], a2[1])
    # p_grid=1 with gs=4 → shuffle ran → stamp present on frame 0
    stamp_region = a1[0][0, :32, :32]
    assert stamp_region.min() > img.max()  # stamped values exceed the original range


def test_identity_val_aug_is_identity():
    from spcct_tpu.data.augment import identity_aug
    img = np.random.default_rng(1).standard_normal((5, 32, 32)).astype(np.float32)
    lbl = np.random.default_rng(2).integers(0, 13, (5, 32, 32))
    out_i, out_l = identity_aug()(img.copy(), lbl.copy(), 5, np.random.default_rng(0))
    np.testing.assert_array_equal(out_i, img)
    np.testing.assert_array_equal(out_l, lbl)


def test_sanitize_labels():
    lbl = np.asarray([[0, 5, 12, 13, 200, -1]])
    out = sanitize_labels(lbl, 13, 255)
    np.testing.assert_array_equal(out, [[0, 5, 12, 255, 255, 255]])


def test_split_guarantees_class_coverage(rng):
    N = 20
    X = rng.standard_normal((N, 2, 8, 8)).astype(np.float32)
    Y = np.zeros((N, 2, 8, 8), np.int64)
    # scatter classes so some are rare
    for c in range(1, 6):
        Y[c % N, 0, 0, c] = c
    G = list(rng.integers(1, 11, N))
    tr_x, tr_y, tr_g, val_x, val_y, val_g, _, _, _ = ensure_all_classes_in_training(
        X, Y, G, num_classes=6, test_size=0.2, val_size=1.0, random_state=42
    )
    assert len(tr_x) + len(val_x) == N
    for c in range(1, 6):
        assert any((y == c).any() for y in tr_y), f"class {c} missing from train"


def test_datamodule_synthetic_end_to_end():
    from spcct_tpu.config import trainval_sets
    dm = SpcctDataModule3D(trainval_sets[:2], batch_size=2, num_frames=5)
    dm.setup("fit")
    x, y = next(iter(dm.train_batches(seed=0, epoch=0, prefetch=False)))
    assert x.ndim == 5 and x.shape[-1] == 1 and x.shape[1] == 5
    assert y.shape == x.shape[:-1]
    assert x.dtype == np.float32 and y.dtype == np.int32
    dm.setup("test")
    xt, yt = next(iter(dm.test_batches(prefetch=False)))
    assert xt.shape[1] == 5
