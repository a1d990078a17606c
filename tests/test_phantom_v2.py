# phantom_v2.py: the hard synthetic phantom (VERDICT r3 task 4) — shape
# contract, determinism, per-slice geometric jitter, partial-volume
# boundaries, and loader routing via SPCCT_PHANTOM=v2.
from __future__ import annotations

import numpy as np

from spcct_tpu.config import dataset_configs
from spcct_tpu.data.loader import _MATERIAL_SPECTRA
from spcct_tpu.data.phantom_v2 import synth_scan_v2


def _gen(seed=7, hw=(64, 64), n=3):
    return synth_scan_v2(dataset_configs[0], 5, n, hw, seed, _MATERIAL_SPECTRA)


def test_shapes_and_dtypes():
    imgs, lbls = _gen()
    assert imgs.shape == (3, 5, 64, 64) and imgs.dtype == np.float32
    assert lbls.shape == (3, 5, 64, 64) and lbls.dtype == np.int64
    assert np.isfinite(imgs).all()
    # CT-number-like scaling, same convention as v1 (x1000)
    assert 200.0 < np.abs(imgs).max() < 5000.0


def test_deterministic_and_seed_sensitive():
    a_i, a_l = _gen(seed=7)
    b_i, b_l = _gen(seed=7)
    c_i, _ = _gen(seed=8)
    np.testing.assert_array_equal(a_l, b_l)
    np.testing.assert_array_equal(a_i, b_i)
    assert not np.array_equal(a_i, c_i)


def test_per_slice_geometric_jitter():
    """Label maps must differ between slices (anti-memorization) while
    keeping the same class set."""
    _, lbls = _gen(hw=(128, 128))
    assert (lbls[0, 0] != lbls[1, 0]).mean() > 0.002
    assert set(np.unique(lbls[0])) == set(np.unique(lbls[1]))
    # frames within a slice share the label map
    np.testing.assert_array_equal(lbls[0, 0], lbls[0, 3])


def test_partial_volume_boundaries():
    """Interiors are near their material spectrum; boundary pixels mix.
    v1 was piecewise constant (modulo noise); v2 must not be."""
    imgs, lbls = synth_scan_v2(dataset_configs[0], 5, 1, (256, 256), 3,
                               _MATERIAL_SPECTRA)
    img, lbl = imgs[0] / 1000.0, lbls[0, 0]
    # boundary = label-transition pixels
    edge = np.zeros_like(lbl, bool)
    edge[1:] |= lbl[1:] != lbl[:-1]
    edge[:, 1:] |= lbl[:, 1:] != lbl[:, :-1]
    interior = ~edge
    # pick HA800 (label 1, the brightest rod): boundary mean must sit
    # strictly between the rod interior mean and the surround
    rod = lbl == 1
    if rod.sum() > 50:
        rod_int = rod & interior
        rod_edge = rod & edge
        assert rod_edge.sum() > 0
        hi = img[0][rod_int].mean()
        lo = img[0][(~rod) & interior].mean()
        mid = img[0][rod_edge].mean()
        assert lo < mid < hi


def test_loader_routing_env(monkeypatch):
    from spcct_tpu.data import loader

    cfg = dict(dataset_configs[0])
    cfg["dir"] = "/nonexistent/scan_dir"
    monkeypatch.setenv("SPCCT_PHANTOM", "v2")
    monkeypatch.setenv("SPCCT_SYNTH_HW", "64")
    i2, l2 = loader.load_scan(cfg, 5)
    monkeypatch.setenv("SPCCT_PHANTOM", "v1")
    i1, l1 = loader.load_scan(cfg, 5)
    # v1 labels are slice-constant; v2's jitter so the routing is observable
    assert all((l1[s, 0] == l1[0, 0]).all() for s in range(l1.shape[0]))
    assert any((l2[s, 0] != l2[0, 0]).any() for s in range(1, l2.shape[0]))
    assert i2.shape[1:] == i1.shape[1:]


def test_loader_seed_is_process_stable():
    """The scan seed derives from crc32(name), not salted hash()."""
    import zlib

    from spcct_tpu.data import loader

    cfg = dict(dataset_configs[1])
    cfg["dir"] = "/nonexistent/scan_dir"
    expect = zlib.crc32(cfg["name"].encode()) % (2 ** 31)
    got_i, _ = loader.load_scan(cfg, 5)
    ref_i, _ = loader.synth_scan(
        cfg, 5, got_i.shape[0], got_i.shape[2:], expect)
    np.testing.assert_array_equal(got_i, ref_i)
