# Native C++ data-engine parity (skipped when libspcct_data.so isn't built;
# build with spcct_tpu/runtime/build_native.sh).
import numpy as np
import pytest

from spcct_tpu.config import dataset_configs
from spcct_tpu.data.rasterize import _paint_numpy, scale_rois


def _lib():
    from spcct_tpu.runtime.native import lib
    return lib


@pytest.mark.skipif(_lib() is None, reason="native lib not built")
def test_native_rasterizer_matches_numpy():
    lib = _lib()
    for cfg in dataset_configs:
        H = W = 256
        rois = scale_rois(cfg, (H, W))
        want = _paint_numpy(rois, H, W)
        out = np.zeros((H, W), np.int64)
        arr = np.asarray(rois, np.int64).reshape(-1, 5)
        lib.paint_ellipses(out, H, W, arr, arr.shape[0])
        np.testing.assert_array_equal(out, want)


@pytest.mark.skipif(_lib() is None, reason="native lib not built")
def test_native_stamp_and_noise_jitter_only():
    lib = _lib()
    img = np.random.default_rng(0).standard_normal((5, 32, 32)).astype(np.float32)
    got = img.copy()
    lib.stamp_and_noise(got, 5, 32, 32, np.float32(1.1), np.float32(0.02),
                        np.float32(0.0), 0)
    np.testing.assert_allclose(got, img * 1.1 + 0.02, atol=1e-6)


def test_native_aug_wiring_jitter_parity(monkeypatch):
    """SPCCT_NATIVE_AUG=1 routes TrainGridAug's jitter through the C++ fused
    pass; jitter-only (no noise) must match the numpy path to float32
    rounding (the -O3 build fuses multiply-add, so bit equality is one ulp
    off for ~20% of elements)."""
    import importlib
    import numpy as np
    from spcct_tpu.runtime.native import lib
    if lib is None:
        import pytest
        pytest.skip("native lib not built")
    from spcct_tpu.data import augment as A

    img = np.random.default_rng(0).standard_normal((5, 16, 16)).astype(np.float32)
    lbl = np.zeros((5, 16, 16), np.int64)
    # jitter always, noise never, geometry off
    aug = A.TrainGridAug(p_grid=0.0, flip_p=0.0, rot90_p=0.0,
                         jitter_p=1.0, noise_p=0.0, stamp_top_left=False)
    out_np, _ = aug(img.copy(), lbl, gs=1, rng=np.random.default_rng(42))
    monkeypatch.setattr(A, "_NATIVE_AUG", True)
    out_nat, _ = aug(img.copy(), lbl, gs=1, rng=np.random.default_rng(42))
    np.testing.assert_allclose(out_np, out_nat, rtol=2e-6, atol=5e-7)
