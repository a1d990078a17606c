# DICOM round-trip tests: synthetic multi-frame DICOMs written to tmp →
# load_scan end-to-end (first-num_frames rule, 1300²→512² antialiased bilinear
# resize, ROI label painting) — reference helpers.py:132-211 semantics, with
# no pydicom dependency (data/dicom_lite.py is the codec under test; pydicom
# cross-checks run when it happens to be installed).
import numpy as np
import pytest

from spcct_tpu.data.dicom_lite import read_dicom, write_dicom


@pytest.mark.parametrize("dtype", [np.uint16, np.int16, np.uint8])
def test_dicom_lite_roundtrip(tmp_path, dtype, rng):
    info = np.iinfo(dtype)
    frames = rng.integers(info.min, info.max, (7, 40, 52)).astype(dtype)
    p = tmp_path / "x.dcm"
    write_dicom(p, frames)
    back = read_dicom(p)
    assert back.dtype == dtype and back.shape == (7, 40, 52)
    np.testing.assert_array_equal(back, frames)


def test_dicom_lite_single_frame(tmp_path, rng):
    frame = rng.integers(0, 4096, (33, 21)).astype(np.uint16)
    p = tmp_path / "one.dcm"
    write_dicom(p, frame)
    back = read_dicom(p)
    assert back.shape == (33, 21)          # pydicom contract: 2D when N==1
    np.testing.assert_array_equal(back, frame)


def test_dicom_lite_pydicom_crosscheck(tmp_path, rng):
    pydicom = pytest.importorskip("pydicom")
    frames = rng.integers(0, 4000, (3, 16, 16)).astype(np.uint16)
    p = tmp_path / "x.dcm"
    write_dicom(p, frames)
    ds = pydicom.dcmread(p)
    np.testing.assert_array_equal(ds.pixel_array, frames)


def test_load_scan_dicom_end_to_end(tmp_path, monkeypatch, rng):
    """Full loader path on written DICOMs: recursive .dcm discovery, first-5-
    frames rule (7 stored), 1300²→512² resize, ROI labels painted at 512²
    (reference helpers.py:169-207)."""
    from spcct_tpu import config
    from spcct_tpu.data import loader
    from spcct_tpu.data.rasterize import paint_labels

    # conftest shrinks IMAGE sizes via env for synth; the DICOM path always
    # targets config.IMAGE_HEIGHT/WIDTH (512) — keep it real here.
    H, W = config.IMAGE_HEIGHT, config.IMAGE_WIDTH
    assert (H, W) == (512, 512)

    sub = tmp_path / "scan" / "nested"
    sub.mkdir(parents=True)
    stacks = []
    for i in range(2):
        frames = rng.integers(0, 3000, (7, 1300, 1300)).astype(np.uint16)
        write_dicom(sub / f"s{i}.dcm", frames)
        stacks.append(frames)
    (sub / "ignored.txt").write_text("not a dicom")

    cfg = dict(config.dataset_configs[0])
    cfg["dir"] = tmp_path / "scan"
    imgs, lbls = loader.load_scan(cfg, num_frames=5)

    assert imgs.shape == (2, 5, H, W) and imgs.dtype == np.float32
    assert lbls.shape == (2, 5, H, W) and lbls.dtype == np.int64

    # resize parity: torchvision TF.resize on tensors == antialiased bilinear
    # (the torch oracle); loader must match within float tolerance
    torch = pytest.importorskip("torch")
    t = torch.tensor(stacks[0][0].astype(np.float32))[None, None]
    want = torch.nn.functional.interpolate(
        t, (H, W), mode="bilinear", antialias=True)[0, 0].numpy()
    np.testing.assert_allclose(imgs[0, 0], want, atol=2e-3, rtol=1e-5)

    # labels: every frame carries the painted ROI mask for this scan config
    want_lbl = paint_labels(cfg, (H, W))
    for f in range(5):
        np.testing.assert_array_equal(lbls[0, f], want_lbl)
    assert set(np.unique(want_lbl)) > {0}  # ROIs actually painted
