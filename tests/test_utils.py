import numpy as np
import pytest

import jax.numpy as jnp

from spcct_tpu.utils.outputs import select_main_logits
from spcct_tpu.data.vmi import apply_vmi_preprocess
from spcct_tpu.analysis.scan_labels import presence_vector


def test_select_main_logits_variants():
    main = jnp.zeros((1, 5, 32, 32, 13))
    aux = jnp.zeros((1, 5, 16, 16, 13))
    assert select_main_logits(main) is main
    assert select_main_logits((main, aux)) is main
    assert select_main_logits([aux, main]) is main
    assert select_main_logits({"aux": aux, "out": main}) is main


def test_vmi_preprocess_single_target():
    x = jnp.ones((2, 5, 8, 8, 1))
    out = apply_vmi_preprocess(x, [[0.1, 0.2, 0.4, 0.2, 0.1]], return_depth=3)
    assert out.shape == (2, 3, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_vmi_preprocess_multi_k():
    x = jnp.ones((1, 5, 4, 4, 1))
    w = [[1, 0, 0, 0, 0], [0, 0, 0, 0, 1]]
    out = apply_vmi_preprocess(x, w)
    assert out.shape == (1, 2, 4, 4, 1)


def test_vmi_np_matches_jnp():
    from spcct_tpu.data.vmi import apply_vmi_np
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 8, 8, 1)).astype(np.float32)
    w = [[0.1, 0.2, 0.4, 0.2, 0.1]]
    a = apply_vmi_np(x, w, clip=(-1.0, 1.0), return_depth=5)
    b = np.asarray(apply_vmi_preprocess(jnp.asarray(x), w, clip=(-1.0, 1.0),
                                        return_depth=5))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_datamodule_vmi_wiring():
    """USE_VMI: batches become (B,D,H,W,1) VMIs with depth-aligned labels
    (per-class any-over-frames collapse when D != F)."""
    from spcct_tpu.data.pipeline import SpcctDataModule3D, SpcctDataset3D

    imgs = np.random.default_rng(0).standard_normal((4, 5, 16, 16)).astype(np.float32)
    lbls = np.zeros((4, 5, 16, 16), np.int64)
    lbls[:, 2, :4, :4] = 7  # class present in one frame only
    dm = SpcctDataModule3D.__new__(SpcctDataModule3D)
    dm.batch_size = 2
    dm.patch_hw = None
    dm.use_vmi = True
    ds = SpcctDataset3D(imgs, lbls, [2] * 4, transform=None)
    x, y = next(iter(dm._batches(ds, np.arange(2), np.random.default_rng(0), 2)))
    assert x.shape == (2, 1, 16, 16, 1)   # VMI_RETURN_DEPTH=1
    assert y.shape == (2, 1, 16, 16)
    assert (y[:, 0, :4, :4] == 7).all()   # frame-collapsed label survives


def test_wrap_forward_normalizes_deep_supervision():
    """A module returning (main, aux) deep-supervision tuples is normalized to
    the main logits by the forward wrapper (reference train.py:160-187)."""
    import flax.linen as nn
    from spcct_tpu.models.recipes import Recipe, _base_lit_loss

    class DeepSup(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            main = nn.Conv(13, (1, 1, 1))(x)
            aux = main[:, :, ::2, ::2]
            return main, aux

    rec = Recipe(name="ds", module=DeepSup(), loss=_base_lit_loss,
                 opt_kind="adam", lr=1e-3)
    x = jnp.zeros((1, 5, 8, 8, 1))
    import jax
    variables = rec.module.init(jax.random.PRNGKey(0), x)
    fwd = rec.wrap_forward(rec.module.apply)
    y, _ = fwd(variables, x, train=False, mutable=False)
    assert y.shape == (1, 5, 8, 8, 13)


def test_presence_vector_threshold():
    pred = np.zeros((5, 64, 64), np.int64)
    pred[:, :20, :20] = 3   # 2000 voxels of class 3
    pred[0, 0, :5] = 7      # 5 voxels of class 7 (below threshold)
    v = presence_vector(pred, num_classes=13, min_vox=800)
    assert v[3] == 1 and v[7] == 0 and v[0] == 1


def test_unified_loss_override():
    from spcct_tpu.models.recipes import build_registry
    from spcct_tpu.train.unified import apply_unified_loss

    recipes = build_registry()
    unified = apply_unified_loss(recipes, "dice_ce_nnunet")
    logits = jnp.asarray(np.random.default_rng(0)
                         .standard_normal((1, 2, 4, 4, 13)).astype(np.float32))
    labels = jnp.zeros((1, 2, 4, 4), jnp.int32)
    losses = {name: float(r.loss(logits, labels)[0]) for name, r in unified.items()}
    assert len(set(round(v, 6) for v in losses.values())) == 1  # all identical


def test_unified_optimizer_override():
    from spcct_tpu.models.recipes import build_registry
    from spcct_tpu.train.unified import apply_unified_optimizer

    recipes = apply_unified_optimizer(build_registry(), lr=3e-4)
    for r in recipes.values():
        assert r.lr == 3e-4 and not r.plateau
