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
