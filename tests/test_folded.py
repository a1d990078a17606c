# Parity tests: the depth-folded SPFF execution engine must compute exactly
# the same function as the standard UNet3DSpectralCore module.
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spcct_tpu.models.spff import UNet3DSpectralCore
from spcct_tpu.models.spff_folded import (
    banded_kernel_2d,
    conv_transpose_folded,
    fold,
    instance_norm_folded,
    make_folded_apply,
    unfold,
)


def test_fold_unfold_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 8, 8, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unfold(fold(x), 5)), np.asarray(x))


def test_banded_kernel_matches_conv3d(rng):
    D, Ci, Co = 5, 4, 6
    x = jnp.asarray(rng.standard_normal((1, D, 8, 8, Ci)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((3, 3, 3, Ci, Co)).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(x.shape, w3.shape, ("NDHWC", "DHWIO", "NDHWC"))
    want = jax.lax.conv_general_dilated(x, w3, (1, 1, 1), [(1, 1)] * 3,
                                        dimension_numbers=dn)
    w2 = banded_kernel_2d(w3, D)
    xf = fold(x)
    dn2 = jax.lax.conv_dimension_numbers(xf.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    got = jax.lax.conv_general_dilated(xf, w2, (1, 1), [(1, 1)] * 2,
                                       dimension_numbers=dn2)
    np.testing.assert_allclose(np.asarray(unfold(got, D)), np.asarray(want),
                               atol=1e-4)


def test_banded_kernel_ksd1(rng):
    D, Ci, Co = 5, 3, 2
    x = jnp.asarray(rng.standard_normal((1, D, 6, 6, Ci)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((1, 3, 3, Ci, Co)).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(x.shape, w3.shape, ("NDHWC", "DHWIO", "NDHWC"))
    want = jax.lax.conv_general_dilated(x, w3, (1, 1, 1),
                                        [(0, 0), (1, 1), (1, 1)],
                                        dimension_numbers=dn)
    got = jax.lax.conv_general_dilated(
        fold(x), banded_kernel_2d(w3, D), (1, 1), [(1, 1)] * 2,
        dimension_numbers=jax.lax.conv_dimension_numbers(
            (1, 6, 6, D * Ci), (3, 3, D * Ci, D * Co), ("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(np.asarray(unfold(got, D)), np.asarray(want),
                               atol=1e-4)


def test_instance_norm_folded_matches_flax(rng):
    from flax import linen as nn
    D, C = 5, 8
    x = jnp.asarray(rng.standard_normal((2, D, 6, 6, C)).astype(np.float32))
    gn = nn.GroupNorm(num_groups=C, epsilon=1e-5)
    v = gn.init(jax.random.PRNGKey(0), x)
    scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    v = {"params": {"scale": scale, "bias": bias}}
    want = gn.apply(v, x)
    got = unfold(instance_norm_folded(fold(x), scale, bias, D), D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_conv_transpose_folded_matches_flax(rng):
    from flax import linen as nn
    D, Ci, Co = 5, 4, 6
    x = jnp.asarray(rng.standard_normal((1, D, 6, 6, Ci)).astype(np.float32))
    ct = nn.ConvTranspose(Co, (1, 2, 2), (1, 2, 2), padding="VALID")
    v = ct.init(jax.random.PRNGKey(0), x)
    want = ct.apply(v, x)
    got = conv_transpose_folded(fold(x), v["params"]["kernel"],
                                v["params"]["bias"], D)
    np.testing.assert_allclose(np.asarray(unfold(got, D)), np.asarray(want),
                               atol=1e-4)


@pytest.mark.parametrize("flags", [
    dict(use_se=False, use_specse=False, use_efilm=False, use_fouriergate=False),
    dict(use_se=True, use_specse=True, use_efilm=False, use_fouriergate=False),
    dict(use_se=True, use_specse=True, use_efilm=True, use_fouriergate=True),
])
def test_folded_apply_matches_standard(flags, rng):
    m = UNet3DSpectralCore(num_classes=13, base=4, ksd=3, num_frames=5, **flags)
    x = jnp.asarray(rng.standard_normal((1, 5, 16, 16, 1)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(v, x)
    folded = make_folded_apply(m)
    got = folded(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_folded_apply_gradients_match(rng):
    m = UNet3DSpectralCore(num_classes=4, base=4, ksd=3, num_frames=5,
                           use_se=True, use_specse=True, use_efilm=True,
                           use_fouriergate=True)
    x = jnp.asarray(rng.standard_normal((1, 5, 8, 8, 1)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    folded = make_folded_apply(m)

    g1 = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(v["params"])
    g2 = jax.grad(lambda p: jnp.sum(folded({"params": p}, x) ** 2))(v["params"])
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {jax.tree_util.keystr(k): a for k, a in jax.tree_util.tree_leaves_with_path(g2)}
    for k, a in flat1:
        b = flat2[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-3, err_msg=jax.tree_util.keystr(k))
