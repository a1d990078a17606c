# Fast-wgrad conv: forward and both gradients must match XLA's native conv.
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spcct_tpu.ops.fast_conv import conv3d_fast, _conv


def _data(kshape=(3, 3, 3, 4, 6), xshape=(2, 5, 8, 8, 4), seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(xshape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(kshape).astype(np.float32))
    return x, w


def test_forward_matches_native():
    x, w = _data()
    np.testing.assert_allclose(np.asarray(conv3d_fast(x, w)),
                               np.asarray(_conv(x, w)), atol=1e-4)


@pytest.mark.parametrize("kshape", [(3, 3, 3, 4, 6), (1, 3, 3, 3, 5)])
def test_gradients_match_native(kshape):
    x, w = _data(kshape, (1, 5, 6, 6, kshape[3]))

    def loss_fast(x, w):
        return jnp.sum(conv3d_fast(x, w) ** 2)

    def loss_native(x, w):
        return jnp.sum(_conv(x, w) ** 2)

    gx1, gw1 = jax.grad(loss_fast, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_native, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-3)


def test_conv3d_layer_uses_same_param_tree():
    """Param layout must stay Conv_0/{kernel,bias} (checkpoint compat)."""
    from spcct_tpu.models.layers import Conv3d
    m = Conv3d(8, (3, 3, 3))
    x = jnp.zeros((1, 5, 8, 8, 2))
    v = m.init(jax.random.PRNGKey(0), x)
    assert set(v["params"].keys()) == {"Conv_0"}
    assert v["params"]["Conv_0"]["kernel"].shape == (3, 3, 3, 2, 8)
    assert v["params"]["Conv_0"]["bias"].shape == (8,)
    y = m.apply(v, x)
    assert y.shape == (1, 5, 8, 8, 8)
