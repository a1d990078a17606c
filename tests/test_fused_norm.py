# Fused IN+lrelu: values and gradients must match flax GroupNorm + leaky_relu.
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from spcct_tpu.ops.fused_norm import instance_norm_lrelu


def _ref(x, scale, bias):
    gn = nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5)
    y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    return nn.leaky_relu(y, negative_slope=1e-2)


def _data(shape=(2, 5, 8, 8, 6), seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 2 + 0.5
    scale = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
    return x, scale, bias


def test_forward_matches_flax():
    x, scale, bias = _data()
    got = instance_norm_lrelu(x, scale, bias)
    want = _ref(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gradients_match_flax():
    x, scale, bias = _data(seed=1)

    def loss_fused(x, s, b):
        return jnp.sum(instance_norm_lrelu(x, s, b) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(_ref(x, s, b) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b, name in zip(g1, g2, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=2e-3, err_msg=name)


def test_spff_param_tree_unchanged_with_fusion():
    from spcct_tpu.models.spff import UNet3DSpectralCore
    m = UNet3DSpectralCore(num_classes=4, base=4, ksd=3)
    x = jnp.zeros((1, 5, 16, 16, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    gn = v["params"]["enc1"]["Norm3d_0"]["GroupNorm_0"]
    assert gn["scale"].shape == (4,) and gn["bias"].shape == (4,)
    y = m.apply(v, x)
    assert y.shape == (1, 5, 16, 16, 4)
