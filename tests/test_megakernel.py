# Parity tests for the fused IN+lrelu+conv megakernel
# (ops/pallas_conv.py conv3d_in_act) against the unfused composition
# instance_norm_lrelu (itself torch-parity-tested) + lax conv.
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcct_tpu.ops import pallas_conv as pc
from spcct_tpu.ops.fused_norm import instance_norm_lrelu


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-6)


def _ref(x, w, scale, bias):
    z = instance_norm_lrelu(x.astype(jnp.bfloat16), scale, bias)
    dn = jax.lax.conv_dimension_numbers(z.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    kd = w.shape[0]
    return jax.lax.conv_general_dilated(
        z, w.astype(jnp.bfloat16), (1, 1, 1),
        [(kd // 2, kd // 2), (1, 1), (1, 1)], dimension_numbers=dn)


@pytest.mark.parametrize("B,kd,cin,cout", [
    (1, 3, 8, 8),     # aligned channels
    (2, 3, 6, 12),    # cin pads 6→8, cout pads 12→16, per-sample stats
    (1, 1, 8, 16),    # kd=1 spectral form
])
def test_conv3d_in_act_parity(B, kd, cin, cout):
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((B, 5, 8, 128, cin)), jnp.bfloat16)
    w = jnp.asarray(0.2 * rng.standard_normal((kd, 3, 3, cin, cout)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.3 * rng.standard_normal(cin), jnp.float32)
    bias = jnp.asarray(0.2 * rng.standard_normal(cin), jnp.float32)

    y = pc.conv3d_in_act(x, w, scale, bias)
    yr = _ref(x, w, scale, bias)
    assert y.shape == yr.shape
    assert _rel_err(y, yr) < 3e-2

    g = jnp.asarray(rng.standard_normal(y.shape), jnp.float32)

    def loss_fused(x, w, s, b):
        return jnp.vdot(pc.conv3d_in_act(x, w, s, b).astype(jnp.float32), g)

    def loss_ref(x, w, s, b):
        return jnp.vdot(_ref(x, w, s, b).astype(jnp.float32), g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for name, a, b in zip(("dx", "dw", "dscale", "dbias"), gf, gr):
        assert _rel_err(a, b) < 4e-2, name


def test_double_conv_megakernel_module(monkeypatch):
    """DoubleConvSpectral with SPCCT_MEGAKERNEL=1: identical param tree to
    the plain module, matching forward and parameter gradients."""
    from spcct_tpu.models.spff import DoubleConvSpectral

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 5, 8, 128, 4)), jnp.float32)
    m = DoubleConvSpectral(features=8, ksd=3, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)

    def run(val):
        return m.apply(val, x)

    y_plain = run(v)
    g_plain = jax.grad(lambda v: jnp.sum(run(v).astype(jnp.float32) ** 2))(v)

    monkeypatch.setenv("SPCCT_MEGAKERNEL", "1")
    monkeypatch.setenv("SPCCT_MEGA_MINW", "128")
    v_mk = m.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_mk) == jax.tree_util.tree_structure(v)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(v),
            jax.tree_util.tree_leaves_with_path(v_mk)):
        assert p1 == p2 and a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    y_mk = run(v)
    g_mk = jax.grad(lambda v: jnp.sum(run(v).astype(jnp.float32) ** 2))(v)
    assert _rel_err(y_mk, y_plain) < 3e-2
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_mk),
            jax.tree_util.tree_leaves_with_path(g_plain)):
        assert _rel_err(a, b) < 5e-2, path


def test_conv3d_in_act_gspmd():
    """Megakernel under a data-sharded mesh: batch-partitioned (no
    all-gather), values and grads match the unsharded op."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import mesh_utils

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device backend")
    mesh = Mesh(mesh_utils.create_device_mesh((jax.device_count(),)), ("data",))
    rng = np.random.default_rng(17)
    B = jax.device_count()
    x = jnp.asarray(rng.standard_normal((B, 5, 8, 128, 8)), jnp.bfloat16)
    w = jnp.asarray(0.2 * rng.standard_normal((3, 3, 3, 8, 8)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.3 * rng.standard_normal(8), jnp.float32)
    bias = jnp.asarray(0.2 * rng.standard_normal(8), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 5, 8, 128, 8)), jnp.float32)

    def loss(x, w, s, b):
        return jnp.vdot(pc.conv3d_in_act(x, w, s, b).astype(jnp.float32), g)

    y1 = pc.conv3d_in_act(x, w, scale, bias)
    g1 = jax.grad(loss, argnums=(0, 1, 2, 3))(x, w, scale, bias)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    f = jax.jit(lambda x, w, s, b: pc.conv3d_in_act(x, w, s, b))
    y2 = f(xs, w, scale, bias)
    assert "all-gather" not in f.lower(xs, w, scale, bias).compile().as_text()
    g2 = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(xs, w, scale, bias)
    assert _rel_err(y2, y1) < 1e-2
    for name, a, b in zip(("dx", "dw", "dscale", "dbias"), g2, g1):
        assert _rel_err(a, b) < 2e-2, name
