# Parity tests for the CW-layout Pallas conv kernels (ops/pallas_conv.py)
# against lax.conv_general_dilated — forward, input-grad, and weight-grad.
# Run in Pallas interpret mode on the CPU test backend; the same kernels
# compile natively on TPU (validated by scripts/pallas_conv_proto.py).
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcct_tpu.ops import pallas_conv as pc


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.max(np.abs(a - b)) / max(1e-6, np.max(np.abs(b)))


@pytest.mark.parametrize("kd,cin,cout,B", [
    (3, 8, 8, 1), (1, 8, 16, 1), (3, 8, 8, 2),
    # wrapper-padded channel counts (memory-rescue region: Swin enc1/dec1)
    (3, 1, 12, 1), (3, 24, 12, 1), (3, 12, 12, 1),
])
def test_forward_parity(kd, cin, cout, B):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 5, 8, 128, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((kd, 3, 3, cin, cout)) * 0.1, jnp.float32)
    y = pc.conv3d_spectral(x.astype(jnp.bfloat16), w)
    y_ref = _ref_conv(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    assert y.shape == y_ref.shape
    assert _rel_err(y, y_ref) < 3e-2  # bf16 inputs, f32 accumulation


@pytest.mark.parametrize("C,CO", [(8, 8), (1, 12), (24, 12)])
def test_grad_parity(C, CO):
    rng = np.random.default_rng(1)
    B, F, H, W = 1, 5, 8, 128
    x = jnp.asarray(rng.standard_normal((B, F, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, CO)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, F, H, W, CO)), jnp.float32)

    def f_pallas(x, w):
        return jnp.vdot(pc.conv3d_spectral(x.astype(jnp.bfloat16), w).astype(jnp.float32), g)

    def f_ref(x, w):
        return jnp.vdot(_ref_conv(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)), g)

    dx_p, dw_p = jax.grad(f_pallas, argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    assert _rel_err(dx_p, dx_r) < 3e-2
    assert _rel_err(dw_p, dw_r) < 3e-2


def test_supported_gates():
    ok = ((1, 5, 8, 128, 8), (3, 3, 3, 8, 8))
    assert pc._supported(ok[0], ok[1], (1, 1, 1), (1, 1, 1), None)
    # 1x1x1 head conv, odd widths, stride, dilation all excluded
    assert not pc._supported(ok[0], (1, 1, 1, 8, 13), (1, 1, 1), (1, 1, 1), None)
    assert not pc._supported((1, 5, 8, 100, 8), ok[1], (1, 1, 1), (1, 1, 1), None)
    assert not pc._supported(ok[0], ok[1], (1, 2, 2), (1, 1, 1), None)
    assert not pc._supported(ok[0], ok[1], (1, 1, 1), (2, 2, 2), None)
    # odd channel counts are now wrapper-padded, not excluded
    assert pc._supported(ok[0], (3, 3, 3, 8, 13), (1, 1, 1), (1, 1, 1), None)
    assert pc._supported((1, 5, 8, 128, 1), (3, 3, 3, 1, 12),
                         (1, 1, 1), (1, 1, 1), None)
    # memory-rescue region: full-res small-cout only
    assert pc._memory_rescue((1, 32, 512, 512, 12), (3, 3, 3, 12, 12))
    assert not pc._memory_rescue((1, 32, 256, 256, 12), (3, 3, 3, 12, 12))
    assert not pc._memory_rescue((1, 16, 512, 512, 16), (3, 3, 3, 16, 16))


def test_embed_1x1_conv_path(monkeypatch):
    """1x1x1 small-channel convs route through the CW kernel by zero-
    embedding into a (1,3,3) kernel (layers.py); values and grads must
    match the plain XLA conv. Rescue gate monkeypatched so the test runs
    at W=128 (real gate: W>=512, the Swin/UNETR full-res region)."""
    monkeypatch.setattr(pc, "_memory_rescue", lambda *a, **k: True)
    from spcct_tpu.models.layers import Conv3d
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 128, 12)), jnp.float32)
    m = Conv3d(13, (1, 1, 1), dtype=jnp.bfloat16, use_bias=True)
    v = m.init(jax.random.PRNGKey(0), x)

    def ref(v, x):
        k = v["params"]["Conv_0"]["kernel"].astype(jnp.bfloat16)
        b = v["params"]["Conv_0"]["bias"].astype(jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k, (1, 1, 1), [(0, 0)] * 3,
            dimension_numbers=dn) + b

    y, yr = m.apply(v, x), ref(v, x)
    assert _rel_err(y, yr) < 3e-2
    g = jnp.asarray(rng.standard_normal(y.shape), jnp.float32)
    gp = jax.grad(lambda v: jnp.vdot(m.apply(v, x).astype(jnp.float32), g))(v)
    gr = jax.grad(lambda v: jnp.vdot(ref(v, x).astype(jnp.float32), g))(v)
    for key in ("kernel", "bias"):
        assert _rel_err(gp["params"]["Conv_0"][key],
                        gr["params"]["Conv_0"][key]) < 3e-2, key


def test_patch_embed_decomposition():
    """2x-strided cin=1 patch embed decomposes into 8 strided sub-grids
    (layers.py) — the lane-pad rescue for Swin's patch_embed; exact same
    math as the strided conv."""
    from spcct_tpu.models.layers import Conv3d
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 512, 1)), jnp.float32)
    m = Conv3d(12, (2, 2, 2), strides=(2, 2, 2), padding=[(0, 0)] * 3,
               dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)

    def ref(v, x):
        k = v["params"]["Conv_0"]["kernel"].astype(jnp.bfloat16)
        b = v["params"]["Conv_0"]["bias"].astype(jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k, (2, 2, 2), [(0, 0)] * 3,
            dimension_numbers=dn) + b

    y, yr = m.apply(v, x), ref(v, x)
    assert y.shape == yr.shape == (1, 2, 4, 256, 12)
    assert _rel_err(y, yr) < 3e-2
    g = jnp.asarray(rng.standard_normal(y.shape), jnp.float32)
    gp = jax.grad(lambda v: jnp.vdot(m.apply(v, x).astype(jnp.float32), g))(v)
    gr = jax.grad(lambda v: jnp.vdot(ref(v, x).astype(jnp.float32), g))(v)
    for key in ("kernel", "bias"):
        assert _rel_err(gp["params"]["Conv_0"][key],
                        gr["params"]["Conv_0"][key]) < 3e-2, key


def test_gspmd_batch_partitioning():
    """Under a data-sharded mesh the CW conv partitions over B instead of
    the opaque-custom-call fallback (all-gather + replicated execution +
    slice-back, observed before the custom_partitioning rules). Checks
    value/grad equality with the unsharded op and that the compiled module
    contains no all-gather."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import mesh_utils

    if jax.device_count() < 2:
        import pytest
        pytest.skip("needs a multi-device backend")

    mesh = Mesh(mesh_utils.create_device_mesh((jax.device_count(),)), ("data",))
    rng = np.random.default_rng(7)
    B = jax.device_count()
    x = jnp.asarray(rng.standard_normal((B, 5, 8, 128, 8)), jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 3, 8, 8)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((B, 5, 8, 128, 8)), jnp.float32)

    def loss(x, w):
        return jnp.vdot(pc.conv3d_spectral(x, w).astype(jnp.float32), g)

    y1 = pc.conv3d_spectral(x, w)
    gx1, gw1 = jax.grad(loss, argnums=(0, 1))(x, w)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    f = jax.jit(lambda x, w: pc.conv3d_spectral(x, w))
    y2 = f(xs, ws)
    assert "all-gather" not in f.lower(xs, ws).compile().as_text()
    gx2, gw2 = jax.jit(jax.grad(loss, argnums=(0, 1)))(xs, ws)

    assert _rel_err(y2, y1) < 1e-2
    assert _rel_err(gx2, gx1) < 1e-2
    assert _rel_err(gw2, gw1) < 1e-2
