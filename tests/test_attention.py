# Attention op tests: XLA path semantics + Pallas flash kernel parity
# (interpret mode on CPU).
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spcct_tpu.ops.attention import xla_attention


def _qkv(shape, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.standard_normal(shape).astype(np.float32))
            for _ in range(3)]


def _ref(q, k, v, bias=None, scale=None):
    scale = scale or q.shape[-1] ** -0.5
    s = np.einsum("...hqd,...hkd->...hqk", np.asarray(q), np.asarray(k)) * scale
    if bias is not None:
        s = s + np.asarray(bias)
    s = s - s.max(-1, keepdims=True)
    w = np.exp(s)
    w /= w.sum(-1, keepdims=True)
    return np.einsum("...hqk,...hkd->...hqd", w, np.asarray(v))


def test_xla_attention_matches_numpy():
    q, k, v = _qkv((2, 4, 16, 8))
    out = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), _ref(q, k, v), atol=1e-5)


def test_xla_attention_with_bias():
    q, k, v = _qkv((2, 4, 16, 8), 1)
    bias = jnp.asarray(np.random.default_rng(2).standard_normal((1, 4, 16, 16)),
                       jnp.float32)
    out = xla_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), _ref(q, k, v, bias), atol=1e-5)


def test_flash_attention_parity_interpret():
    """Pallas kernel vs reference, interpreter mode (runs on CPU)."""
    from jax.experimental.pallas import tpu as pltpu
    from spcct_tpu.ops import flash_attention as fa

    q, k, v = _qkv((1, 2, 216, 64), 3)  # UNETR geometry (non-multiple of 128)
    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), _ref(q, k, v), atol=2e-5)


def test_flash_attention_grad_matches_xla():
    from jax.experimental.pallas import tpu as pltpu
    from spcct_tpu.ops import flash_attention as fa

    q, k, v = _qkv((1, 2, 64, 32), 4)

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fa.flash_attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
