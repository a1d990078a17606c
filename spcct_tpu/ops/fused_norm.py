# fused_norm.py — InstanceNorm + LeakyReLU with a hand-derived backward.
#
# The UNet body applies IN+lrelu after every conv (~28 sites). Autodiff
# through flax GroupNorm saves normalized intermediates and replays several
# full-tensor passes in the backward; this fused op saves only the input and
# the (B, 1..1, C) statistics, recomputes x̂ on the fly, and evaluates the
# closed-form instance-norm gradient:
#
#   dz = g ⊙ lrelu'(γ·x̂ + β)
#   dβ = Σ dz,   dγ = Σ dz·x̂                (per (B, C) over spatial dims)
#   dx = γ·rstd · (dz − mean(dz) − x̂·mean(dz·x̂))
#
# Exact same math as torch InstanceNorm3d(affine=True, eps=1e-5) +
# LeakyReLU(1e-2); parity-tested against flax GroupNorm + leaky_relu
# (values AND gradients) in tests/test_fused_norm.py.
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-5
SLOPE = 1e-2


def _stats(x):
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(xf * xf, axis=axes, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + EPS)
    return mean, rstd


@jax.custom_vjp
def instance_norm_lrelu(x, scale, bias):
    mean, rstd = _stats(x)
    xf = x.astype(jnp.float32)
    z = (xf - mean) * (rstd * scale.astype(jnp.float32)) + bias.astype(jnp.float32)
    return jnp.where(z >= 0, z, SLOPE * z).astype(x.dtype)


def _fwd(x, scale, bias):
    mean, rstd = _stats(x)
    xf = x.astype(jnp.float32)
    z = (xf - mean) * (rstd * scale.astype(jnp.float32)) + bias.astype(jnp.float32)
    y = jnp.where(z >= 0, z, SLOPE * z).astype(x.dtype)
    return y, (x, mean, rstd, scale, bias)


def _bwd(res, g):
    x, mean, rstd, scale, bias = res
    axes = tuple(range(1, x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    sf = scale.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rstd
    pre = xhat * sf + bias.astype(jnp.float32)
    dz = jnp.where(pre >= 0, g.astype(jnp.float32), SLOPE * g.astype(jnp.float32))
    dbeta = jnp.sum(dz, axis=axes, keepdims=True)          # (B,1..1,C)
    dgamma = jnp.sum(dz * xhat, axis=axes, keepdims=True)
    dx = (sf * rstd) * (dz - dbeta / n - xhat * (dgamma / n))
    dscale = jnp.sum(dgamma, axis=0).reshape(scale.shape)
    dbias = jnp.sum(dbeta, axis=0).reshape(bias.shape)
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(bias.dtype))


instance_norm_lrelu.defvjp(_fwd, _bwd)
