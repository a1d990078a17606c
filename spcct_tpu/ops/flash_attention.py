# flash_attention.py — Pallas TPU fused attention for the UNETR ViT.
#
# The reference gets attention from MONAI's torch ViT (reference
# models.py:993); here attention is a custom TPU kernel: one pallas_call
# computes softmax(QK^T * scale) V blockwise in VMEM with the online-softmax
# recurrence, so the (N, N) score matrix never round-trips HBM. For UNETR's
# 216-token / 12-head / 64-dim geometry the whole row fits VMEM and the
# kernel is a single-block fused pass; longer sequences stream K/V blocks.
#
# Forward-only custom kernel: the backward pass falls back to XLA attention
# via custom_vjp (recompute), which is the right trade at these sequence
# lengths (N <= a few thousand; the bwd matmuls are MXU-bound either way).
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, blk_k: int,
               seq_len: int):
    """One (head, q-block) program: online softmax over K/V blocks."""
    q = q_ref[0].astype(jnp.float32) * scale            # (blk_q, d)
    blk_q, d = q.shape
    n_kblocks = k_ref.shape[1] // blk_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * blk_k, blk_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # mask padded keys
        key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * blk_k
        s = jnp.where(key_idx < seq_len, s, -jnp.inf)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((blk_q, d), jnp.float32)
    m0 = jnp.full((blk_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_kblocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_fwd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               scale: float) -> jnp.ndarray:
    """q,k,v: (B, H, N, D) → (B, H, N, D)."""
    B, H, N, D = q.shape
    Np = _round_up(N, _LANE)
    Dp = _round_up(D, _LANE)
    blk_q = min(Np, 512)
    blk_k = min(Np, 512)

    pad = [(0, 0), (0, 0), (0, Np - N), (0, Dp - D)]
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)
    qp = qp.reshape(B * H, Np, Dp)
    kp = kp.reshape(B * H, Np, Dp)
    vp = vp.reshape(B * H, Np, Dp)

    grid = (B * H, Np // blk_q)
    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, blk_k=blk_k, seq_len=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, Dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, Dp), q.dtype),
    )(qp, kp, vp)
    return out.reshape(B, H, Np, Dp)[:, :, :N, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale):
    return _flash_fwd(q, k, v, scale)


def _flash_vjp_fwd(q, k, v, scale):
    return _flash_fwd(q, k, v, scale), (q, k, v)


def _flash_vjp_bwd(scale, res, g):
    q, k, v = res

    def ref_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v)

    _, vjp = jax.vjp(ref_attn, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: Optional[float] = None) -> jnp.ndarray:
    """Fused attention; q,k,v: (..., H, N, D). Differentiable (XLA bwd)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    lead = q.shape[:-3]
    H, N, D = q.shape[-3:]
    q4 = q.reshape((-1,) + (H, N, D))
    k4 = k.reshape((-1,) + (H, N, D))
    v4 = v.reshape((-1,) + (H, N, D))
    out = _flash(q4, k4, v4, float(scale))
    return out.reshape(lead + (H, N, D))
