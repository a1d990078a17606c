# attention.py — multi-head attention primitives for UNETR/SwinUNETR.
#
# The reference outsources attention to MONAI's ViT / Swin blocks
# (reference models.py:864,993); this rebuild owns them. Two execution paths:
#   * a Pallas TPU flash-attention kernel (ops/flash_attention.py) for long
#     sequences — used by the UNETR ViT (216+ tokens, hidden 768);
#   * a plain XLA einsum path for short sequences (Swin windows of 8-343
#     tokens) where kernel launch/blocking overheads beat any savings, and as
#     the CPU/testing fallback.
# Selection is automatic by sequence length and backend, overridable via
# SPCCT_FLASH_ATTN=0/1.
from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 128


def _use_flash(seq_len: int) -> bool:
    env = os.getenv("SPCCT_FLASH_ATTN")
    if env is not None:
        return env == "1"
    if jax.default_backend() != "tpu":
        return False
    return seq_len >= _FLASH_MIN_SEQ


def xla_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference-semantics softmax attention.

    q,k,v: (..., heads, seq, head_dim); bias broadcastable to
    (..., heads, seq_q, seq_k). Softmax in float32 for bf16 inputs.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...hqd,...hkd->...hqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...hkd->...hqd", weights, v)


def attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Dispatching attention: Pallas flash kernel on TPU for long sequences,
    XLA einsum otherwise."""
    seq = q.shape[-2]
    if bias is None and _use_flash(seq):
        try:
            from .flash_attention import flash_attention

            return flash_attention(q, k, v, scale=scale)
        except Exception:
            pass  # fall back to XLA path (e.g. unsupported shape)
    return xla_attention(q, k, v, bias=bias, scale=scale)
