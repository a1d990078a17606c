# swin_unetr.py — native 3D SwinUNETR: shifted-window transformer encoder +
# UNETR-style residual conv decoder.
#
# The reference delegates to MONAI's SwinUNETR (reference models.py:858-879)
# behind a pad-to-32 forward (models.py:899-904); this is a from-scratch
# TPU-native implementation of the same architecture (Hatamizadeh et al.,
# "Swin UNETR"):
#   * patch embedding 2^3 → feature_size channels;
#   * 4 stages of 3D Swin blocks (window attention with relative position
#     bias, cyclic-shift on odd blocks with attention masking) each followed
#     by patch merging (8-neighbor concat + LN + linear 2x channels);
#   * decoder: residual conv blocks on each scale + transpose-conv upsamples.
#
# Note on window size: the reference *intends* window (2,2,2)
# (config.py:374) but its build_class signature filter silently drops the
# kwarg (LitSwinUNETR_Published has no window_size parameter), so the MONAI
# default applies. We honor the configured (2,2,2) — documented divergence in
# the variant's favor (smaller windows, lower attention memory).
from __future__ import annotations

import itertools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import xla_attention
from ..ops.init import torch_linear_kernel_init, torch_bias_init
from .layers import Conv3d, ConvTranspose3d, Norm3d, act_fn
from .unetr import Mlp, ResConvBlock, UpBlock

Dtype = Any
Win = Tuple[int, int, int]


def window_partition(x: jnp.ndarray, w: Win) -> jnp.ndarray:
    """(B, D, H, W, C) → (B*nW, wd*wh*ww, C)."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // w[0], w[0], H // w[1], w[1], W // w[2], w[2], C)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(-1, w[0] * w[1] * w[2], C)


def window_reverse(win: jnp.ndarray, w: Win, dims: Tuple[int, int, int, int]) -> jnp.ndarray:
    B, D, H, W = dims
    C = win.shape[-1]
    x = win.reshape(B, D // w[0], H // w[1], W // w[2], w[0], w[1], w[2], C)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(B, D, H, W, C)


def _rel_pos_index(w: Win) -> np.ndarray:
    """(N, N) index into the (2wd-1)(2wh-1)(2ww-1) relative-bias table."""
    coords = np.stack(np.meshgrid(
        np.arange(w[0]), np.arange(w[1]), np.arange(w[2]), indexing="ij"))
    coords = coords.reshape(3, -1)                        # (3, N)
    rel = coords[:, :, None] - coords[:, None, :]         # (3, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += w[0] - 1
    rel[..., 1] += w[1] - 1
    rel[..., 2] += w[2] - 1
    rel[..., 0] *= (2 * w[1] - 1) * (2 * w[2] - 1)
    rel[..., 1] *= (2 * w[2] - 1)
    return rel.sum(-1)                                    # (N, N)


def _shift_attn_mask(dims: Tuple[int, int, int], w: Win, shift: Win) -> np.ndarray:
    """Standard Swin attention mask for shifted windows: (nW, N, N) with 0 for
    allowed pairs and -100 for pairs from different pre-shift regions."""
    D, H, W = dims
    img = np.zeros((1, D, H, W, 1), np.float32)
    cnt = 0
    for d in (slice(0, -w[0]), slice(-w[0], -shift[0]), slice(-shift[0], None)):
        for h in (slice(0, -w[1]), slice(-w[1], -shift[1]), slice(-shift[1], None)):
            for ww_ in (slice(0, -w[2]), slice(-w[2], -shift[2]), slice(-shift[2], None)):
                img[:, d, h, ww_, :] = cnt
                cnt += 1
    wins = np.asarray(window_partition(jnp.asarray(img), w))[..., 0]  # (nW, N)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention3D(nn.Module):
    dim: int
    num_heads: int
    window: Win
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):  # x: (B_, N, C); mask: (nW, N, N) or None
        B_, N, C = x.shape
        hd = self.dim // self.num_heads
        table_size = (2 * self.window[0] - 1) * (2 * self.window[1] - 1) * (2 * self.window[2] - 1)
        bias_table = self.param("rel_pos_bias", nn.initializers.truncated_normal(0.02),
                                (table_size, self.num_heads), jnp.float32)
        idx = jnp.asarray(_rel_pos_index(self.window))
        bias = bias_table[idx.reshape(-1)].reshape(N, N, self.num_heads)
        bias = jnp.transpose(bias, (2, 0, 1))[None]        # (1, h, N, N)

        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=torch_linear_kernel_init,
                       bias_init=torch_bias_init(self.dim))(x)
        qkv = qkv.reshape(B_, N, 3, self.num_heads, hd)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]  # (B_, h, N, d)

        if mask is not None:
            nW = mask.shape[0]
            full_bias = bias + mask[:, None].astype(jnp.float32)  # (nW, h, N, N)
            q = q.reshape(B_ // nW, nW, self.num_heads, N, hd)
            k = k.reshape(B_ // nW, nW, self.num_heads, N, hd)
            v = v.reshape(B_ // nW, nW, self.num_heads, N, hd)
            o = xla_attention(q, k, v, bias=full_bias[None])
            o = o.reshape(B_, self.num_heads, N, hd)
        else:
            o = xla_attention(q, k, v, bias=bias)
        o = jnp.moveaxis(o, 1, 2).reshape(B_, N, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=torch_linear_kernel_init,
                        bias_init=torch_bias_init(self.dim))(o)


class SwinBlock3D(nn.Module):
    dim: int
    num_heads: int
    window: Win
    shift: bool
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, D, H, W, C)
        B, D, H, W, C = x.shape
        w = tuple(min(wi, s) for wi, s in zip(self.window, (D, H, W)))
        shift = tuple((wi // 2 if (self.shift and s > wi) else 0)
                      for wi, s in zip(w, (D, H, W)))

        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32)(x).astype(x.dtype)
        pads = [(0, (-s) % wi) for s, wi in zip((D, H, W), w)]
        y = jnp.pad(y, ((0, 0), *pads, (0, 0)))
        Dp, Hp, Wp = y.shape[1:4]
        if any(shift):
            y = jnp.roll(y, shift=tuple(-s for s in shift), axis=(1, 2, 3))
            mask = jnp.asarray(_shift_attn_mask((Dp, Hp, Wp), w, shift))
        else:
            mask = None
        wins = window_partition(y, w)
        wins = WindowAttention3D(self.dim, self.num_heads, w, dtype=self.dtype)(wins, mask)
        y = window_reverse(wins, w, (B, Dp, Hp, Wp))
        if any(shift):
            y = jnp.roll(y, shift=shift, axis=(1, 2, 3))
        y = y[:, :D, :H, :W, :]
        x = shortcut + y
        y = nn.LayerNorm(dtype=jnp.float32)(x).astype(x.dtype)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype)(y)
        return x


class PatchMerging3D(nn.Module):
    dim: int  # input channels; output 2*dim
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        pads = [(0, D % 2), (0, H % 2), (0, W % 2)]
        x = jnp.pad(x, ((0, 0), *pads, (0, 0)))
        parts = [
            x[:, i::2, j::2, k::2, :]
            for i, j, k in itertools.product((0, 1), repeat=3)
        ]
        x = jnp.concatenate(parts, axis=-1)  # (B, D/2, H/2, W/2, 8C)
        x = nn.LayerNorm(dtype=jnp.float32)(x).astype(parts[0].dtype)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=torch_linear_kernel_init)(x)


class SwinViT3D(nn.Module):
    feature_size: int = 12
    depths: Tuple[int, ...] = (1, 1, 1, 1)
    num_heads: Tuple[int, ...] = (1, 2, 4, 8)
    window: Win = (2, 2, 2)
    mlp_ratio: float = 4.0
    block_remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        SwinBlk = nn.remat(SwinBlock3D) if self.block_remat else SwinBlock3D
        # patch embed: 2^3 patches
        z = Conv3d(self.feature_size, (2, 2, 2), strides=(2, 2, 2),
                   padding=[(0, 0)] * 3, dtype=self.dtype, name="patch_embed")(x)
        hidden = [z]  # x0: C @ /2
        dim = self.feature_size
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for b in range(depth):
                z = SwinBlk(dim, heads, self.window, shift=(b % 2 == 1),
                            mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                            name=f"stage{stage}_block{b}")(z)
            z = PatchMerging3D(dim, dtype=self.dtype, name=f"merge{stage}")(z)
            dim *= 2
            hidden.append(z)  # x1: 2C @ /4 ... x4: 16C @ /32
        return hidden


class SwinUNETR(nn.Module):
    """block_remat: per-block gradient checkpointing — the whole-model step
    at the padded full-resolution config needs 41.3 GB of temporaries
    (measured XLA compile OOM on 15.75 GB HBM; the reference ran MONAI's
    version on larger-memory CUDA hardware). Checkpointing each Swin block,
    ResConvBlock and UpBlock keeps one region's activations live at a time."""
    num_classes: int
    feature_size: int = 12
    depths: Tuple[int, ...] = (1, 1, 1, 1)
    num_heads: Tuple[int, ...] = (1, 2, 4, 8)
    window_size: Win = (2, 2, 2)
    mlp_ratio: float = 4.0
    block_remat: bool = False
    # logits_f32=False defers the f32 upcast to the recipe wrapper (after
    # the pad32 crop — upcast commutes exactly with cropping); the padded
    # (1,32,512,512,13) f32 logits are 872 MB of pure temp vs 436 in bf16
    logits_f32: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.feature_size
        Res = nn.remat(ResConvBlock) if self.block_remat else ResConvBlock
        Up = nn.remat(UpBlock) if self.block_remat else UpBlock
        x0, x1, x2, x3, x4 = SwinViT3D(
            f, self.depths, self.num_heads, self.window_size, self.mlp_ratio,
            block_remat=self.block_remat, dtype=self.dtype, name="swin")(x)
        enc0 = Res(f, dtype=self.dtype, name="encoder1")(x)
        enc1 = Res(f, dtype=self.dtype, name="encoder2")(x0)
        enc2 = Res(2 * f, dtype=self.dtype, name="encoder3")(x1)
        enc3 = Res(4 * f, dtype=self.dtype, name="encoder4")(x2)
        dec4 = Res(16 * f, dtype=self.dtype, name="encoder10")(x4)
        d3 = Up(8 * f, dtype=self.dtype, name="decoder5")(dec4, x3)
        d2 = Up(4 * f, dtype=self.dtype, name="decoder4")(d3, enc3)
        d1 = Up(2 * f, dtype=self.dtype, name="decoder3")(d2, enc2)
        d0 = Up(f, dtype=self.dtype, name="decoder2")(d1, enc1)
        out = Up(f, dtype=self.dtype, name="decoder1")(d0, enc0)
        logits = Conv3d(self.num_classes, (1, 1, 1), dtype=self.dtype, name="out")(out)
        return logits.astype(jnp.float32) if self.logits_f32 else logits
