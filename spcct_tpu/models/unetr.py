# unetr.py — native UNETR: 3D ViT encoder + convolutional decoder.
#
# The reference wraps MONAI's UNETR (reference models.py:987-1004) with a
# resize-to-96^3 forward (models.py:1022-1036); this is a from-scratch
# TPU-native implementation of the same architecture (Hatamizadeh et al.,
# "UNETR: Transformers for 3D Medical Image Segmentation"):
#   * conv patch embedding (16^3 patches) + learnable positional embedding;
#   * 12 pre-LN transformer blocks (hidden 768, 12 heads, MLP 3072, GELU);
#     skip taps after blocks 3/6/9/12;
#   * decoder: progressive deconv branches from z3/z6/z9 + residual conv
#     blocks (instance norm, lrelu), transpose-conv upsampling, 1x1x1 head.
# Attention runs through ops.attention (Pallas flash kernel on TPU).
from __future__ import annotations

import math
from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import attention
from ..ops.init import torch_linear_kernel_init, torch_bias_init
from .layers import (Conv3d, ConvTranspose3d, Norm3d, act_fn, channels_of,
                     skip_join)

Dtype = Any


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=torch_linear_kernel_init,
                     bias_init=torch_bias_init(d_in))(x)
        x = nn.gelu(x)
        x = nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=torch_linear_kernel_init,
                     bias_init=torch_bias_init(self.hidden))(x)
        return x


class MultiHeadSelfAttention(nn.Module):
    hidden: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, H*D)
        B, N, _ = x.shape
        hd = self.hidden // self.num_heads
        qkv = nn.Dense(3 * self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=torch_linear_kernel_init,
                       bias_init=torch_bias_init(self.hidden))(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]  # (B,h,N,d)
        o = attention(q, k, v)
        o = jnp.moveaxis(o, 1, 2).reshape(B, N, self.hidden)
        return nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=torch_linear_kernel_init,
                        bias_init=torch_bias_init(self.hidden))(o)


class TransformerBlock(nn.Module):
    hidden: int
    mlp_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        x = x + MultiHeadSelfAttention(self.hidden, self.num_heads, dtype=self.dtype)(y)
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        x = x + Mlp(self.mlp_dim, self.hidden, dtype=self.dtype)(y)
        return x


class ViT3D(nn.Module):
    """3D vision transformer with intermediate feature taps."""
    hidden: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 16
    taps: Tuple[int, ...] = (3, 6, 9, 12)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, D, H, W, C)
        p = self.patch_size
        z = Conv3d(self.hidden, (p, p, p), strides=(p, p, p), padding=[(0, 0)] * 3,
                   dtype=self.dtype, name="patch_embed")(x)
        B, d, h, w, _ = z.shape
        n = d * h * w
        z = z.reshape(B, n, self.hidden)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, n, self.hidden), jnp.float32)
        z = z + pos.astype(z.dtype)
        feats = []
        for i in range(self.num_layers):
            z = TransformerBlock(self.hidden, self.mlp_dim, self.num_heads,
                                 dtype=self.dtype, name=f"block{i}")(z)
            if (i + 1) in self.taps:
                feats.append(z.reshape(B, d, h, w, self.hidden))
        return feats  # z3, z6, z9, z12 on the patch grid


class ResConvBlock(nn.Module):
    """UNETR residual conv block: (conv-IN-lrelu) x2 + 1x1-IN skip."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: array, or virtual-concat tuple from skip_join (layers.py)
        a = act_fn("lrelu")
        if channels_of(x) != self.features:
            s = Conv3d(self.features, (1, 1, 1), use_bias=False, dtype=self.dtype)(x)
            s = Norm3d("instance", dtype=self.dtype)(s)
        else:
            s = jnp.concatenate(x, -1) if isinstance(x, (tuple, list)) else x
        y = Conv3d(self.features, use_bias=False, dtype=self.dtype)(x)
        y = a(Norm3d("instance", dtype=self.dtype)(y))
        y = Conv3d(self.features, use_bias=False, dtype=self.dtype)(y)
        y = Norm3d("instance", dtype=self.dtype)(y)
        return a(y + s)


class PrUpBlock(nn.Module):
    """Progressive deconv branch: transpose-conv 2x, then num_layer x
    (transpose-conv 2x + res conv block)."""
    features: int
    num_layer: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvTranspose3d(self.features, dtype=self.dtype)(x)
        for _ in range(self.num_layer):
            x = ConvTranspose3d(self.features, dtype=self.dtype)(x)
            x = ResConvBlock(self.features, dtype=self.dtype)(x)
        return x


class UpBlock(nn.Module):
    """Decoder stage: transpose-conv 2x, concat skip, res conv block."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        x = ConvTranspose3d(self.features, dtype=self.dtype)(x)
        return ResConvBlock(self.features, dtype=self.dtype)(skip_join(x, skip))


class UNETR(nn.Module):
    num_classes: int
    img_size: Tuple[int, int, int] = (96, 96, 96)
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, 96,96,96, C)
        f = self.feature_size
        z3, z6, z9, z12 = ViT3D(
            self.hidden_size, self.mlp_dim, 12, self.num_heads, 16,
            dtype=self.dtype, name="vit")(x)
        enc1 = ResConvBlock(f, dtype=self.dtype, name="encoder1")(x)
        enc2 = PrUpBlock(2 * f, 2, dtype=self.dtype, name="encoder2")(z3)
        enc3 = PrUpBlock(4 * f, 1, dtype=self.dtype, name="encoder3")(z6)
        enc4 = PrUpBlock(8 * f, 0, dtype=self.dtype, name="encoder4")(z9)
        d4 = UpBlock(8 * f, dtype=self.dtype, name="decoder5")(z12, enc4)
        d3 = UpBlock(4 * f, dtype=self.dtype, name="decoder4")(d4, enc3)
        d2 = UpBlock(2 * f, dtype=self.dtype, name="decoder3")(d3, enc2)
        d1 = UpBlock(f, dtype=self.dtype, name="decoder2")(d2, enc1)
        out = Conv3d(self.num_classes, (1, 1, 1), dtype=self.dtype, name="out")(d1)
        return out.astype(jnp.float32)
