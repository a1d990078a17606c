# spff_folded.py — depth-folded execution engine for the SPFF spectral core.
#
# TPU-first layout redesign (no reference equivalent — this is the "idiomatic
# mechanism" layer of SURVEY.md §7): the spectral depth F=5 is tiny, so every
# channels-last tensor (B, D, H, W, C) wastes 3/4 of the TPU's 128-wide lanes
# when C = 32 (the full-resolution UNet level, where most voxels live).
# Folding depth into channels — (B, H, W, D*C), d-major — gives every level
# >= 160 lanes, which:
#   * turns each (ksd,3,3) spectral conv into ONE dense 2D conv with a
#     block-banded kernel (|d_out - d_in| <= ksd//2) built on the fly from the
#     original 3D parameters — measured 1.9x faster than XLA's conv3d at the
#     C=32 level, identical math (zero-padding along D is exactly the band
#     edge);
#   * packs all elementwise work (instance norm, LeakyReLU, SE/SpecSE gates,
#     FiLM, Fourier gate) into full lanes.
#
# This module is an EXECUTION ENGINE, not a different model: it consumes the
# exact parameter pytree of models.spff.UNet3DSpectralCore and computes the
# same function (parity-tested in tests/test_folded.py). Checkpoints are
# interchangeable between engines.
from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .spff import UNet3DSpectralCore, sinusoidal_pe


# ─────────────────────────────────────────────────────────────
# layout helpers
# ─────────────────────────────────────────────────────────────
def fold(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) → (B, H, W, D*C), d-major channel order."""
    B, D, H, W, C = x.shape
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, H, W, D * C)

def unfold(x: jnp.ndarray, D: int) -> jnp.ndarray:
    """(B, H, W, D*C) → (B, D, H, W, C)."""
    B, H, W, DC = x.shape
    C = DC // D
    return jnp.transpose(x.reshape(B, H, W, D, C), (0, 3, 1, 2, 4))


def banded_kernel_2d(w3: jnp.ndarray, D: int,
                     in_segments: Optional[Sequence[Tuple[int, int]]] = None
                     ) -> jnp.ndarray:
    """(kd, kh, kw, Ci, Co) 3D-conv kernel → (kh, kw, sum(D*Ci_seg), D*Co)
    block-banded 2D kernel.

    Equivalence: XLA's conv with symmetric padding pd = kd//2 computes
    y[do] = Σ_k w3[k] · x[do + k - pd], so the input depth-block di feeds
    output block do with tap k = di - do + pd. Blocks outside [0, kd) are
    zero — exactly the conv's zero padding along D.

    in_segments: folded input layout as (channel_offset_in_w3, Ci) per
    concatenated branch (decoder stages concatenate [up, skip] along C; in
    folded layout that is [D*Ci_up | D*Ci_skip], and the band must index the
    original w3 rows accordingly). Default: one segment covering all of Ci.
    """
    kd, kh, kw, Ci, Co = w3.shape
    pd = kd // 2
    if in_segments is None:
        in_segments = [(0, Ci)]
    # Band placement as one einsum with precomputed 0/1 selector E[k,di,do]
    # (E_k is the shifted identity for depth offset pd - k). A scatter-based
    # (.at[].set) construction compiles pathologically slowly in XLA.
    E = np.zeros((kd, D, D), np.float32)
    for k in range(kd):
        for di in range(D):
            do = di - k + pd
            if 0 <= do < D:
                E[k, di, do] = 1.0
    Ej = jnp.asarray(E, w3.dtype)
    parts = []
    for off, ci in in_segments:
        w_seg = w3[:, :, :, off:off + ci, :]
        # (kh, kw, di, ci, do, co) → (kh, kw, D*ci, D*Co)
        w2 = jnp.einsum("kde,khwio->hwdieo", Ej, w_seg)
        parts.append(w2.reshape(kh, kw, D * ci, D * Co))
    return jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]


def _conv2d(x, w, stride=1):
    # plain same-dtype conv (MXU still accumulates bf16 matmuls in f32);
    # a preferred_element_type=f32 output would break the conv transpose
    # (backward) rule for bf16 operands and add cast passes.
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    pad = [(w.shape[0] // 2, w.shape[0] // 2), (w.shape[1] // 2, w.shape[1] // 2)]
    return jax.lax.conv_general_dilated(x, w, (stride, stride), pad,
                                        dimension_numbers=dn)


# ─────────────────────────────────────────────────────────────
# folded layer primitives (exact math of the standard modules)
# ─────────────────────────────────────────────────────────────
def instance_norm_folded(x, scale, bias, D, eps=1e-5):
    """InstanceNorm over (D, H, W) per (sample, channel) on folded layout.
    scale/bias: (C,) from the GroupNorm params."""
    B, H, W, DC = x.shape
    C = DC // D
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2)).reshape(B, D, C).sum(1)        # (B, C)
    s2 = jnp.sum(xf * xf, axis=(1, 2)).reshape(B, D, C).sum(1)
    n = D * H * W
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    g = (rstd * scale.astype(jnp.float32))                        # (B, C)
    b = (bias.astype(jnp.float32) - mean * g)
    g_dc = jnp.tile(g, (1, D))[:, None, None, :]
    b_dc = jnp.tile(b, (1, D))[:, None, None, :]
    return (xf * g_dc + b_dc).astype(x.dtype)


def lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=1e-2)


def spectral_se_folded(x, D):
    """x * sigmoid(mean over (C, H, W) per depth) — SpectralSE
    (reference models.py:611-614)."""
    B, H, W, DC = x.shape
    C = DC // D
    m = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).reshape(B, D, C).mean(2)  # (B, D)
    w = jax.nn.sigmoid(m)
    w_dc = jnp.repeat(w, C, axis=1)[:, None, None, :].astype(x.dtype)
    return x * w_dc


def se_channel_lite_folded(x, p, D):
    """SEChannelLite on folded layout: pool over (D,H,W) per channel, 2-layer
    1x1 bottleneck, sigmoid gate. p: params dict with Conv3d_0/Conv3d_1."""
    B, H, W, DC = x.shape
    C = DC // D
    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).reshape(B, D, C).mean(1)  # (B, C)
    w0 = p["Conv3d_0"]["Conv_0"]["kernel"].reshape(C, -1)       # (C, h)
    b0 = p["Conv3d_0"]["Conv_0"]["bias"]
    w1 = p["Conv3d_1"]["Conv_0"]["kernel"]
    h = jax.nn.relu(pooled @ w0 + b0)
    gate = jax.nn.sigmoid(h @ w1.reshape(w1.shape[-2], w1.shape[-1]) +
                          p["Conv3d_1"]["Conv_0"]["bias"])        # (B, C)
    gate_dc = jnp.tile(gate, (1, D))[:, None, None, :].astype(x.dtype)
    return x * gate_dc


def energy_film_folded(x, p, D, pe_dims=16):
    """EnergyFiLM3D: input-independent (γ, β) per (depth, channel) from the
    sinusoidal PE MLP (reference models.py:1479-1512)."""
    B, H, W, DC = x.shape
    C = DC // D
    pe = jnp.asarray(sinusoidal_pe(D, pe_dims).T, jnp.float32)    # (D, pe)
    h = jax.nn.relu(pe @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"])
    gb = h @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"]        # (D, 2C)
    gamma = jnp.tanh(gb[:, :C]).reshape(D * C)
    beta = gb[:, C:].reshape(D * C)
    return (x * (1.0 + gamma).astype(x.dtype)[None, None, None, :]
            + beta.astype(x.dtype)[None, None, None, :])


def fourier_gate_folded(x, p, D):
    """FourierGate3D on folded layout (reference models.py:1515-1544)."""
    B, H, W, DC = x.shape
    C = DC // D
    s = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).reshape(B, D, C).mean(2)  # (B, D)
    sf = jnp.fft.rfft(s, axis=1)
    m = p["freq_mask"] * p["mag_scale"]
    w = jnp.fft.irfft(sf * m, n=D, axis=1)
    w = jax.nn.sigmoid(w)
    w_dc = jnp.repeat(w, C, axis=1)[:, None, None, :].astype(x.dtype)
    return x * w_dc


def max_pool_folded(x):
    from flax import linen as nn
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def conv_transpose_folded(x, kernel, bias, D):
    """(1,2,2)-stride-(1,2,2) ConvTranspose3d on folded layout.

    With kernel size == stride there is no tap overlap, so the transpose conv
    is exactly one GEMM + depth-to-space: y[b, 2h+t, 2w+u, (d,o)] =
    Σ_i x[b,h,w,(d,i)] · k[t,u,i,o] — weights shared across depth.
    kernel: (1, 2, 2, Ci, Co) flax ConvTranspose param.
    """
    B, H, W, DC = x.shape
    _, kh, kw, Ci, Co = kernel.shape
    xg = x.reshape(B, H, W, D, Ci)
    # flax ConvTranspose places the kernel flipped: y[2h+t] uses k[kh-1-t]
    kflip = kernel[0, ::-1, ::-1].astype(x.dtype)
    y = jnp.einsum("bhwdi,tuio->bhwtudo", xg, kflip)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5, 6))          # (B,H,t,W,u,D,Co)
    y = y.reshape(B, H * kh, W * kw, D * Co)
    if bias is not None:
        y = y + jnp.tile(bias, (D,)).astype(y.dtype)[None, None, None, :]
    return y


def double_conv_folded(x, p, D, ksd, cfg, dtype,
                       in_segments=None):
    """DoubleConvSpectral in folded layout: pre-conv → norm → lrelu →
    body-conv → norm → lrelu → [EFiLM] → [FourierGate]."""
    w1 = p["Conv3d_0"]["Conv_0"]["kernel"].astype(dtype)         # (ksd,3,3,Ci,Co)
    w2 = p["Conv3d_1"]["Conv_0"]["kernel"].astype(dtype)
    y = _conv2d(x, banded_kernel_2d(w1, D, in_segments)).astype(dtype)
    y = instance_norm_folded(y, p["Norm3d_0"]["GroupNorm_0"]["scale"],
                             p["Norm3d_0"]["GroupNorm_0"]["bias"], D)
    y = lrelu(y)
    y = _conv2d(y, banded_kernel_2d(w2, D)).astype(dtype)
    y = instance_norm_folded(y, p["Norm3d_1"]["GroupNorm_0"]["scale"],
                             p["Norm3d_1"]["GroupNorm_0"]["bias"], D)
    y = lrelu(y)
    if cfg["use_efilm"]:
        y = energy_film_folded(y, p["EnergyFiLM3D_0"], D)
    if cfg["use_fouriergate"]:
        y = fourier_gate_folded(y, p["FourierGate3D_0"], D)
    return y


# ─────────────────────────────────────────────────────────────
# full folded forward
# ─────────────────────────────────────────────────────────────
def make_folded_apply(module: UNet3DSpectralCore):
    """Return an apply-compatible callable computing the module's function in
    depth-folded layout. Signature: apply(variables, x, train=False,
    mutable=False) — mutable is accepted for interface parity (SPFF has no
    batch stats) and `(logits, None)` semantics are preserved by the caller's
    wrapper."""
    if module.use_spatial or module.use_skip_gate:
        # not used by any registered variant (reference config.py:410-476);
        # fall back to the standard engine rather than implement dead paths
        return module.apply

    cfg = dict(use_efilm=module.use_efilm, use_fouriergate=module.use_fouriergate)
    use_se, use_specse = module.use_se, module.use_specse
    ksd = module.ksd
    dtype = module.dtype
    f = module.base

    def post(x, params, stage, D):
        # order matches UNet3DSpectralCore._post: SpecSE → SE → (no spatial)
        if use_specse:
            x = spectral_se_folded(x, D)
        if use_se:
            x = se_channel_lite_folded(x, params[f"se{stage}"], D)
        return x

    def apply(variables, x, train=False, mutable=False, rngs=None):
        params = variables["params"]
        B, D, H, W, Cin = x.shape
        xf = fold(x).astype(dtype)

        e1 = post(double_conv_folded(xf, params["enc1"], D, ksd, cfg, dtype), params, 0, D)
        e2 = post(double_conv_folded(max_pool_folded(e1), params["enc2"], D, ksd, cfg, dtype), params, 1, D)
        e3 = post(double_conv_folded(max_pool_folded(e2), params["enc3"], D, ksd, cfg, dtype), params, 2, D)
        b = post(double_conv_folded(max_pool_folded(e3), params["bott"], D, ksd, cfg, dtype), params, 3, D)

        def up(name, z, co):
            k = params[name]["ConvTranspose_0"]["kernel"].astype(dtype)
            bias = params[name]["ConvTranspose_0"].get("bias")
            return conv_transpose_folded(z, k, bias, D)

        d3 = up("up3", b, 4 * f)
        d3 = double_conv_folded(jnp.concatenate([d3, e3], -1), params["dec3"],
                                D, ksd, cfg, dtype,
                                in_segments=[(0, 4 * f), (4 * f, 4 * f)])
        d2 = up("up2", d3, 2 * f)
        d2 = double_conv_folded(jnp.concatenate([d2, e2], -1), params["dec2"],
                                D, ksd, cfg, dtype,
                                in_segments=[(0, 2 * f), (2 * f, 2 * f)])
        d1 = up("up1", d2, f)
        d1 = double_conv_folded(jnp.concatenate([d1, e1], -1), params["dec1"],
                                D, ksd, cfg, dtype,
                                in_segments=[(0, f), (f, f)])

        # 1x1x1 head: grouped (per-depth) 1x1 conv with shared weights
        wo = params["out"]["Conv_0"]["kernel"].astype(dtype)      # (1,1,1,f,nc)
        bo = params["out"]["Conv_0"]["bias"]
        k2 = jnp.tile(wo[0], (1, 1, 1, D))                        # (1,1,f,D*nc)
        logits = jax.lax.conv_general_dilated(
            d1, k2, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                d1.shape, k2.shape, ("NHWC", "HWIO", "NHWC")),
            feature_group_count=D,
        )
        logits = logits + jnp.tile(bo, (D,)).astype(logits.dtype)[None, None, None, :]
        out = unfold(logits, D).astype(jnp.float32)
        if mutable:
            return out, {}
        return out

    return apply
