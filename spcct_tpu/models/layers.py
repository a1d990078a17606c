# layers.py — reusable 3D blocks, channels-last (B, D, H, W, C), flax.linen.
#
# TPU-native rebuilds of the reference block zoo (innovative3D/models.py:
# 168-190 norm/act factory, 305-461 blocks, 600-645 SPCT gates,
# 1121-1149 recurrent blocks, 1295-1308 residual unit). Design notes:
#   * channels-last so XLA tiles convs onto the MXU without transposes;
#   * norms compute in float32 regardless of the activation dtype (bf16-safe);
#   * parameters are initialized with torch-default distributions
#     (kaiming_uniform(a=sqrt(5)) + uniform bias) for training-dynamics parity.
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.init import torch_conv_kernel_init, torch_bias_init

Dtype = Any


def act_fn(kind: str = "lrelu") -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation factory (reference models.py:175-181)."""
    k = (kind or "lrelu").lower()
    if k.startswith("lrel"):
        return lambda x: nn.leaky_relu(x, negative_slope=1e-2)
    if k.startswith("relu"):
        return nn.relu
    return nn.gelu


import os as _os

# custom fast-wgrad conv path (ops/fast_conv.py). 8x faster wgrad in
# isolated single-conv programs, but XLA's full-graph algorithm choice is
# already equivalent (measured: identical 161 ms step either way), so the
# default stays off; SPCCT_FAST_WGRAD=1 enables it.
_FAST_WGRAD = _os.getenv("SPCCT_FAST_WGRAD", "0") == "1"


def _use_pallas_conv() -> bool:
    """CW-layout Pallas conv kernels (ops/pallas_conv.py) for the SAME/stride-1
    (kd,3,3) body convs: the isolated kernel is ~4x XLA at the Cout=32
    full-resolution level (the MXU-lane-occupancy fix), but the end-to-end
    step currently loses to XLA on layout boundaries (see BASELINE.md perf
    log) — default OFF until the integration nets a win."""
    return _os.getenv("SPCCT_PALLAS_CONV") == "1"


class _RawConv(nn.Module):
    """Parameter-owning conv core (named 'Conv_0' by Conv3d for checkpoint
    compatibility with the previous nn.Conv-based layout).

    Accepts either one array or a tuple of arrays. A tuple means a *virtual
    concatenation* along channels: the parameter is the single
    (k, k, k, sum(Cin_i), Cout) kernel a conv-of-concat would own, but the
    result is computed as the sum of per-input convs over channel slices of
    that kernel. Identical math and parameter tree; the concatenated tensor
    (and, in the backward pass, its grad-of-concat split buffers) never
    materialize. On TPU this matters doubly at small channel counts, where
    XLA lane-pads the channel dim of conv temporaries up to 10x (measured:
    SwinUNETR full-res decoder1, BASELINE.md round-3)."""
    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int]
    padding: Any
    dilation: Tuple[int, int, int]
    use_bias: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        xs = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        cin = sum(p.shape[-1] for p in xs)
        fan_in = cin * math.prod(self.kernel_size)
        kernel = self.param("kernel", torch_conv_kernel_init,
                            self.kernel_size + (cin, self.features), jnp.float32)
        k = kernel.astype(self.dtype)
        # flax freezes list attrs to (nested) tuples — normalize before compare
        symmetric = (self.padding is None or
                     tuple(map(tuple, self.padding)) ==
                     tuple((kk // 2, kk // 2) for kk in self.kernel_size))
        pad = self.padding
        if pad is None:
            pad = [(d * (kk // 2), d * (kk // 2))
                   for kk, d in zip(self.kernel_size, self.dilation)]

        from ..ops import pallas_conv as _pc

        def one(xp: jnp.ndarray, kp: jnp.ndarray) -> jnp.ndarray:
            xc = xp.astype(self.dtype)
            if (symmetric and self.dtype == jnp.bfloat16
                    and _pc._supported(xp.shape, kp.shape, self.strides,
                                       self.dilation, None)
                    and ((_use_pallas_conv()
                          and _pc._profitable(xp.shape, kp.shape))
                         or _pc._memory_rescue(xp.shape, kp.shape))):
                return _pc.conv3d_spectral(xc, kp)
            # small-channel 1x1x1 convs at full resolution (UNETR/Swin skip
            # projections, cin<=24, and the decoder heads): XLA materializes
            # their channels-last operands/cotangents with C on the 128
            # lanes — measured 4.00 GiB for a (1,32,512,512,12) temp, 21.3x
            # pad (SwinUNETR compile OOM log, BASELINE.md round-3). Zero-
            # embedding the kernel into the CW Pallas conv's (1,3,3) form
            # keeps W on the lanes (1.3x pad); the 9x FLOP cost is ~0.5 ms
            # at these channel counts. Grad of the embed pad is a slice, so
            # autodiff recovers the exact (1,1,1) kernel gradient.
            if (self.kernel_size == (1, 1, 1) and self.dtype == jnp.bfloat16
                    and self.strides == (1, 1, 1)
                    and kp.shape[3] <= 24 and kp.shape[4] <= 16
                    and _pc._memory_rescue(xp.shape,
                                           (1, 3, 3) + kp.shape[3:], embed=True)):
                ke = jnp.pad(kp, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
                if _pc._supported(xp.shape, ke.shape, self.strides,
                                  self.dilation, None):
                    return _pc.conv3d_spectral(xc, ke)
            # single-channel 2x-strided patch embed (Swin patch_embed on the
            # (B,32,512,512,1) depth-padded volume): lax.conv wants the bf16
            # input copy in a C-minor T(2,128) layout — 256x pad, 4.00 GiB
            # for a 16 MB tensor (SwinUNETR OOM log). Decomposed into the 8
            # strided sub-grids x broadcast weights, everything stays in
            # clean 4D layouts and XLA fuses the slices into one output
            # fusion; backward is interior-pad scatter + small reductions.
            if (self.kernel_size == (2, 2, 2) and self.strides == (2, 2, 2)
                    and xp.shape[-1] == 1 and self.dtype == jnp.bfloat16
                    and xp.shape[3] >= 512
                    and all(tuple(p) == (0, 0) for p in pad)
                    and _os.getenv("SPCCT_PALLAS_RESCUE", "1") != "0"):
                x4 = xc[..., 0]                        # (B, F, H, W)
                y = None
                for i in range(2):
                    for j in range(2):
                        for kk in range(2):
                            part = (x4[:, i::2, j::2, kk::2][..., None]
                                    * kp[i, j, kk, 0][None, None, None, None, :])
                            y = part if y is None else y + part
                return y
            if (_FAST_WGRAD and symmetric and self.strides == (1, 1, 1)
                    and self.dilation == (1, 1, 1)):
                from ..ops.fast_conv import conv3d_fast
                return conv3d_fast(xc, kp)
            dn = jax.lax.conv_dimension_numbers(
                xp.shape, kp.shape, ("NDHWC", "DHWIO", "NDHWC"))
            return jax.lax.conv_general_dilated(
                xc, kp, self.strides, pad, rhs_dilation=self.dilation,
                dimension_numbers=dn)

        off, y = 0, None
        for xp in xs:
            ci = xp.shape[-1]
            kp = k if len(xs) == 1 else jax.lax.slice_in_dim(
                k, off, off + ci, axis=-2)
            yi = one(xp, kp)
            y = yi if y is None else y + yi
            off += ci
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(fan_in),
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class Conv3d(nn.Module):
    """torch.nn.Conv3d equivalent: channels-last conv, torch init, custom
    fast-wgrad backward for the stride-1 body convs."""
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = None          # None → torch-style symmetric = k//2
    dilation: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        # x: array, or tuple of arrays = virtual channel-concat (see _RawConv)
        return _RawConv(
            self.features, tuple(self.kernel_size), tuple(self.strides),
            self.padding, tuple(self.dilation), self.use_bias, self.dtype,
            name="Conv_0",
        )(x)


class _ConvKernelParam(nn.Module):
    """Kernel-only param holder matching _RawConv's 'kernel' (same name,
    shape, init) so megakernel and plain checkpoints interchange."""
    features: int
    kernel_size: Tuple[int, int, int]

    @nn.compact
    def __call__(self, cin: int) -> jnp.ndarray:
        return self.param("kernel", torch_conv_kernel_init,
                          tuple(self.kernel_size) + (cin, self.features),
                          jnp.float32)


class FusedINActConv(nn.Module):
    """IN+lrelu+conv as one Pallas megakernel (ops/pallas_conv.py
    conv3d_in_act). Parameter tree mirrors Conv3d (<name>/Conv_0/kernel);
    the norm's scale/bias are passed in from a raw_params Norm3d so the
    GroupNorm params stay under the Norm module's path. bias-free, SAME,
    stride 1 — the UNet body junction shape."""
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: jnp.ndarray,
                 bias: jnp.ndarray) -> jnp.ndarray:
        kernel = _ConvKernelParam(self.features, tuple(self.kernel_size),
                                  name="Conv_0")(x.shape[-1])
        from ..ops.pallas_conv import conv3d_in_act
        return conv3d_in_act(x.astype(self.dtype), kernel, scale, bias)


def channels_of(x) -> int:
    """Channel count of an array or of a virtual-concat tuple."""
    if isinstance(x, (tuple, list)):
        return sum(p.shape[-1] for p in x)
    return x.shape[-1]


def skip_join(up: jnp.ndarray, skip: jnp.ndarray, prefer: bool = False):
    """Join a decoder feature with its skip connection for the next conv.

    Small-channel joins return the (up, skip) tuple that Conv3d consumes as
    a virtual concatenation — conv(concat(up, skip)) computed as two convs
    over slices of one kernel parameter, so the 2C-channel tensor (and its
    grad-of-concat split buffers) never materializes. This is a *memory*
    rescue: it is what lets SwinUNETR's C=12 full-resolution decoder fit
    16 GB HBM (BASELINE.md round-3). At larger channel counts the split
    convs measurably lose to XLA's conv-of-concat (SPFF bench 30.7 →
    27.4 patches/s with virtual concat everywhere — round-3 bisect
    b_xla row), so joins above the threshold use a real concatenate,
    reproducing the round-2 graph. SPCCT_VCAT_MAXC overrides the
    threshold; SPCCT_REAL_CONCAT=1 forces real concat everywhere.
    (Reference materializes torch.cat at every decoder stage, e.g.
    innovative3D/models.py:698-700.)

    prefer=True (set by the depth-padded memory-critical recipes — SP_UNet
    pad16, 3DUNet depth16, whose full-resolution steps sit within ~1 GB of
    the HBM budget) keeps the virtual form at every channel count."""
    if _os.getenv("SPCCT_REAL_CONCAT") == "1":
        return jnp.concatenate([up, skip], axis=-1)
    maxc = int(_os.getenv("SPCCT_VCAT_MAXC", "16"))
    if prefer or min(up.shape[-1], skip.shape[-1]) <= maxc:
        return (up, skip)
    return jnp.concatenate([up, skip], axis=-1)


class ConvTranspose3d(nn.Module):
    """torch.nn.ConvTranspose3d(k, stride=k) equivalent (exact when k == s)."""
    features: int
    kernel_size: Tuple[int, int, int] = (2, 2, 2)
    strides: Tuple[int, int, int] = (2, 2, 2)
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        fan_in = cin * math.prod(self.kernel_size)
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class _GNParams(nn.Module):
    """Scale/bias holder executing the fused IN+lrelu op; named 'GroupNorm_0'
    by Norm3d so the parameter tree matches the unfused flax GroupNorm.
    raw=True returns the (scale, bias) params without computing — used by
    the megakernel path, which consumes them inside conv3d_in_act."""
    raw: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.raw:
            return scale, bias
        from ..ops.fused_norm import instance_norm_lrelu
        return instance_norm_lrelu(x, scale, bias)


class Norm3d(nn.Module):
    """Norm factory (reference models.py:168-173): instance/batch/group/none.

    Instance norm == GroupNorm(group_size=1) over (D,H,W) per sample/channel,
    affine, eps 1e-5 — matching torch InstanceNorm3d(affine=True).
    BatchNorm matches torch momentum 0.1 (flax momentum = 0.9).
    fused_lrelu folds the LeakyReLU into a custom-vjp op with a closed-form
    backward (ops/fused_norm.py) — same math, fewer backward passes.
    """
    kind: str = "instance"
    dtype: Dtype = jnp.float32
    fused_lrelu: bool = False
    # raw_params=True creates the same GroupNorm_0/{scale,bias} params but
    # returns them instead of normalizing — the megakernel junction
    # (DoubleConvSpectral) feeds them into conv3d_in_act.
    raw_params: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.raw_params:
            return _GNParams(name="GroupNorm_0", raw=True)(x)
        if self.fused_lrelu and (self.kind or "instance").lower().startswith("inst"):
            return _GNParams(name="GroupNorm_0")(x)
        # flax normalization layers compute mean/var in float32 internally
        # regardless of `dtype` (promoted stats), so passing the activation
        # dtype straight through is numerically safe and avoids two extra
        # full-tensor cast passes per norm site (significant: ~30 norm sites
        # per UNet, fwd+bwd, on 84 MB activations).
        k = (self.kind or "instance").lower()
        if k.startswith("inst"):
            c = x.shape[-1]
            return nn.GroupNorm(num_groups=c, epsilon=1e-5, dtype=x.dtype)(x)
        if k.startswith("batch"):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=x.dtype,
            )(x)
        if k.startswith("group"):
            c = x.shape[-1]
            return nn.GroupNorm(num_groups=max(1, c // 8), epsilon=1e-5,
                                dtype=x.dtype)(x)
        return x


class ConvNormAct3d(nn.Module):
    """Conv → Norm → Act (reference ConvBNAct3d, models.py:183-190)."""
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = None
    dilation: Tuple[int, int, int] = (1, 1, 1)
    norm: str = "instance"
    act: str = "lrelu"
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Conv3d(self.features, self.kernel_size, self.strides, self.padding,
                   self.dilation, self.use_bias, dtype=self.dtype)(x)
        x = Norm3d(self.norm, dtype=self.dtype)(x, train=train)
        return act_fn(self.act)(x)


def max_pool_3d(x: jnp.ndarray, window: Tuple[int, int, int]) -> jnp.ndarray:
    """torch MaxPool3d(window) equivalent (stride = window, no padding)."""
    return nn.max_pool(x, window_shape=window, strides=window)


def global_avg_pool(x: jnp.ndarray, axes: Sequence[int], keepdims: bool = True) -> jnp.ndarray:
    return jnp.mean(x.astype(jnp.float32), axis=tuple(axes), keepdims=keepdims).astype(x.dtype)


class SEChannelLite(nn.Module):
    """Channel squeeze-excite, hidden = max(4, c//r) (reference models.py:600-609)."""
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        h = max(4, c // self.reduction)
        s = global_avg_pool(x, (1, 2, 3))            # (B,1,1,1,C)
        s = Conv3d(h, (1, 1, 1), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = Conv3d(c, (1, 1, 1), dtype=self.dtype)(s)
        return x * jax.nn.sigmoid(s)


class SE3D(nn.Module):
    """SE with hidden = max(1, c//r) (reference models.py:407-419)."""
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        h = max(1, c // self.reduction)
        s = global_avg_pool(x, (1, 2, 3))
        s = Conv3d(h, (1, 1, 1), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = Conv3d(c, (1, 1, 1), dtype=self.dtype)(s)
        return x * jax.nn.sigmoid(s)


class SEBlock3D(nn.Module):
    """Bias-free SE (reference models.py:338-350)."""
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        h = max(1, c // self.reduction)
        s = global_avg_pool(x, (1, 2, 3))
        s = Conv3d(h, (1, 1, 1), use_bias=False, dtype=self.dtype)(s)
        s = nn.relu(s)
        s = Conv3d(c, (1, 1, 1), use_bias=False, dtype=self.dtype)(s)
        return x * jax.nn.sigmoid(s)


class SpectralSE(nn.Module):
    """Parameter-free per-depth gate: x * sigmoid(mean over C,H,W)
    (reference models.py:611-614)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = jnp.mean(x.astype(jnp.float32), axis=(2, 3, 4), keepdims=True)  # (B,D,1,1,1)
        return x * jax.nn.sigmoid(w).astype(x.dtype)


class SpectralGate(nn.Module):
    """Gating along the spectral axis via (3,1,1) convs on pooled stats
    (reference models.py:352-364)."""
    hidden: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        h = max(4, min(self.hidden, c))
        s = jnp.mean(x.astype(jnp.float32), axis=(2, 3), keepdims=True).astype(x.dtype)  # (B,D,1,1,C)
        s = Conv3d(h, (3, 1, 1), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = Conv3d(c, (3, 1, 1), dtype=self.dtype)(s)
        return x * jax.nn.sigmoid(s)


class SpatialAttention3D(nn.Module):
    """CBAM-style spatial attention (reference models.py:434-446)."""
    kernel_size: Tuple[int, int, int] = (3, 7, 7)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        a = jnp.concatenate([avg, mx], axis=-1)
        a = Conv3d(1, self.kernel_size, use_bias=False, dtype=self.dtype)(a)
        return x * jax.nn.sigmoid(a)


class AttentionGate(nn.Module):
    """3D additive attention gate on skip connections
    (reference models.py:627-645). Returns gated skip."""
    inter_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_skip: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
        f_int = self.inter_channels
        if f_int is None:
            f_int = min(x_skip.shape[-1], g.shape[-1])
        f_int = max(1, int(f_int))
        ax = Conv3d(f_int, (1, 1, 1), dtype=self.dtype)(x_skip)
        ag = Conv3d(f_int, (1, 1, 1), dtype=self.dtype)(g)
        att = nn.relu(ax + ag)
        att = Conv3d(1, (1, 1, 1), dtype=self.dtype)(att)
        return x_skip * jax.nn.sigmoid(att)


class SPConvBlock(nn.Module):
    """Two spatial (1,3,3) convs + optional spectral (3,1,1) mix + optional
    SpectralGate (reference models.py:366-383)."""
    features: int
    norm: str = "instance"
    act: str = "lrelu"
    mix_spectral: bool = True
    use_gate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(norm=self.norm, act=self.act, dtype=self.dtype)
        x = ConvNormAct3d(self.features, (1, 3, 3), **kw)(x, train)
        x = ConvNormAct3d(self.features, (1, 3, 3), **kw)(x, train)
        if self.mix_spectral:
            x = ConvNormAct3d(self.features, (3, 1, 1), **kw)(x, train)
        if self.use_gate:
            x = SpectralGate(dtype=self.dtype)(x)
        return x


class SpectralTemporalMixer2D(nn.Module):
    """2D spectral mixer: 1x1 conv over frame-channels + SE-style gate
    (reference models.py:385-405). Input (B, H, W, F) → (B, H, W, Cmix)."""
    out_channels: int = 64
    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        z = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    kernel_init=torch_conv_kernel_init,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        w = jnp.mean(z.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(z.dtype)
        hidden = max(1, self.out_channels // self.reduction)
        w = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32,
                    kernel_init=torch_conv_kernel_init)(w)
        w = nn.relu(w)
        w = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32,
                    kernel_init=torch_conv_kernel_init)(w)
        return z * jax.nn.sigmoid(w)


class Up3D(nn.Module):
    """(1,2,2) transpose-conv upsample + concat skip + DoubleConv + SE
    (reference models.py:448-461)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        up = ConvTranspose3d(x.shape[-1] // 2, (1, 2, 2), (1, 2, 2),
                             dtype=self.dtype)(x)
        diffs = [skip.shape[i] - up.shape[i] for i in (1, 2, 3)]
        if any(d != 0 for d in diffs):
            pads = [(0, 0)] + [(0, max(0, d)) for d in diffs] + [(0, 0)]
            up = jnp.pad(up, pads)
        y = jnp.concatenate([skip, up], axis=-1)
        y = DoubleConv3D(self.features, dtype=self.dtype)(y, train)
        return SE3D(dtype=self.dtype)(y)


class ResidualConvBlock3D(nn.Module):
    """conv-relu-conv + 1x1 skip, relu after add (reference models.py:307-321)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x if x.shape[-1] == self.features else Conv3d(
            self.features, (1, 1, 1), use_bias=False, dtype=self.dtype)(x)
        out = nn.relu(Conv3d(self.features, use_bias=False, dtype=self.dtype)(x))
        out = Conv3d(self.features, use_bias=False, dtype=self.dtype)(out)
        return nn.relu(out + identity)


class ASPP3D(nn.Module):
    """Atrous pyramid, dilations (1,2,4,8) + 1x1 projection
    (reference models.py:323-336)."""
    features: int
    dilations: Tuple[int, ...] = (1, 2, 4, 8)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = [
            Conv3d(self.features, (3, 3, 3), dilation=(d, d, d), use_bias=False,
                   dtype=self.dtype)(x)
            for d in self.dilations
        ]
        y = jnp.concatenate(feats, axis=-1)
        y = Conv3d(self.features, (1, 1, 1), use_bias=False, dtype=self.dtype)(y)
        return nn.relu(y)


class DoubleConv3D(nn.Module):
    """(conv-BN-relu) x2 (reference models.py:421-432)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for _ in range(2):
            x = Conv3d(self.features, use_bias=False, dtype=self.dtype)(x)
            x = Norm3d("batch", dtype=self.dtype)(x, train=train)
            x = nn.relu(x)
        return x


class ResidualUnit3D(nn.Module):
    """conv-IN-relu-conv-IN + 1x1 skip, relu after add
    (reference models.py:1295-1308)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        if channels_of(x) == self.features:
            s = jnp.concatenate(x, -1) if isinstance(x, (tuple, list)) else x
        else:
            s = Conv3d(
                self.features, (1, 1, 1), use_bias=False, dtype=self.dtype)(x)
        y = Conv3d(self.features, use_bias=False, dtype=self.dtype)(x)
        y = Norm3d("instance", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = Conv3d(self.features, use_bias=False, dtype=self.dtype)(y)
        y = Norm3d("instance", dtype=self.dtype)(y)
        return nn.relu(y + s)


class RecurrentUnit3D(nn.Module):
    """Weight-shared recurrent conv unit, t steps (reference models.py:1121-1135).

    The reference's loop is `out = act(IN(conv(out + h))); h = out` with
    h0 = 0 — a fixed-depth unrolled scan sharing conv/norm parameters.
    """
    features: int
    t: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = Conv3d(self.features, use_bias=False, dtype=self.dtype)
        norm = Norm3d("instance", dtype=self.dtype)
        h = jnp.zeros_like(x)
        out = x
        for _ in range(self.t):
            out = nn.relu(norm(conv(out + h)))
            h = out
        return out


class RRCNNBlock3D(nn.Module):
    """1x1 lift → recurrent unit → 1x1 project + residual, IN+relu
    (reference models.py:1137-1149)."""
    features: int
    t: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x1 = Conv3d(self.features, (1, 1, 1), use_bias=False, dtype=self.dtype)(x)
        y = RecurrentUnit3D(self.features, self.t, dtype=self.dtype)(x1)
        y = Conv3d(self.features, (1, 1, 1), use_bias=False, dtype=self.dtype)(y)
        y = Norm3d("instance", dtype=self.dtype)(x1 + y)
        return nn.relu(y)
