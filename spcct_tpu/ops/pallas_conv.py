# pallas_conv.py — MXU-saturating (kd,3,3) spectral conv kernels, CW layout.
#
# Why this exists (BASELINE.md round-1 attribution): XLA's conv_general at the
# SPFF full-resolution shapes (Cout=32 @ 512x512) sustains only ~11 TF/s
# because output channels fill 32 of the 128 MXU lanes. These kernels
# restructure the conv as A(Cout, 3*3*kd*Cin) @ B(3*3*kd*Cin, W): the *width*
# axis fills the lanes and the tap-x-channel contraction fills the rows.
# Measured on v5e (scripts/pallas_conv_proto.py): ~44 TF/s at Cout=32/512²
# vs XLA's ~11-13 — i.e. ~90% of the M=Cout/128 occupancy ceiling.
#
# Layout contract: kernels take x as (F, H, C, W) ("CW layout"); the public
# conv3d_spectral() wrapper accepts the framework-standard channels-last
# (B, F, H, W, C) and pays two cheap transposes at the boundary. Backward is
# a custom VJP: dx is the same kernel with tap-flipped/IO-swapped weights,
# dw is a dedicated reduction kernel accumulating (Cout, K) in VMEM across
# the sequential TPU grid.
#
# Reference equivalent: the (ksd,3,3) convs inside _DoubleConvSpectral
# (innovative3D/models.py:616-625); the reference uses cuDNN via nn.Conv3d.
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Interpret-mode toggle so the kernels run (slowly) on the CPU test
    backend; read per-call so tests can flip it without reimport."""
    if os.getenv("SPCCT_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() == "cpu"


def _supported(shape_cl: Tuple[int, ...], kshape: Tuple[int, ...],
               strides, dilation, padding) -> bool:
    """Eligibility for the Pallas path: SAME-padded stride-1 undilated
    (kd,3,3) conv, W a multiple of 128, H a multiple of the row tile."""
    if len(shape_cl) != 5 or len(kshape) != 5:
        return False
    B, F, H, W, C = shape_cl
    kd, kh, kw, cin, cout = kshape
    if (kh, kw) != (3, 3) or kd % 2 != 1 or kd > 3:
        return False
    if tuple(strides) != (1, 1, 1) or tuple(dilation) != (1, 1, 1):
        return False
    if padding is not None:
        want = [(kd // 2, kd // 2), (1, 1), (1, 1)]
        if list(map(tuple, padding)) != [tuple(p) for p in want]:
            return False
    if W % 128 != 0 or H % _row_tile(H) != 0:
        return False
    if cout % 8 != 0:
        return False
    if cin % 2 != 0:
        # bf16 sublane tiling is 2: a C=1 DMA slice fails Mosaic alignment
        # (and the cin=1 stem conv is IO-bound anyway — XLA handles it).
        return False
    return True


def _profitable(shape_cl: Tuple[int, ...], kshape: Tuple[int, ...]) -> bool:
    """Measured on v5e (scripts/pallas_conv_proto.py --shapes): the CW kernel
    wins when XLA is lane-starved (small cout) on wide rows — ~4x at
    cout=32/512², ~1.4x at cout<=64/256² — and loses to XLA's 150+ TF/s conv
    at the deep levels (cout=128, W=128). Use it only in the winning region.
    SPCCT_PALLAS_MINW / SPCCT_PALLAS_MAXCOUT narrow the region (bisection)."""
    W = shape_cl[3]
    cout = kshape[4]
    minw = int(os.getenv("SPCCT_PALLAS_MINW", "256"))
    maxco = int(os.getenv("SPCCT_PALLAS_MAXCOUT", "64"))
    return cout <= maxco and W >= minw


def _row_tile(H: int) -> int:
    return 8 if H % 8 == 0 else 1


# ─────────────────────────── forward ───────────────────────────

def _fwd_kernel(x_hbm, a_ref, o_ref, raw, shf, sem, *, HT, C, W, kd, cout):
    """Output rows [h0, h0+HT) of (batch b, frame f).

    x_hbm : (B, F+2p, H+2, C, Wp) bf16 in HBM (pre-padded, p=kd//2)
    a_ref : (cout, 9*kd*C) bf16 VMEM — weight cols ordered (dh, dw, dd, ci)
    o_ref : (1, 1, HT, cout, W) bf16 VMEM block
    raw   : (HT+2, kd, C, Wp) scratch; shf: (HT+2, 3, kd, C, W) scratch
    """
    b = pl.program_id(0)
    f = pl.program_id(1)
    h0 = pl.program_id(2) * HT

    for j in range(kd):
        pltpu.make_async_copy(
            x_hbm.at[b, f + j, pl.ds(h0, HT + 2)], raw.at[:, j], sem.at[j]).start()
    for j in range(kd):
        pltpu.make_async_copy(
            x_hbm.at[b, f + j, pl.ds(h0, HT + 2)], raw.at[:, j], sem.at[j]).wait()

    for dw in range(3):  # three lane-shifted copies implement the dw taps
        shf[:, dw] = raw[:, :, :, dw:dw + W]

    K = 9 * kd * C
    for i in range(HT):
        b_mat = shf[i:i + 3].reshape(K, W)
        d = jax.lax.dot_general(a_ref[:], b_mat, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, 0, i] = d.astype(o_ref.dtype)


def _conv_cw(x_cw: jnp.ndarray, a: jnp.ndarray, *, kd: int, cout: int,
             HT: int) -> jnp.ndarray:
    """x_cw: (B, F, H, C, W) bf16; a: (cout, 9*kd*C) bf16 → (B, F, H, cout, W)."""
    B, F, H, C, W = x_cw.shape
    p = kd // 2
    Wp = ((W + 2 + 127) // 128) * 128
    xp = jnp.pad(x_cw, ((0, 0), (p, p), (1, 1), (0, 0), (1, Wp - W - 1)))
    kern = functools.partial(_fwd_kernel, HT=HT, C=C, W=W, kd=kd, cout=cout)
    return pl.pallas_call(
        kern,
        grid=(B, F, H // HT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, HT, cout, W),
                               lambda b, f, h: (b, f, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, H, cout, W), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((HT + 2, kd, C, Wp), jnp.bfloat16),
            pltpu.VMEM((HT + 2, 3, kd, C, W), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((kd,)),
        ],
        interpret=_interpret(),
    )(xp, a)


# ─────────────────────────── weight grad ───────────────────────────

def _dw_kernel(x_hbm, dy_hbm, o_ref, raw, shf, gy, gyt, acc, sem, gsem, *,
               HT, C, W, kd, cout, nsteps):
    """Accumulates dW(9*kd*C, cout) over the whole (B,F,H) grid.

    Same x slab/shift staging as forward; per output row the rank-W update
    B_row(K, W) @ dy_row^T(W, cout) lands in an f32 VMEM accumulator; the
    final grid step writes it out (TPU grid iterations are sequential).
    """
    b = pl.program_id(0)
    f = pl.program_id(1)
    hblk = pl.program_id(2)
    h0 = hblk * HT
    step = (b * pl.num_programs(1) + f) * pl.num_programs(2) + hblk

    for j in range(kd):
        pltpu.make_async_copy(
            x_hbm.at[b, f + j, pl.ds(h0, HT + 2)], raw.at[:, j], sem.at[j]).start()
    pltpu.make_async_copy(
        dy_hbm.at[b, f, pl.ds(h0, HT)], gy, gsem).start()
    for j in range(kd):
        pltpu.make_async_copy(
            x_hbm.at[b, f + j, pl.ds(h0, HT + 2)], raw.at[:, j], sem.at[j]).wait()
    pltpu.make_async_copy(
        dy_hbm.at[b, f, pl.ds(h0, HT)], gy, gsem).wait()

    for dw in range(3):
        shf[:, dw] = raw[:, :, :, dw:dw + W]

    @pl.when(step == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    K = 9 * kd * C
    # transpose the (small) dy slab once so the contraction over W runs in
    # MXU-natural form: A(K, W) @ B(W, cout) — W on A-lanes / B-sublanes.
    # (Contracting lanes-with-lanes would force Mosaic to transpose the big
    # (K, W) operand every row — measured 9x slower end-to-end.)
    for i in range(HT):
        gyt[:, :] = gy[i].T
        b_mat = shf[i:i + 3].reshape(K, W)
        upd = jax.lax.dot_general(b_mat, gyt[:, :], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc[:] += upd

    @pl.when(step == nsteps - 1)
    def _flush():
        o_ref[:] = acc[:]


def _conv_cw_dw(x_cw: jnp.ndarray, dy_cw: jnp.ndarray, *, kd: int,
                HT: int) -> jnp.ndarray:
    """x_cw: (B,F,H,C,W); dy_cw: (B,F,H,cout,W) → dA (9*kd*C, cout) f32."""
    B, F, H, C, W = x_cw.shape
    cout = dy_cw.shape[3]
    p = kd // 2
    Wp = ((W + 2 + 127) // 128) * 128
    xp = jnp.pad(x_cw, ((0, 0), (p, p), (1, 1), (0, 0), (1, Wp - W - 1)))
    K = 9 * kd * C
    nsteps = B * F * (H // HT)
    kern = functools.partial(_dw_kernel, HT=HT, C=C, W=W, kd=kd, cout=cout,
                             nsteps=nsteps)
    return pl.pallas_call(
        kern,
        grid=(B, F, H // HT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((HT + 2, kd, C, Wp), jnp.bfloat16),
            pltpu.VMEM((HT + 2, 3, kd, C, W), jnp.bfloat16),
            pltpu.VMEM((HT, cout, W), jnp.bfloat16),
            pltpu.VMEM((W, cout), jnp.bfloat16),
            pltpu.VMEM((K, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((kd,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(xp, dy_cw)


# ─────────────────────────── public op ───────────────────────────

def _pack_a(w: jnp.ndarray) -> jnp.ndarray:
    """(kd,3,3,Cin,Cout) → A(Cout, 9*kd*Cin), cols ordered (dh, dw, dd, ci)
    to match the shifted-scratch flattening in the kernels."""
    return jnp.transpose(w, (4, 1, 2, 0, 3)).reshape(
        w.shape[4], 9 * w.shape[0] * w.shape[3])


def _unpack_da(da: jnp.ndarray, kd: int, cin: int, cout: int) -> jnp.ndarray:
    """(9*kd*cin, cout) with row order (dh, dw, dd, ci) → (kd,3,3,cin,cout)."""
    return jnp.transpose(da.reshape(3, 3, kd, cin, cout), (2, 0, 1, 3, 4))


def _flip_w(w: jnp.ndarray) -> jnp.ndarray:
    """Weights for the input gradient: flip all taps, swap Cin/Cout."""
    return jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3d_spectral(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME-padded stride-1 (kd,3,3) conv, channels-last (B,F,H,W,C) bf16.

    Equivalent to lax.conv_general_dilated(..., NDHWC/DHWIO/NDHWC) with f32
    MXU accumulation, but lowered to the CW-layout Pallas kernels above.
    Callers must check _supported() first (see models/layers.py _RawConv).
    """
    y, _ = _fwd(x, w)
    return y


def _fwd(x, w):
    kd, _, _, cin, cout = w.shape
    HT = _row_tile(x.shape[2])
    x_cw = jnp.transpose(x, (0, 1, 2, 4, 3)).astype(jnp.bfloat16)
    a = _pack_a(w).astype(jnp.bfloat16)
    y_cw = _conv_cw(x_cw, a, kd=kd, cout=cout, HT=HT)
    y = jnp.transpose(y_cw, (0, 1, 2, 4, 3))
    return y, (x_cw, w)


def _bwd(res, dy):
    x_cw, w = res
    kd, _, _, cin, cout = w.shape
    if os.getenv("SPCCT_PALLAS_BWD", "1") == "0":
        # bisection mode: Pallas forward, XLA backward (transposed conv for
        # dx, conv-as-wgrad for dw on the channels-last residual)
        x = jnp.transpose(x_cw, (0, 1, 2, 4, 3))
        _, vjp = jax.vjp(lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww.astype(xx.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), x, w)
        return vjp(dy.astype(jnp.bfloat16))
    HT = _row_tile(x_cw.shape[2])
    dy_cw = jnp.transpose(dy, (0, 1, 2, 4, 3)).astype(jnp.bfloat16)
    # dx: same conv with tap-flipped, IO-swapped weights
    a_flip = _pack_a(_flip_w(w)).astype(jnp.bfloat16)
    dx_cw = _conv_cw(dy_cw, a_flip, kd=kd, cout=cin, HT=HT)
    dx = jnp.transpose(dx_cw, (0, 1, 2, 4, 3)).astype(jnp.bfloat16)
    # dw: VMEM-accumulated reduction kernel
    da = _conv_cw_dw(x_cw, dy_cw, kd=kd, HT=HT)
    dw = _unpack_da(da, kd, cin, cout).astype(w.dtype)
    return dx, dw


conv3d_spectral.defvjp(_fwd, _bwd)
