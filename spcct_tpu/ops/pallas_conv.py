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
    # cin/cout alignment is handled by wrapper-level zero padding in
    # _fwd/_bwd (cin to even for the bf16 sublane-2 DMA, cout to a 16
    # multiple when not already 8-aligned), so any channel count works.
    return True


def _pad_cout(c: int) -> int:
    """Kernel-internal output-channel count: multiples of 8 run as-is;
    anything else is zero-row-padded to the bf16 sublane tile (16)."""
    return c if c % 8 == 0 else ((c + 15) // 16) * 16


def _pad_cin(c: int) -> int:
    """The kernels DMA (…, C, W) slabs whose C extent is the sublane dim of
    the (8,128) tile — Mosaic requires it 8-aligned (measured on v5e:
    'Slice shape along dimension 3 must be aligned to tiling (8)'), so
    input channels are zero-padded to a multiple of 8."""
    return ((c + 7) // 8) * 8


def _memory_rescue(shape_cl: Tuple[int, ...], kshape: Tuple[int, ...],
                   embed: bool = False) -> bool:
    """Auto-enable region, independent of the SPCCT_PALLAS_CONV perf knob:
    full-resolution small-channel convs, where XLA's conv-backward temps
    inherit layouts that lane-pad the channel dim up to 10.7x and blow the
    16 GB HBM (measured: SwinUNETR decoder1/encoder1 at 512^2 x D32, C=12 —
    eight 2.03 GiB temps; BASELINE.md round-3). The CW kernel keeps W on
    the lanes so its temps pad ~1x; here the kernel is a *memory* fix
    first, throughput second. SPCCT_PALLAS_RESCUE=0 disables."""
    if os.getenv("SPCCT_PALLAS_RESCUE", "1") == "0":
        return False
    W = shape_cl[3]
    cout = kshape[4]
    # cout <= 12 so only the pathological Swin encoder1/decoder1 shapes
    # switch; R2U/ResUNet++ (cout 16 @ 512^2) fit under XLA already.
    # embed=True marks zero-embedded 1x1x1 projections/heads (layers.py),
    # where cout reaches the 13-class logits head.
    return cout <= (16 if embed else 12) and W >= 512


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
    # SPCCT_PALLAS_HT: rows per grid step (perf knob — larger tiles mean
    # fewer grid iterations and longer uninterrupted MXU chains per step;
    # VMEM scratch grows ~linearly: HT=32 @ C=32/W=512 uses ~14 MB)
    ht = int(os.getenv("SPCCT_PALLAS_HT", "8"))
    if H % ht == 0:
        return ht
    return 8 if H % 8 == 0 else 1


def _conv_cost(B, F, H, W, C, cout, kd, extra_bytes=0):
    """CostEstimate for a CW conv call: accurate FLOPs/bytes let XLA's
    latency-hiding scheduler overlap the custom call instead of assuming
    a default (pallas guide: Compiler Parameters and Cost Estimation)."""
    K = 9 * kd * C
    return pl.CostEstimate(
        flops=2 * B * F * H * W * cout * K,
        bytes_accessed=(B * F * H * C * W + K * cout
                        + B * F * H * cout * W) * 2 + extra_bytes,
        transcendentals=0,
    )


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
        cost_estimate=_conv_cost(B, F, H, W, C, cout, kd),
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
        cost_estimate=_conv_cost(B, F, H, W, C, cout, kd),
        interpret=_interpret(),
    )(xp, dy_cw)


# ─────────────── GSPMD/Shardy partitioning of the kernels ───────────────
#
# Under a device mesh, GSPMD treats a bare pallas_call as opaque and
# ALL-GATHERS its operands to run it replicated (measured on the virtual
# 8-device mesh: f32[8,...] all-gather + dynamic-slice around the call) —
# which both wastes the mesh and defeats the small-channel memory rescue
# in multi-chip runs. These wrappers register batch-dim partitioning rules
# (Shardy sharding_rule strings + GSPMD callbacks): the conv kernels are
# embarrassingly parallel over B, and the dw reduction psums its per-shard
# partial sums over the batch-sharded mesh axes.

_CP_CACHE: dict = {}


def _named(mesh, *spec):
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(mesh, PartitionSpec(*spec))


def _batch_spec(arg_info):
    sh = getattr(arg_info, "sharding", None)
    spec = getattr(sh, "spec", None)
    if not spec:
        return None
    return spec[0]


def _axis_names(spec) -> tuple:
    if spec is None:
        return ()
    return (spec,) if isinstance(spec, str) else tuple(spec)


def _cp_conv_cw(kd: int, cout: int, HT: int):
    """Batch-partitioned _conv_cw; one cached custom_partitioning instance
    per static (kd, cout, HT) configuration."""
    key = ("cw", kd, cout, HT)
    if key in _CP_CACHE:
        return _CP_CACHE[key]
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def fn(x_cw, a):
        return _conv_cw(x_cw, a, kd=kd, cout=cout, HT=HT)

    def infer(mesh, arg_infos, result_infos):
        return _named(mesh, _batch_spec(arg_infos[0]), None, None, None, None)

    def part(mesh, arg_infos, result_infos):
        b = _batch_spec(arg_infos[0])
        arg_sh = (_named(mesh, b, None, None, None, None), _named(mesh))
        out_sh = _named(mesh, b, None, None, None, None)

        def lower(x_local, a_local):
            return _conv_cw(x_local, a_local, kd=kd, cout=cout, HT=HT)

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(part, infer_sharding_from_operands=infer,
                     sharding_rule="b f h c w, o k -> b f h o w",
                     need_replication_factors=("f", "h", "c", "w", "o", "k"))
    _CP_CACHE[key] = fn
    return fn


def _cp_conv_cw_dw(kd: int, HT: int, K: int, cout: int):
    """Batch-partitioned _conv_cw_dw: per-shard partial (K, cout) sums,
    psum'd over the batch-sharded mesh axes inside the partition body."""
    key = ("dw", kd, HT, K, cout)
    if key in _CP_CACHE:
        return _CP_CACHE[key]
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def fn(x_cw, dy_cw):
        return _conv_cw_dw(x_cw, dy_cw, kd=kd, HT=HT)

    def infer(mesh, arg_infos, result_infos):
        return _named(mesh)

    def part(mesh, arg_infos, result_infos):
        b = _batch_spec(arg_infos[0])
        axes = _axis_names(b)
        arg_sh = (_named(mesh, b, None, None, None, None),
                  _named(mesh, b, None, None, None, None))
        out_sh = _named(mesh)

        def lower(x_local, dy_local):
            da = _conv_cw_dw(x_local, dy_local, kd=kd, HT=HT)
            if axes:
                da = jax.lax.psum(da, axes)
            return da

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(part, infer_sharding_from_operands=infer,
                     sharding_rule="b f h c w, b f h o w -> k o",
                     reduction_factors=("b",),
                     need_replication_factors=("f", "h", "c", "w", "o", "k"))
    _CP_CACHE[key] = fn
    return fn


def _maybe_partitioned_cw(x_cw, a, *, kd, cout, HT):
    """Use the partitioned wrapper on multi-device backends; the bare
    pallas_call single-chip (no tracing/compat overhead where it cannot
    matter)."""
    if jax.device_count() > 1:
        return _cp_conv_cw(kd, cout, HT)(x_cw, a)
    return _conv_cw(x_cw, a, kd=kd, cout=cout, HT=HT)


def _maybe_partitioned_dw(x_cw, dy_cw, *, kd, HT):
    if jax.device_count() > 1:
        K = 9 * kd * x_cw.shape[3]
        return _cp_conv_cw_dw(kd, HT, K, dy_cw.shape[3])(x_cw, dy_cw)
    return _conv_cw_dw(x_cw, dy_cw, kd=kd, HT=HT)


def _cp_conv_cw_fused(kd, cout, HT, H, F):
    """Batch-partitioned _conv_cw_fused (B-only sharding: every shard keeps
    full F/H/W, so the static halo-mask bounds are unchanged per shard)."""
    key = ("cwf", kd, cout, HT, H, F)
    if key in _CP_CACHE:
        return _CP_CACHE[key]
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def fn(x_cw, a, nrm):
        return _conv_cw_fused(x_cw, a, nrm, kd=kd, cout=cout, HT=HT, H=H, F=F)

    def infer(mesh, arg_infos, result_infos):
        return _named(mesh, _batch_spec(arg_infos[0]), None, None, None, None)

    def part(mesh, arg_infos, result_infos):
        b = _batch_spec(arg_infos[0])
        arg_sh = (_named(mesh, b, None, None, None, None), _named(mesh),
                  _named(mesh, b, None, None, None))
        out_sh = _named(mesh, b, None, None, None, None)

        def lower(x_local, a_local, nrm_local):
            return _conv_cw_fused(x_local, a_local, nrm_local,
                                  kd=kd, cout=cout, HT=HT, H=H, F=F)

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(part, infer_sharding_from_operands=infer,
                     sharding_rule="b f h c w, o k, b n c u -> b f h o w",
                     need_replication_factors=("f", "h", "c", "w", "o", "k",
                                               "n", "u"))
    _CP_CACHE[key] = fn
    return fn


def _cp_conv_cw_dw_fused(kd, HT, H, F):
    key = ("dwf", kd, HT, H, F)
    if key in _CP_CACHE:
        return _CP_CACHE[key]
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def fn(x_cw, dy_cw, nrm):
        return _conv_cw_dw_fused(x_cw, dy_cw, nrm, kd=kd, HT=HT, H=H, F=F)

    def infer(mesh, arg_infos, result_infos):
        return _named(mesh)

    def part(mesh, arg_infos, result_infos):
        b = _batch_spec(arg_infos[0])
        axes = _axis_names(b)
        arg_sh = (_named(mesh, b, None, None, None, None),
                  _named(mesh, b, None, None, None, None),
                  _named(mesh, b, None, None, None))
        out_sh = _named(mesh)

        def lower(x_local, dy_local, nrm_local):
            da = _conv_cw_dw_fused(x_local, dy_local, nrm_local,
                                   kd=kd, HT=HT, H=H, F=F)
            if axes:
                da = jax.lax.psum(da, axes)
            return da

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(part, infer_sharding_from_operands=infer,
                     sharding_rule="b f h c w, b f h o w, b n c u -> k o",
                     reduction_factors=("b",),
                     # first-appearance order (Shardy verifier requirement)
                     need_replication_factors=("f", "h", "c", "w", "o", "n",
                                               "u", "k"))
    _CP_CACHE[key] = fn
    return fn


def _cp_conv_cw_dx_epi(kd, cout, HT, H, F):
    key = ("dxe", kd, cout, HT, H, F)
    if key in _CP_CACHE:
        return _CP_CACHE[key]
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def fn(dy_cw, x_cw, nrm4, a_flip):
        return _conv_cw_dx_epi(dy_cw, x_cw, nrm4, a_flip,
                               kd=kd, cout=cout, HT=HT, H=H, F=F)

    def infer(mesh, arg_infos, result_infos):
        b = _batch_spec(arg_infos[0])
        return (_named(mesh, b, None, None, None, None),
                _named(mesh, b, None, None, None))

    def part(mesh, arg_infos, result_infos):
        b = _batch_spec(arg_infos[0])
        arg_sh = (_named(mesh, b, None, None, None, None),
                  _named(mesh, b, None, None, None, None),
                  _named(mesh, b, None, None, None),
                  _named(mesh))
        out_sh = (_named(mesh, b, None, None, None, None),
                  _named(mesh, b, None, None, None))

        def lower(dy_local, x_local, nrm_local, a_local):
            return _conv_cw_dx_epi(dy_local, x_local, nrm_local, a_local,
                                   kd=kd, cout=cout, HT=HT, H=H, F=F)

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(part, infer_sharding_from_operands=infer,
                     sharding_rule=("b f h d w, b f h c w, b n c u, c k "
                                    "-> b f h c w, b m c v"),
                     # Shardy requires these listed in first-appearance order
                     need_replication_factors=("f", "h", "d", "w", "c", "n",
                                               "u", "k", "m", "v"))
    _CP_CACHE[key] = fn
    return fn


def _multi_device() -> bool:
    return jax.device_count() > 1


# ──────────────── fused IN+lrelu+conv (megakernel) ────────────────
#
# conv3d_in_act(x, w, scale, bias) = conv(lrelu(instance_norm(x)·scale+bias), w)
# as ONE custom-vjp op whose Pallas kernels apply the norm/act to the input
# slab right after the DMA ("norm-on-load") instead of materializing the
# normalized tensor. What remains for XLA per site: the (B,C) moment reduce
# over x in forward, and one fused correction pass in backward. The
# separate normalize+act write pass (fwd) and the act-mask + norm-backward
# passes (bwd) — the measured 69 ms elementwise tail of the train step,
# BASELINE.md round-1 attribution — happen inside the custom calls.
#
# Backward math (identical to ops/fused_norm.py, which is parity-tested
# against torch InstanceNorm3d+LeakyReLU):
#   z1 = (x-μ)·rstd ; z2 = z1·γ+β ; z3 = lrelu(z2) ; y = conv(z3, w)
#   dz2 = lrelu'(z2) ⊙ conv_dx(dy, flip(w))     ← dx-kernel epilogue
#   dβ = Σ dz2 ; dγ = Σ dz2·z1                  ← VMEM accumulators, same kernel
#   dx = γ·rstd·(dz2 − dβ/n − z1·dγ/n)          ← one fused XLA pass
#   dw = wgrad(z3, dy)                           ← dw kernel, prologue on x

_EPS = 1e-5
_SLOPE = 1e-2


def _prologue(raw, nrm_ref, b, f, h0, *, W, H, F, p, slope):
    """In-place on the staged slab: raw ← halo_mask ∘ lrelu(raw·m1 + m0).

    The slab covers padded rows [h0, h0+HT+2) / frames [f, f+kd) / lanes
    [0, Wp) of the zero-padded input; the affine maps those zeros to
    lrelu(m0) ≠ 0, so every out-of-range position is re-zeroed (valid:
    lanes [1, W], rows [1, H], frames [p, p+F))."""
    m1 = nrm_ref[b, 0]                                     # (C, 1) f32
    m0 = nrm_ref[b, 1]
    z = raw[:].astype(jnp.float32) * m1[None, None] + m0[None, None]
    z = jnp.where(z >= 0.0, z, slope * z)
    shp = raw.shape                                        # (HT+2, kd, C, Wp)
    lane = jax.lax.broadcasted_iota(jnp.int32, shp, 3)
    row = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + h0
    frm = jax.lax.broadcasted_iota(jnp.int32, shp, 1) + f
    ok = ((lane >= 1) & (lane <= W) & (row >= 1) & (row <= H)
          & (frm >= p) & (frm < p + F))
    raw[:] = jnp.where(ok, z, 0.0).astype(raw.dtype)


def _fwd_kernel_fused(x_hbm, nrm, a_ref, o_ref, raw, shf, sem, *,
                      HT, C, W, kd, cout, H, F, slope):
    """_fwd_kernel with the norm-on-load prologue (x_hbm holds RAW x)."""
    b = pl.program_id(0)
    f = pl.program_id(1)
    h0 = pl.program_id(2) * HT

    for j in range(kd):
        pltpu.make_async_copy(
            x_hbm.at[b, f + j, pl.ds(h0, HT + 2)], raw.at[:, j], sem.at[j]).start()
    for j in range(kd):
        pltpu.make_async_copy(
            x_hbm.at[b, f + j, pl.ds(h0, HT + 2)], raw.at[:, j], sem.at[j]).wait()

    _prologue(raw, nrm, b, f, h0, W=W, H=H, F=F, p=kd // 2, slope=slope)

    for dw in range(3):
        shf[:, dw] = raw[:, :, :, dw:dw + W]

    K = 9 * kd * C
    for i in range(HT):
        b_mat = shf[i:i + 3].reshape(K, W)
        d = jax.lax.dot_general(a_ref[:], b_mat, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, 0, i] = d.astype(o_ref.dtype)


def _dw_kernel_fused(x_hbm, dy_hbm, nrm, o_ref, raw, shf, gy, gyt, acc, sem,
                     gsem, *, HT, C, W, kd, cout, nsteps, H, F, slope):
    """_dw_kernel with the prologue: contracts z3 = lrelu(affine(x)) — staged
    on the fly from RAW x slabs — against dy."""
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

    _prologue(raw, nrm, b, f, h0, W=W, H=H, F=F, p=kd // 2, slope=slope)

    for dw in range(3):
        shf[:, dw] = raw[:, :, :, dw:dw + W]

    @pl.when(step == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    K = 9 * kd * C
    for i in range(HT):
        gyt[:, :] = gy[i].T
        b_mat = shf[i:i + 3].reshape(K, W)
        upd = jax.lax.dot_general(b_mat, gyt[:, :], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc[:] += upd

    @pl.when(step == nsteps - 1)
    def _flush():
        o_ref[:] = acc[:]


def _dx_epi_kernel(dy_hbm, x_hbm, nrm, a_ref, o_ref, s_ref, raw, shf, xs, acc,
                   sem, xsem, *, HT, C, W, kd, cout, H, F, slope, nh):
    """dz3 = conv(dy, flip(w)) rows with an epilogue: multiply by lrelu'(z2)
    (z2 recomputed from a center-row slab of RAW x) and accumulate the
    per-channel sums S1 = Σ dz2, S2 = Σ dz2·z1 in VMEM across the
    sequential grid (flushed per batch sample).

    C = dy channels (cout of forward, padded); cout = x channels (cin_p).
    dy_hbm is spectrally/spatially padded; x_hbm is the UNPADDED CW x."""
    b = pl.program_id(0)
    f = pl.program_id(1)
    hblk = pl.program_id(2)
    h0 = hblk * HT

    for j in range(kd):
        pltpu.make_async_copy(
            dy_hbm.at[b, f + j, pl.ds(h0, HT + 2)], raw.at[:, j], sem.at[j]).start()
    pltpu.make_async_copy(
        x_hbm.at[b, f, pl.ds(h0, HT)], xs, xsem).start()
    for j in range(kd):
        pltpu.make_async_copy(
            dy_hbm.at[b, f + j, pl.ds(h0, HT + 2)], raw.at[:, j], sem.at[j]).wait()
    pltpu.make_async_copy(
        x_hbm.at[b, f, pl.ds(h0, HT)], xs, xsem).wait()

    for dw in range(3):
        shf[:, dw] = raw[:, :, :, dw:dw + W]

    @pl.when((f == 0) & (hblk == 0))          # start of each sample's section
    def _init():
        acc[:] = jnp.zeros_like(acc)

    n1 = nrm[b, 0]                            # rstd          (cout, 1)
    n0 = nrm[b, 1]                            # -mean·rstd
    sc = nrm[b, 2]                            # scale
    bi = nrm[b, 3]                            # bias
    K = 9 * kd * C
    for i in range(HT):
        b_mat = shf[i:i + 3].reshape(K, W)
        d = jax.lax.dot_general(a_ref[:], b_mat, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        xr = xs[i].astype(jnp.float32)        # (cout, W)
        z1 = xr * n1 + n0
        z2 = z1 * sc + bi
        dval = jnp.where(z2 >= 0.0, d, slope * d)
        acc[0] = acc[0] + dval
        acc[1] = acc[1] + dval * z1
        o_ref[0, 0, i] = dval.astype(o_ref.dtype)

    @pl.when((f == F - 1) & (hblk == nh - 1))
    def _flush():
        s_ref[b, 0] = jnp.sum(acc[0], axis=1, keepdims=True)
        s_ref[b, 1] = jnp.sum(acc[1], axis=1, keepdims=True)


def _conv_cw_fused(x_cw, a, nrm, *, kd, cout, HT, H, F):
    """Fused-prologue forward: x_cw RAW (B, F, H, C, W) bf16; nrm (B,2,C,1)
    f32 [m1, m0] → (B, F, H, cout, W) of conv(lrelu(x·m1+m0), a)."""
    B, F_, H_, C, W = x_cw.shape
    p = kd // 2
    Wp = ((W + 2 + 127) // 128) * 128
    xp = jnp.pad(x_cw, ((0, 0), (p, p), (1, 1), (0, 0), (1, Wp - W - 1)))
    kern = functools.partial(_fwd_kernel_fused, HT=HT, C=C, W=W, kd=kd,
                             cout=cout, H=H, F=F, slope=_SLOPE)
    return pl.pallas_call(
        kern,
        grid=(B, F, H // HT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
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
        cost_estimate=_conv_cost(B, F, H, W, C, cout, kd),
        interpret=_interpret(),
    )(xp, nrm, a)


def _conv_cw_dw_fused(x_cw, dy_cw, nrm, *, kd, HT, H, F):
    """Fused-prologue weight grad: contracts z3(x) against dy."""
    B, F_, H_, C, W = x_cw.shape
    cout = dy_cw.shape[3]
    p = kd // 2
    Wp = ((W + 2 + 127) // 128) * 128
    xp = jnp.pad(x_cw, ((0, 0), (p, p), (1, 1), (0, 0), (1, Wp - W - 1)))
    K = 9 * kd * C
    nsteps = B * F * (H // HT)
    kern = functools.partial(_dw_kernel_fused, HT=HT, C=C, W=W, kd=kd,
                             cout=cout, nsteps=nsteps, H=H, F=F, slope=_SLOPE)
    return pl.pallas_call(
        kern,
        grid=(B, F, H // HT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
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
        cost_estimate=_conv_cost(B, F, H, W, C, cout, kd),
        interpret=_interpret(),
    )(xp, dy_cw, nrm)


def _conv_cw_dx_epi(dy_cw, x_cw, nrm4, a_flip, *, kd, cout, HT, H, F):
    """dz2 (B,F,H,cout,W) bf16 + S (B,2,cout,1) f32 [Σdz2, Σdz2·z1]."""
    B, F_, H_, Cdy, W = dy_cw.shape
    p = kd // 2
    Wp = ((W + 2 + 127) // 128) * 128
    dyp = jnp.pad(dy_cw, ((0, 0), (p, p), (1, 1), (0, 0), (1, Wp - W - 1)))
    nh = H // HT
    kern = functools.partial(_dx_epi_kernel, HT=HT, C=Cdy, W=W, kd=kd,
                             cout=cout, H=H, F=F, slope=_SLOPE, nh=nh)
    return pl.pallas_call(
        kern,
        grid=(B, F, nh),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 1, HT, cout, W),
                                lambda b, f, h: (b, f, h, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, F, H, cout, W), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B, 2, cout, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((HT + 2, kd, Cdy, Wp), jnp.bfloat16),
            pltpu.VMEM((HT + 2, 3, kd, Cdy, W), jnp.bfloat16),
            pltpu.VMEM((HT, cout, W), jnp.bfloat16),
            pltpu.VMEM((2, cout, W), jnp.float32),
            pltpu.SemaphoreType.DMA((kd,)),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=_conv_cost(B, F, H, W, Cdy, cout, kd,
                                 extra_bytes=B * F * H * cout * W * 2),
        interpret=_interpret(),
    )(dyp, x_cw, nrm4, a_flip)


def _in_stats(x):
    """Per-(sample, channel) instance-norm moments of channels-last x."""
    axes = (1, 2, 3)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(xf * xf, axis=axes) - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + _EPS)
    return mean, rstd                                      # (B, C) each


@jax.custom_vjp
def conv3d_in_act(x, w, scale, bias):
    """conv(lrelu(instance_norm_affine(x)), w), channels-last, SAME/stride-1.

    One fused op replacing the Norm3d→act→Conv3d junction inside the UNet
    double-conv blocks (reference forward: models.py:616-625 conv-IN-lrelu
    chains). Same math as instance_norm_lrelu (ops/fused_norm.py) followed
    by conv3d_spectral; callers gate on _supported() for the conv shape."""
    y, _ = _fused_fwd(x, w, scale, bias)
    return y


def _fused_fwd(x, w, scale, bias):
    kd, _, _, cin, cout = w.shape
    B, F, H, W, _ = x.shape
    HT = _row_tile(H)
    mean, rstd = _in_stats(x)                              # (B, cin)
    sf = scale.astype(jnp.float32)
    m1 = rstd * sf[None]
    m0 = bias.astype(jnp.float32)[None] - mean * m1
    nrm = jnp.stack([m1, m0], axis=1)[..., None]           # (B, 2, cin, 1)
    cin_p, cout_p = _pad_cin(cin), _pad_cout(cout)
    wp = w
    if cin_p != cin:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, cin_p - cin),))
        wp = jnp.pad(w, ((0, 0),) * 3 + ((0, cin_p - cin), (0, 0)))
        nrm = jnp.pad(nrm, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    x_cw = jnp.transpose(x, (0, 1, 2, 4, 3)).astype(jnp.bfloat16)
    a = _pack_a(wp).astype(jnp.bfloat16)
    if cout_p != cout:
        a = jnp.pad(a, ((0, cout_p - cout), (0, 0)))
    if _multi_device():
        y_cw = _cp_conv_cw_fused(kd, cout_p, HT, H, F)(x_cw, a, nrm)
    else:
        y_cw = _conv_cw_fused(x_cw, a, nrm, kd=kd, cout=cout_p, HT=HT, H=H, F=F)
    if cout_p != cout:
        y_cw = jax.lax.slice_in_dim(y_cw, 0, cout, axis=3)
    y = jnp.transpose(y_cw, (0, 1, 2, 4, 3))
    return y, (x_cw, w, mean, rstd, scale, bias)


def _fused_bwd(res, dy):
    x_cw, w, mean, rstd, scale, bias = res                 # x_cw cin-padded
    kd, _, _, cin, cout = w.shape
    B, F, H, cin_p, W = x_cw.shape
    cout_p = _pad_cout(cout)
    HT = _row_tile(H)
    dy_cw = jnp.transpose(dy, (0, 1, 2, 4, 3)).astype(jnp.bfloat16)
    if cout_p != cout:
        dy_cw = jnp.pad(dy_cw, ((0, 0),) * 3 + ((0, cout_p - cout), (0, 0)))

    sf = scale.astype(jnp.float32)
    bf = bias.astype(jnp.float32)
    pad_c = cin_p - cin
    n1 = jnp.pad(rstd, ((0, 0), (0, pad_c)))               # (B, cin_p)
    n0 = jnp.pad(-mean * rstd, ((0, 0), (0, pad_c)))
    scb = jnp.pad(jnp.broadcast_to(sf[None], (B, cin)), ((0, 0), (0, pad_c)))
    bib = jnp.pad(jnp.broadcast_to(bf[None], (B, cin)), ((0, 0), (0, pad_c)))
    nrm4 = jnp.stack([n1, n0, scb, bib], axis=1)[..., None]  # (B, 4, cin_p, 1)

    # dz2 + per-channel sums from the epilogue kernel
    wp = w if pad_c == 0 else jnp.pad(w, ((0, 0),) * 3 + ((0, pad_c), (0, 0)))
    wf = _flip_w(wp)                                       # (kd,3,3,cout,cin_p)
    if cout_p != cout:
        wf = jnp.pad(wf, ((0, 0),) * 3 + ((0, cout_p - cout), (0, 0)))
    a_flip = _pack_a(wf).astype(jnp.bfloat16)              # (cin_p, 9·kd·cout_p)
    if _multi_device():
        dz2_cw, s = _cp_conv_cw_dx_epi(kd, cin_p, HT, H, F)(
            dy_cw, x_cw, nrm4, a_flip)
    else:
        dz2_cw, s = _conv_cw_dx_epi(dy_cw, x_cw, nrm4, a_flip, kd=kd,
                                    cout=cin_p, HT=HT, H=H, F=F)
    S1 = s[:, 0, :, 0]                                     # (B, cin_p)
    S2 = s[:, 1, :, 0]

    # dx = γ·rstd·(dz2 − S1/n − z1·S2/n), one fused elementwise pass (CW)
    n = F * H * W
    cvec = (scb * n1)[:, None, None, :, None]              # (B,1,1,cin_p,1)
    z1_cw = (x_cw.astype(jnp.float32) * n1[:, None, None, :, None]
             + n0[:, None, None, :, None])
    dx_cw = cvec * (dz2_cw.astype(jnp.float32)
                    - S1[:, None, None, :, None] / n
                    - z1_cw * (S2[:, None, None, :, None] / n))
    dx = jnp.transpose(dx_cw, (0, 1, 2, 4, 3))[..., :cin].astype(jnp.bfloat16)

    # dw from the prologue dw kernel (contracts z3(x) with dy)
    m1v = n1 * scb
    m0v = bib + n0 * scb
    nrm2 = jnp.stack([m1v, m0v], axis=1)[..., None]        # (B, 2, cin_p, 1)
    if _multi_device():
        da = _cp_conv_cw_dw_fused(kd, HT, H, F)(x_cw, dy_cw, nrm2)
    else:
        da = _conv_cw_dw_fused(x_cw, dy_cw, nrm2, kd=kd, HT=HT, H=H, F=F)
    dw = _unpack_da(da, kd, cin_p, cout_p)[:, :, :, :cin, :cout].astype(w.dtype)

    dscale = jnp.sum(S2[:, :cin], axis=0).astype(scale.dtype)
    dbias = jnp.sum(S1[:, :cin], axis=0).astype(bias.dtype)
    return dx, dw, dscale, dbias


conv3d_in_act.defvjp(_fused_fwd, _fused_bwd)


def _mk_region(shape_cl: Tuple[int, ...], kshape: Tuple[int, ...]) -> bool:
    """Megakernel enable region (separate from _profitable: fusion wins even
    where the conv alone is at parity, but the deep small-tensor levels have
    tiny norms and XLA's fastest convs — keep them)."""
    W = shape_cl[3]
    cout = kshape[4]
    minw = int(os.getenv("SPCCT_MEGA_MINW", "256"))
    maxco = int(os.getenv("SPCCT_MEGA_MAXCOUT", "64"))
    return cout <= maxco and W >= minw


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
    cin_p, cout_p = _pad_cin(cin), _pad_cout(cout)
    wp = w
    if cin_p != cin:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, cin_p - cin),))
        wp = jnp.pad(w, ((0, 0),) * 3 + ((0, cin_p - cin), (0, 0)))
    x_cw = jnp.transpose(x, (0, 1, 2, 4, 3)).astype(jnp.bfloat16)
    a = _pack_a(wp).astype(jnp.bfloat16)
    if cout_p != cout:
        a = jnp.pad(a, ((0, cout_p - cout), (0, 0)))
    y_cw = _maybe_partitioned_cw(x_cw, a, kd=kd, cout=cout_p, HT=HT)
    if cout_p != cout:
        y_cw = jax.lax.slice_in_dim(y_cw, 0, cout, axis=3)
    y = jnp.transpose(y_cw, (0, 1, 2, 4, 3))
    return y, (x_cw, w)


def _bwd(res, dy):
    x_cw, w = res                       # x_cw already cin-padded by _fwd
    kd, _, _, cin, cout = w.shape       # w is the caller's original shape
    cin_p, cout_p = _pad_cin(cin), _pad_cout(cout)
    if os.getenv("SPCCT_PALLAS_BWD", "1") == "0":
        # bisection mode: Pallas forward, XLA backward (transposed conv for
        # dx, conv-as-wgrad for dw on the channels-last residual)
        x = jnp.transpose(x_cw, (0, 1, 2, 4, 3))[..., :cin]
        _, vjp = jax.vjp(lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww.astype(xx.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), x, w)
        return vjp(dy.astype(jnp.bfloat16))
    HT = _row_tile(x_cw.shape[2])
    dy_cw = jnp.transpose(dy, (0, 1, 2, 4, 3)).astype(jnp.bfloat16)
    if cout_p != cout:
        dy_cw = jnp.pad(dy_cw, ((0, 0),) * 3 + ((0, cout_p - cout), (0, 0)))
    # dx: same conv with tap-flipped, IO-swapped weights; the kernel's
    # output-channel count must be 8-aligned, so pad and slice as in _fwd
    wp = w if cin_p == cin else jnp.pad(
        w, ((0, 0),) * 3 + ((0, cin_p - cin), (0, 0)))
    wf = _flip_w(wp)                    # (kd, 3, 3, cout, cin_p)
    if cout_p != cout:
        wf = jnp.pad(wf, ((0, 0),) * 3 + ((0, cout_p - cout), (0, 0)))
    dxc = _pad_cout(cin_p)
    a_flip = _pack_a(wf).astype(jnp.bfloat16)
    if dxc != cin_p:
        a_flip = jnp.pad(a_flip, ((0, dxc - cin_p), (0, 0)))
    dx_cw = _maybe_partitioned_cw(dy_cw, a_flip, kd=kd, cout=dxc, HT=HT)
    if dxc != cin:
        dx_cw = jax.lax.slice_in_dim(dx_cw, 0, cin, axis=3)
    dx = jnp.transpose(dx_cw, (0, 1, 2, 4, 3)).astype(jnp.bfloat16)
    # dw: VMEM-accumulated reduction kernel
    da = _maybe_partitioned_dw(x_cw, dy_cw, kd=kd, HT=HT)
    dw = _unpack_da(da, kd, cin_p, cout_p)[:, :, :, :cin, :cout].astype(w.dtype)
    return dx, dw


conv3d_spectral.defvjp(_fwd, _bwd)
