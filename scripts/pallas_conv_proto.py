#!/usr/bin/env python
# Prototype: Pallas TPU kernel for the (kd,3,3) spectral conv in CW layout.
#
# Motivation (BASELINE.md round-1 attribution): XLA's conv_general at the
# SPFF full-resolution shapes (C_out=32, 512x512) runs at ~11 TF/s because
# output channels occupy only 32 of 128 MXU lanes. This kernel restructures
# the conv as A(Cout, 3*3*Cin) @ B(3*3*Cin, W) so the *width* axis fills the
# lanes and the contraction K=9*Cin fills the array rows.
#
# Usage: python scripts/pallas_conv_proto.py [--cin 32] [--cout 32] [--hw 512]
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spcct_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_v2(x_hbm, a_ref, o_ref, raw, shf, sem, *, HT, C, W, Wp, kd, cout,
               skip=()):
    """v2: shifted scratch laid out (row, dw, df, c, w) so each output row is
    ONE dot: B = shf[i:i+3] reshaped (3dh*3dw*kd*C, W), K = 9*kd*C.

    `skip` (ablation probes): subset of {"dma","shift","dot"}.
    """
    f = pl.program_id(0)
    h0 = pl.program_id(1) * HT

    if "dma" not in skip:
        for j in range(kd):
            pltpu.make_async_copy(
                x_hbm.at[f + j, pl.ds(h0, HT + 2)], raw.at[:, j], sem.at[j]).start()
        for j in range(kd):
            pltpu.make_async_copy(
                x_hbm.at[f + j, pl.ds(h0, HT + 2)], raw.at[:, j], sem.at[j]).wait()

    if "shift" not in skip:
        if "rot" in skip:
            # aligned-copy probe: same volume, no lane rotate
            for dw in range(3):
                shf[:, dw] = raw[:, :, :, 0:W]
        else:
            for dw in range(3):
                shf[:, dw] = raw[:, :, :, dw:dw + W]

    K = 9 * kd * C
    for i in range(HT):
        if "dot" in skip:
            o_ref[0, i] = shf[i].reshape(3 * kd * C, W)[:cout]
        else:
            b = shf[i:i + 3].reshape(K, W)
            d = jax.lax.dot_general(a_ref[:], b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, i] = d.astype(o_ref.dtype)


def _kernel(x_hbm, a_ref, o_ref, raw, shf, sem, *, HT, C, W, Wp, kd, cout):
    """One program computes output rows [h0, h0+HT) of frame f.

    x_hbm : (F+2p, H+2, C, Wp) bf16 in HBM/ANY (pre-padded, p=kd//2)
    a_ref : (3, cout, 3*kd*C) bf16 in VMEM — per-dw weight slabs, cols (dh,df,c)
    o_ref : (1, HT, cout, W) bf16 VMEM block (auto write-back)
    raw   : (HT+2, kd, C, Wp) bf16 scratch
    shf   : (3, HT+2, kd, C, W) bf16 scratch — dw-shifted views
    """
    f = pl.program_id(0)
    h0 = pl.program_id(1) * HT

    # fetch the (HT+2)-row slab for each of the kd frames
    for j in range(kd):
        cp = pltpu.make_async_copy(
            x_hbm.at[f + j, pl.ds(h0, HT + 2)], raw.at[:, j], sem.at[j])
        cp.start()
    for j in range(kd):
        pltpu.make_async_copy(
            x_hbm.at[f + j, pl.ds(h0, HT + 2)], raw.at[:, j], sem.at[j]).wait()

    # three lane-shifted copies implement the dw taps
    for dw in range(3):
        shf[dw] = raw[:, :, :, dw:dw + W]

    # per output row: out[i] = sum_dw A[dw] @ B_dw, B_dw = shf[dw, i:i+3] as (3*kd*C, W)
    K = 3 * kd * C
    for i in range(HT):
        acc = None
        for dw in range(3):
            b = shf[dw, i:i + 3].reshape(K, W)
            d = jax.lax.dot_general(
                a_ref[dw], b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        o_ref[0, i] = acc.astype(o_ref.dtype)


def pallas_conv_cw(x, w, *, HT=8, ver=2, skip=()):
    """x: (F, H, C, W) bf16; w: (kd, 3, 3, Cin, Cout) — returns (F, H, Cout, W).

    SAME padding, stride 1. Pre-pads F by kd//2, H and W by 1.
    """
    F, H, C, W = x.shape
    kd, kh, kw, Cin, Cout = w.shape
    assert kh == kw == 3 and Cin == C
    p = kd // 2
    # lane dim must be 128-aligned for DMA: left pad 1, right pad to multiple
    Wp = ((W + 2 + 127) // 128) * 128
    xp = jnp.pad(x, ((p, p), (1, 1), (0, 0), (1, Wp - W - 1)))
    if ver == 2:
        # A: (Cout, dh, dw, df, cin) matching shf flat order (row, dw, df, c)
        a = jnp.transpose(w, (4, 1, 2, 0, 3)).reshape(Cout, 9 * kd * Cin)
        a = a.astype(jnp.bfloat16)
        shf_shape = (HT + 2, 3, kd, C, W)
        kern = functools.partial(_kernel_v2, HT=HT, C=C, W=W, Wp=Wp, kd=kd, cout=Cout,
                                 skip=tuple(skip))
    else:
        # A[dw]: (Cout, dh, df, Cin) — dh slowest, matches shf row flatten (r, j, c)
        a = jnp.transpose(w, (4, 1, 0, 3, 2))       # (Cout, kh, kd, Cin, kw)
        a = jnp.moveaxis(a, -1, 0).reshape(3, Cout, kh * kd * Cin).astype(jnp.bfloat16)
        shf_shape = (3, HT + 2, kd, C, W)
        kern = functools.partial(_kernel, HT=HT, C=C, W=W, Wp=Wp, kd=kd, cout=Cout)

    grid = (F, H // HT)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HT, Cout, W), lambda f, h: (f, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, H, Cout, W), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((HT + 2, kd, C, Wp), jnp.bfloat16),
            pltpu.VMEM(shf_shape, jnp.bfloat16),
            pltpu.SemaphoreType.DMA((kd,)),
        ],
    )(xp, a)


def noop_pallas(x, *, HT=8, cout=32, scratch=False):
    """Empty kernel: same grid and output blocks, no input, no compute —
    isolates grid/output-pipeline overhead."""
    F, H, C, W = x.shape

    def k(x_hbm, o_ref, *scr):
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])

    scratch_shapes = []
    if scratch:
        scratch_shapes = [pltpu.VMEM((HT + 2, 3, C, ((W + 129) // 128) * 128), jnp.bfloat16),
                          pltpu.VMEM((HT + 2, 3, 3, C, W), jnp.bfloat16)]
    return pl.pallas_call(
        k,
        grid=(F, H // HT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, HT, cout, W), lambda f, h: (f, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, H, cout, W), jnp.bfloat16),
        scratch_shapes=scratch_shapes,
    )(x)


def xla_conv_cw(x, w):
    """Reference: lax conv on the same CW layout via transposes to channels-last."""
    F, H, C, W = x.shape
    xl = jnp.transpose(x, (0, 1, 3, 2))[None]  # (1,F,H,W,C)
    out = jax.lax.conv_general_dilated(
        xl, w.astype(jnp.bfloat16), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    return jnp.transpose(out[0].astype(jnp.bfloat16), (0, 1, 3, 2))


def drain(arr):
    return float(jnp.sum(arr.astype(jnp.float32))[None][0])


def timeit(fn, x, steps=20):
    """Chained steps: each call consumes a value derived from the previous
    output so the tunnel pipeline stays full (DESIGN.md timing methodology)."""
    Cin = x.shape[2]

    @jax.jit
    def chained(x0):
        def body(xc, _):
            out = fn(xc)
            xc = xc + 0.0 * out[:, :, :1, :1].astype(xc.dtype)  # dependency
            return xc, ()
        xc, _ = jax.lax.scan(body, x0, None, length=steps)
        return xc
    drain(chained(x))
    t0 = time.perf_counter()
    drain(chained(x))
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cin", type=int, default=32)
    ap.add_argument("--cout", type=int, default=32)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--kd", type=int, default=3)
    ap.add_argument("--ht", type=int, default=8)
    ap.add_argument("--ver", type=int, default=2)
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--sweep2", action="store_true")
    ap.add_argument("--shapes", action="store_true")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    if args.shapes:
        bench_shapes()
        return
    F, H, W, C, Co = args.frames, args.hw, args.hw, args.cin, args.cout
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((F, H, C, W)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((args.kd, 3, 3, C, Co)) * 0.05).astype(np.float32))

    pall = jax.jit(functools.partial(pallas_conv_cw, w=w, HT=args.ht, ver=args.ver))
    xla = jax.jit(functools.partial(xla_conv_cw, w=w))

    yp = np.asarray(pall(x).astype(jnp.float32))
    yx = np.asarray(xla(x).astype(jnp.float32))
    err = np.max(np.abs(yp - yx)) / max(1e-6, np.max(np.abs(yx)))
    print(f"rel err vs XLA: {err:.3e}", flush=True)

    flops = 2 * F * H * W * C * Co * args.kd * 9
    tp = timeit(pall, x, args.steps)
    print(f"pallas: {tp*1e3:8.3f} ms  {flops/tp/1e12:6.2f} TF/s", flush=True)
    if args.probe:
        for skip in [("dma",), ("shift",), ("dot",), ("rot",),
                     ("dma", "shift"), ("shift", "dot"), ("dma", "shift", "dot")]:
            f2 = jax.jit(functools.partial(
                pallas_conv_cw, w=w, HT=args.ht, ver=args.ver, skip=skip))
            ts = timeit(f2, x, args.steps)
            print(f"  skip={','.join(skip):18s}: {ts*1e3:8.3f} ms", flush=True)
    if args.sweep2:
        # harness-only: pure elementwise chain, no conv at all
        f2 = jax.jit(lambda xc: (xc + jnp.bfloat16(1.0))[:, :, :32, :])
        ts = timeit(f2, x, args.steps)
        print(f"  harness-only      : {ts*1e3:8.3f} ms", flush=True)
        # single noop pallas
        f2 = jax.jit(functools.partial(noop_pallas, HT=8, cout=Co))
        ts = timeit(f2, x, args.steps)
        print(f"  noop x1           : {ts*1e3:8.3f} ms", flush=True)
        # two noop pallas calls per step: per-call overhead doubles?
        def two(xc):
            a = noop_pallas(xc, HT=8, cout=Co)
            return noop_pallas(xc + 0.0 * a[:, :1, :1, :1], HT=8, cout=Co)
        ts = timeit(jax.jit(two), x, args.steps)
        print(f"  noop x2           : {ts*1e3:8.3f} ms", flush=True)
        # noop with 1/8th output
        def small(xc):
            o = noop_pallas(xc[:, :64], HT=8, cout=Co)
            return jnp.broadcast_to(o[:, :1], (F, H, Co, W)) * 0 + o.sum() * 0
        ts = timeit(jax.jit(small), x, args.steps)
        print(f"  noop smallout     : {ts*1e3:8.3f} ms (incl broadcast)", flush=True)
        # XLA conv, channels-last end to end (no CW transposes)
        xcl = jnp.transpose(x, (0, 1, 3, 2))[None]
        wcl = w.astype(jnp.bfloat16)
        def xla_cl(xc):
            return jax.lax.conv_general_dilated(
                xc, wcl, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        @jax.jit
        def chaincl(x0):
            def body(xc, _):
                o = xla_cl(xc)
                return xc + 0.0 * o[..., :C], ()
            return jax.lax.scan(body, x0, None, length=args.steps)[0]
        drain(chaincl(xcl))
        t0 = time.perf_counter(); drain(chaincl(xcl))
        ts = (time.perf_counter() - t0) / args.steps
        print(f"  xla channels-last : {ts*1e3:8.3f} ms  {flops/ts/1e12:6.2f} TF/s", flush=True)

    if args.sweep:
        for ht, scr in [(8, False), (8, True), (16, False), (32, False), (64, False)]:
            f2 = jax.jit(functools.partial(noop_pallas, HT=ht, cout=Co, scratch=scr))
            ts = timeit(f2, x, args.steps)
            print(f"  noop ht={ht:3d} scratch={int(scr)}: {ts*1e3:8.3f} ms", flush=True)
        for ht in (16, 32):
            try:
                f2 = jax.jit(functools.partial(pallas_conv_cw, w=w, HT=ht, ver=args.ver))
                yp2 = np.asarray(f2(x).astype(jnp.float32))
                e2 = np.max(np.abs(yp2 - yx)) / max(1e-6, np.max(np.abs(yx)))
                ts = timeit(f2, x, args.steps)
                print(f"  full ht={ht:3d}: {ts*1e3:8.3f} ms  {flops/ts/1e12:6.2f} TF/s  err {e2:.2e}", flush=True)
            except Exception as e:
                print(f"  full ht={ht:3d}: FAILED {str(e)[:120]}", flush=True)
    tx = timeit(xla, x, args.steps)
    print(f"xla   : {tx*1e3:8.3f} ms  {flops/tx/1e12:6.2f} TF/s  (incl. 2 transposes)", flush=True)




def bench_shapes():
    """Benchmark pallas CW conv vs XLA channels-last at every SPFF level shape,
    plus the CL<->CW transpose boundary cost. Run: --shapes"""
    shapes = [  # (cin, cout, hw, tag)
        (32, 32, 512, "L1 enc1.c2/dec1.c2"),
        (64, 32, 512, "L1 dec1.c1"),
        (32, 64, 256, "L2 enc2.c1"),
        (64, 64, 256, "L2 enc2.c2/dec2.c2"),
        (128, 64, 256, "L2 dec2.c1"),
        (64, 128, 128, "L3 enc3.c1"),
        (128, 128, 128, "L3 enc3.c2/dec3.c2"),
        (256, 128, 128, "L3 dec3.c1"),
    ]
    F = 5
    rng = np.random.default_rng(0)
    for cin, cout, hw, tag in shapes:
        x = jnp.asarray(rng.standard_normal((F, hw, cin, hw)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.standard_normal((3, 3, 3, cin, cout)) * 0.05).astype(np.float32))
        flops = 2 * F * hw * hw * cin * cout * 27
        # harness baseline for this shape
        th = timeit(jax.jit(lambda xc: (xc + jnp.bfloat16(1.0))), x, 20)
        try:
            f2 = jax.jit(functools.partial(pallas_conv_cw, w=w, HT=8, ver=2))
            yx = np.asarray(jax.jit(functools.partial(xla_conv_cw, w=w))(x).astype(jnp.float32))
            yp = np.asarray(f2(x).astype(jnp.float32))
            err = np.max(np.abs(yp - yx)) / max(1e-6, np.max(np.abs(yx)))
            tp = timeit(f2, x, 20)
            net = tp - th
            print(f"{tag:22s} cin={cin:3d} cout={cout:3d} hw={hw}: pallas {tp*1e3:7.3f}ms"
                  f" (net {net*1e3:6.3f} -> {flops/max(net,1e-9)/1e12:6.1f} TF/s) err {err:.1e}", flush=True)
        except Exception as e:
            print(f"{tag:22s} cin={cin:3d} cout={cout:3d} hw={hw}: FAILED {str(e)[:100]}", flush=True)
        tx = timeit(jax.jit(functools.partial(xla_conv_cw, w=w)), x, 20)
        netx = tx - th
        print(f"{'':22s} {'':23s}  xla    {tx*1e3:7.3f}ms (net {netx*1e3:6.3f} -> {flops/max(netx,1e-9)/1e12:6.1f} TF/s)  harness {th*1e3:.3f}ms", flush=True)
    # transpose boundary cost at L1/L2 sizes
    for c, hw in [(32, 512), (64, 256), (1, 512)]:
        xcl = jnp.asarray(rng.standard_normal((F, hw, hw, c)).astype(np.float32)).astype(jnp.bfloat16)
        tt = timeit(jax.jit(lambda a: jnp.transpose(a, (0, 1, 3, 2))), xcl, 20)
        th = timeit(jax.jit(lambda a: a + jnp.bfloat16(1.0)), xcl, 20)
        mb = xcl.size * 2 / 1e6
        print(f"transpose CL<->CW  c={c:3d} hw={hw} ({mb:5.1f}MB): {tt*1e3:7.3f}ms (net {(tt-th)*1e3:6.3f}ms, harness {th*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
