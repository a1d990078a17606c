#!/usr/bin/env python
# bytes_floor.py — idealized HBM-traffic floor for the SPFF-UNet train
# step at the reference full-resolution configuration (1,5,512,512), bf16.
#
# Purpose (VERDICT r5 task 1c): decide from first principles whether the
# ~45 p/s north star is reachable on this chip. XLA's cost analysis says
# the CURRENT program moves 99.1 GiB/step -> 139.5 ms at the measured
# 763 GB/s -> 35.8 p/s ceiling (perf_logs/r5_bytes_memo.log). This script
# computes the traffic a PERFECTLY fused program would still have to move
# — only conv-boundary tensors (convs cannot fuse into each other) and
# the norm two-pass — so the ceiling it implies bounds every
# elementwise-fusion attack, not just the current schedule.
#
# Accounting rules (optimistic for the attacker — every rule rounds DOWN):
#   fwd:  each conv reads its input once, writes its output once. All
#         elementwise work (bias, IN apply, lrelu, SE/SpecSE/FiLM/Fourier
#         gates, pools, pads) fuses into those reads/writes for free.
#   IN:   instance-norm statistics need one full extra pass over the conv
#         output before the apply (the apply itself is fused): +1 read.
#   bwd:  per conv: dy is written once and read twice (dx and dw products
#         cannot share one pass on the MXU), x is read once more (dw),
#         dx is written once (it is the previous conv's dy, so its
#         subsequent reads are already counted there). Norm/gate backward
#         recomputes fuse for free (bandwidth-optimal remat).
#   opt:  Adam reads params+m+v (+grad), writes params+m+v, all f32.
#   loss/metrics: logits (f32) written once, read twice (softmax-CE fwd +
#         metrics argmax), dlogits written+read once each.
#   data: x (f32) + labels read once.
#
# Anything below this floor requires changing the MATH (fewer/smaller
# convs, different norm) — not better fusion, not better scheduling.
from __future__ import annotations

B, D, HW, F = 1, 5, 512, 32
BF2, F4 = 2, 4
GBPS = 763e9              # measured single-pass elementwise bandwidth
CONV_MS = 70.9            # measured conv compute at XLA's per-shape ceiling
PATCHES = 5               # 5x512x512 voxels = 5 64^3-patch equivalents
N_CLASSES = 13


def t(hw, c, dtype=BF2):  # tensor bytes at (B, D, hw, hw, c)
    return B * D * hw * hw * c * dtype


def conv(cin_bytes, cout_bytes, normed=True):
    """Returns (fwd_bytes, bwd_bytes) for one conv with IN after it."""
    fwd = cin_bytes + cout_bytes            # read x, write y
    if normed:
        fwd += cout_bytes                    # IN stats pass re-reads y
    # bwd: write dy(=cout) once is charged at its producer; here charge:
    #   read dy twice (dx, dw), read x once (dw), write dx (=cin) once
    bwd = 2 * cout_bytes + cin_bytes + cin_bytes
    return fwd, bwd


def main():
    fwd = bwd = 0.0
    rows = []

    def add(name, cin_b, cout_b, normed=True):
        nonlocal fwd, bwd
        f_, b_ = conv(cin_b, cout_b, normed)
        fwd += f_
        bwd += b_
        rows.append((name, f_, b_))

    x_in = B * D * HW * HW * 1 * F4          # input volume, f32
    # encoder (DoubleConvSpectral x2 per level) + bottleneck
    add("enc1.c1", x_in, t(512, F))
    add("enc1.c2", t(512, F), t(512, F))
    add("enc2.c1", t(256, F), t(256, 2 * F))     # pooled input
    add("enc2.c2", t(256, 2 * F), t(256, 2 * F))
    add("enc3.c1", t(128, 2 * F), t(128, 4 * F))
    add("enc3.c2", t(128, 4 * F), t(128, 4 * F))
    add("bott.c1", t(64, 4 * F), t(64, 8 * F))
    add("bott.c2", t(64, 8 * F), t(64, 8 * F))
    # decoder: ConvTranspose + DoubleConv on (virtually) concatenated skips
    add("up3", t(64, 8 * F), t(128, 4 * F), normed=False)
    add("dec3.c1", t(128, 4 * F) + t(128, 4 * F), t(128, 4 * F))
    add("dec3.c2", t(128, 4 * F), t(128, 4 * F))
    add("up2", t(128, 4 * F), t(256, 2 * F), normed=False)
    add("dec2.c1", t(256, 2 * F) + t(256, 2 * F), t(256, 2 * F))
    add("dec2.c2", t(256, 2 * F), t(256, 2 * F))
    add("up1", t(256, 2 * F), t(512, F), normed=False)
    add("dec1.c1", t(512, F) + t(512, F), t(512, F))
    add("dec1.c2", t(512, F), t(512, F))
    logits = B * D * HW * HW * N_CLASSES * F4
    add("out", t(512, F), logits, normed=False)

    # loss + metrics: logits read twice (CE fwd, metrics), dlogits w+r
    lm = 2 * logits + 2 * logits
    # optimizer: SPFF-UNet ~ 5.9M params, Adam state f32: r(p,m,v,g) w(p,m,v)
    n_params = 5.9e6
    opt = 7 * n_params * F4
    # data: x + labels
    data = x_in + B * D * HW * HW * 4

    total = fwd + bwd + lm + opt + data
    bw_ms = total / GBPS * 1e3
    floor_ms = max(bw_ms, CONV_MS)           # perfect DMA/compute overlap
    serial_ms = bw_ms + CONV_MS              # zero overlap (pessimistic)

    print(f"SPFF-UNet train step, idealized floor @ ({B},{D},{HW},{HW}) bf16")
    print(f"  fwd conv-boundary traffic : {fwd/2**30:6.2f} GiB")
    print(f"  bwd conv-boundary traffic : {bwd/2**30:6.2f} GiB")
    print(f"  loss+metrics (f32 logits) : {lm/2**30:6.2f} GiB")
    print(f"  optimizer (Adam, f32)     : {opt/2**30:6.2f} GiB")
    print(f"  data in                   : {data/2**30:6.2f} GiB")
    print(f"  TOTAL                     : {total/2**30:6.2f} GiB")
    print(f"  bandwidth floor @763 GB/s : {bw_ms:6.1f} ms")
    print(f"  conv compute (measured)   : {CONV_MS:6.1f} ms")
    print(f"  step floor (overlapped)   : {floor_ms:6.1f} ms "
          f"-> {PATCHES/floor_ms*1e3:5.1f} patches/s ceiling")
    print(f"  step floor (serial)       : {serial_ms:6.1f} ms "
          f"-> {PATCHES/serial_ms*1e3:5.1f} patches/s")
    print()
    print("  current program (XLA cost analysis): 99.14 GiB -> 139.5 ms")
    print(f"  fusion headroom: {(99.14 - total/2**30):.1f} GiB of the "
          "current traffic is elementwise-fusible in principle")


if __name__ == "__main__":
    main()
