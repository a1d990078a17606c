#!/usr/bin/env python
# percall_probe.py — measure the fixed per-custom-call cost inside one
# executable on this backend.
#
# Round-3 bisect (BASELINE.md): the Pallas step regression is ~3.8 ms per
# custom call, uniform across fwd/dx/dw kernels and insensitive to
# optimizer/metrics/donation — i.e., a boundary tax, not kernel speed.
# This probe separates the tax from kernel compute: chain K small CW-conv
# pallas_calls (~0.1 ms device work each) inside one jit and regress wall
# time on K. XLA lax.conv chains of the same shape are the control.
#
#   python scripts/percall_probe.py [--ks 0,1,8,32] [--reps 20]
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spcct_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="0,1,8,32")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--mode", choices=("pallas", "xla"), default="pallas")
    args = ap.parse_args()

    from spcct_tpu.ops.pallas_conv import conv3d_spectral

    rng = np.random.default_rng(0)
    # small: (1,5,8,128,32)·(3,3,3,32,32) ≈ 0.16 ms of MXU work
    x0 = jnp.asarray(rng.standard_normal((1, 5, 8, 128, 32)), jnp.bfloat16)
    w = jnp.asarray(0.05 * rng.standard_normal((3, 3, 3, 32, 32)), jnp.bfloat16)

    def xla_conv(x, w):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn)

    op = conv3d_spectral if args.mode == "pallas" else xla_conv

    results = {}
    for k in [int(v) for v in args.ks.split(",")]:
        @jax.jit
        def chain(x, w, k=k):
            for _ in range(k):
                x = op(x, w)
                x = x * (1.0 / (jnp.max(jnp.abs(x)) + 1.0))  # keep bounded
            return jnp.sum(x.astype(jnp.float32))            # consume all
        r = chain(x0, w)
        float(r)                                             # compile+drain
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = chain(x0, w)
        float(r)
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        results[k] = dt
        print(f"K={k:<3d} {dt:8.2f} ms/iter")
    ks = sorted(results)
    if len(ks) >= 2:
        k1, k2 = ks[-2], ks[-1]
        slope = (results[k2] - results[k1]) / (k2 - k1)
        print(f"marginal cost per {args.mode} call: {slope:.3f} ms")


if __name__ == "__main__":
    main()
