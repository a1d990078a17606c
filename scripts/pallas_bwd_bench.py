#!/usr/bin/env python
# Micro-bench of the conv3d_spectral backward pieces vs XLA at SPFF shapes.
# Identifies which of {fwd, dx, dw, transposes} pays off end-to-end.
from __future__ import annotations

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

from spcct_tpu.ops import pallas_conv as pc


def drain(arr):
    return float(jnp.sum(arr.astype(jnp.float32))[None][0])


def timeit(fn, *args, steps=20):
    """Chained scan so the tunnel pipeline stays full; returns s/step."""
    @jax.jit
    def chained(x0, *rest):
        def body(xc, _):
            out = fn(xc, *rest)
            # consume EVERY output element: a sliced/scalar dependency lets
            # XLA dead-code-eliminate the computation (Pallas calls can't be,
            # which silently biases any comparison)
            dep = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(out))
            return xc + (0.0 * dep).astype(xc.dtype), ()
        xc, _ = jax.lax.scan(body, x0, None, length=steps)
        return xc
    drain(chained(*args))
    t0 = time.perf_counter()
    drain(chained(*args))
    return (time.perf_counter() - t0) / steps


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def main():
    shapes = [(32, 32, 512), (64, 32, 512), (64, 64, 256)]
    rng = np.random.default_rng(0)
    for cin, cout, hw in shapes:
        F = 5
        x = jnp.asarray(rng.standard_normal((1, F, hw, hw, cin)), jnp.float32).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, jnp.float32)
        dy = jnp.asarray(rng.standard_normal((1, F, hw, hw, cout)), jnp.float32).astype(jnp.bfloat16)
        flops = 2 * F * hw * hw * cin * cout * 27

        th = timeit(jax.jit(lambda a: a + jnp.bfloat16(1.0)), x)
        print(f"shape cin={cin} cout={cout} hw={hw}  (harness {th*1e3:.3f} ms, "
              f"{flops/1e9:.1f} GFLOP/pass)", flush=True)

        def report(tag, t, nflops=flops):
            net = max(t - th, 1e-9)
            print(f"  {tag:28s}: {t*1e3:7.3f} ms  net {net*1e3:7.3f}  {nflops/net/1e12:6.1f} TF/s", flush=True)

        # forward
        report("pallas fwd", timeit(jax.jit(pc.conv3d_spectral), x, w))
        report("xla    fwd", timeit(jax.jit(xla_conv), x, w))

        # full grad (dx+dw): 2 conv-equivalents
        def g_pallas(xx, ww):
            return jax.grad(lambda a, b: jnp.sum(pc.conv3d_spectral(a, b).astype(jnp.float32) * dy.astype(jnp.float32)), argnums=(0, 1))(xx, ww)

        def g_xla(xx, ww):
            return jax.grad(lambda a, b: jnp.sum(xla_conv(a, b).astype(jnp.float32) * dy.astype(jnp.float32)), argnums=(0, 1))(xx, ww)

        report("pallas grad(dx+dw) 3x", timeit(jax.jit(g_pallas), x, w), 3 * flops)
        report("xla    grad(dx+dw) 3x", timeit(jax.jit(g_xla), x, w), 3 * flops)

        # dw kernel alone (CW inputs, no transposes)
        x_cw = jnp.transpose(x, (0, 1, 2, 4, 3))
        dy_cw = jnp.transpose(dy, (0, 1, 2, 4, 3))
        f_dw = jax.jit(functools.partial(pc._conv_cw_dw, kd=3, HT=8))
        report("pallas dw kernel alone", timeit(f_dw, x_cw, dy_cw))

        # transpose alone
        report("transpose CL->CW", timeit(jax.jit(lambda a: jnp.transpose(a, (0, 1, 2, 4, 3))), x), 0)


if __name__ == "__main__":
    main()
