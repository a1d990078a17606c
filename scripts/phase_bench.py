#!/usr/bin/env python
# Phase-wise timing of the SPFF train step: forward / forward+backward /
# full step, to localize integration costs (e.g. Pallas conv on/off via
# SPCCT_PALLAS_CONV). bench.py methodology: chained scan + dependent pull.
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


def drain(arr):
    return float(jnp.sum(arr.astype(jnp.float32))[None][0])


def timeit(make_body, x0, steps=10):
    @jax.jit
    def chained(x0):
        def body(xc, _):
            dep = make_body(xc)
            return xc + (0.0 * dep).astype(xc.dtype), ()
        return jax.lax.scan(body, x0, None, length=steps)[0]
    drain(chained(x0))
    t0 = time.perf_counter()
    drain(chained(x0))
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--variant", default="SPFF-UNet")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--phase", default="all", choices=["all", "fwd", "grad", "full"])
    args = ap.parse_args()

    from spcct_tpu.models.recipes import get_recipe
    from spcct_tpu.train.loop import create_state, make_steps
    from spcct_tpu.metrics import MetricAccum, metric_names

    recipe = get_recipe(args.variant)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 5, args.hw, args.hw, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 13, (1, 5, args.hw, args.hw)).astype(np.int32))
    state, opt = create_state(recipe, jax.random.PRNGKey(0), x, 100, 100)
    tree = state.tree()
    params = tree["params"]

    def fwd_loss(params):
        logits = recipe.module.apply({"params": params}, x, train=True)
        loss, _ = recipe.loss(logits, y)
        return loss

    print(f"pallas_conv={os.getenv('SPCCT_PALLAS_CONV', '0')}  hw={args.hw}", flush=True)

    if args.phase in ("all", "fwd"):
        t = timeit(lambda xc: fwd_loss(params), x, args.steps)
        print(f"forward+loss         : {t*1e3:8.2f} ms", flush=True)

    def grad_body(xc):
        g = jax.grad(fwd_loss)(params)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))
    if args.phase in ("all", "grad"):
        t = timeit(grad_body, x, args.steps)
        print(f"forward+backward     : {t*1e3:8.2f} ms", flush=True)

    if args.phase not in ("all", "full"):
        return
    train_step, _ = make_steps(recipe, opt)
    acc0 = MetricAccum.zeros(len(metric_names("x")))

    @jax.jit
    def full(tree, acc):
        for _ in range(args.steps):
            tree, acc = train_step(tree, acc, x, y)
        return tree, acc
    # separate timing loop: train_step donates, so chain naturally
    tree2, acc2 = jax.tree.map(lambda a: a, (tree, acc0))
    full(tree2, acc2)
    tree2, acc2 = jax.tree.map(lambda a: a, (tree, acc0))
    t0 = time.perf_counter()
    out = full(tree2, acc2)
    drain(out[1].sums)
    t = (time.perf_counter() - t0) / args.steps
    print(f"full train step      : {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
