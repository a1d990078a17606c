#!/usr/bin/env python
# AOT HBM-demand probe for the full train step of one variant at full
# resolution (the reference configuration). Compile-only: reports XLA
# memory_analysis without executing, so it can run while the chip is busy.
#   python scripts/mem_probe.py 3DUNet [--hw 512]
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spcct_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant")
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--device-data-mb", type=float, default=None,
                    help="override resident-dataset estimate")
    args = ap.parse_args()

    from spcct_tpu.config import NUM_FRAMES, SYNTHETIC_SLICES_PER_SCAN
    from spcct_tpu.metrics import MetricAccum, metric_names
    from spcct_tpu.models.recipes import get_recipe
    from spcct_tpu.train.loop import create_state, make_steps, param_count

    recipe = get_recipe(args.variant)
    x = jnp.zeros((1, NUM_FRAMES, args.hw, args.hw, 1), jnp.float32)
    y = jnp.zeros((1, NUM_FRAMES, args.hw, args.hw), jnp.int32)
    state, opt = create_state(recipe, jax.random.PRNGKey(0), x, 100, 100)
    train_step, _ = make_steps(recipe, opt, remat=recipe.remat)
    tree = state.tree()
    acc = MetricAccum.zeros(len(metric_names("x")))

    lowered = train_step.lower(tree, acc, x, y)
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    gib = 2.0 ** 30
    temp = getattr(m, "temp_size_in_bytes", 0)
    arg = getattr(m, "argument_size_in_bytes", 0)
    out = getattr(m, "output_size_in_bytes", 0)
    alias = getattr(m, "alias_size_in_bytes", 0)
    gen = getattr(m, "generated_code_size_in_bytes", 0)
    # resident dataset estimate (device-data mode): 5 scans x slices,
    # (F,hw,hw) f32 images + uint8 labels, train+val
    n = 5 * SYNTHETIC_SLICES_PER_SCAN
    data_mb = args.device_data_mb if args.device_data_mb is not None else (
        n * NUM_FRAMES * args.hw * args.hw * (4 + 1) / 2 ** 20)
    print(f"{args.variant} @ {args.hw}: params={param_count(tree['params'])/1e6:.1f}M")
    print(f"  temp={temp/gib:.2f} GiB  args={arg/gib:.2f}  out={out/gib:.2f} "
          f"aliased={alias/gib:.2f}  code={gen/2**20:.0f} MiB")
    # args are donated (aliased) — live demand is temp + args + out - aliased
    live = (temp + arg + out - alias) / gib
    print(f"  live step demand ~ {live:.2f} GiB; + device dataset "
          f"{data_mb/1024:.2f} GiB -> {live + data_mb/1024:.2f} GiB "
          f"(budget ~15.7 GiB usable)")


if __name__ == "__main__":
    main()
