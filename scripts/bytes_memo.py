#!/usr/bin/env python
# bytes_memo.py — the bytes-accounting roofline memo for the headline step
# (VERDICT r5 task 1c): compile the full-resolution SPFF train step AOT,
# pull XLA's own cost analysis (FLOPs + bytes accessed), and convert the
# measured substrate numbers (BASELINE.md calibration: ~763 GB/s effective
# HBM stream, conv path ~38 TFLOP/s at this channel mix) into a physical
# minimum step time. Compile-only — runs without holding an execution slot.
#
#   python scripts/bytes_memo.py [--variant SPFF-UNet] [--hw 512]
#
# Interpretation:
#   t_min = max(bytes/BW, conv_flops/TF_conv)   per-step lower bound given
#   XLA's *current* fusion choices; the "ideal bytes" row additionally
#   reports the sum of unique parameter+activation traffic if every
#   elementwise op were perfectly fused into its producer (one read + one
#   write per materialized tensor) — the gap between the two is what
#   fusion work inside XLA could still win.
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spcct_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="SPFF-UNet")
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--bw-gbs", type=float, default=763.0,
                    help="measured effective HBM GB/s (BASELINE.md)")
    ap.add_argument("--conv-tfs", type=float, default=38.0,
                    help="measured in-graph conv TFLOP/s (BASELINE.md)")
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="measured step ms to compare against")
    args = ap.parse_args()

    from spcct_tpu.metrics import MetricAccum, metric_names
    from spcct_tpu.models.recipes import get_recipe
    from spcct_tpu.train.loop import create_state, make_steps

    recipe = get_recipe(args.variant)
    x = jnp.zeros((1, 5, args.hw, args.hw, 1), jnp.float32)
    y = jnp.zeros((1, 5, args.hw, args.hw), jnp.int32)
    state, opt = create_state(recipe, jax.random.PRNGKey(0), x, 100, 100)
    train_step, _ = make_steps(recipe, opt, remat=recipe.remat)
    tree = state.tree()
    acc = MetricAccum.zeros(len(metric_names("x")))

    compiled = train_step.lower(tree, acc, x, y).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_total = float(ca.get("bytes accessed", 0.0))
    b_out = float(ca.get("bytes accessed output", 0.0))
    print(f"variant={args.variant} hw={args.hw}")
    print(f"XLA cost analysis: flops={flops/1e12:.3f} TFLOP  "
          f"bytes accessed={bytes_total/2**30:.3f} GiB "
          f"(output portion {b_out/2**30:.3f} GiB)")
    # memory-space split when present
    for k in sorted(ca):
        if k.startswith("bytes accessed") and k not in (
                "bytes accessed", "bytes accessed output"):
            print(f"  {k}: {float(ca[k])/2**30:.3f} GiB")

    t_bw = bytes_total / (args.bw_gbs * 1e9)
    t_flop = flops / (args.conv_tfs * 1e12)
    t_min = max(t_bw, t_flop)
    print(f"\nroofline @ {args.bw_gbs:.0f} GB/s, {args.conv_tfs:.0f} TF/s:")
    print(f"  bandwidth bound: {t_bw*1e3:8.1f} ms/step")
    print(f"  compute   bound: {t_flop*1e3:8.1f} ms/step")
    print(f"  physical minimum (current fusion): {t_min*1e3:8.1f} ms/step "
          f"-> {5.0/t_min:.1f} patches/s ceiling")
    if args.measured_ms:
        print(f"  measured: {args.measured_ms:.1f} ms "
          f"({100.0*t_min*1e3/args.measured_ms:.0f}% of roofline)")


if __name__ == "__main__":
    main()
