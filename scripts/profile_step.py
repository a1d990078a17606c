#!/usr/bin/env python
# scripts/profile_step.py — capture a jax.profiler trace of the SPFF train
# step on the attached device and attribute time per HLO op.
#
# This is the measurement tool behind BASELINE.md's step-time attribution
# (conv / norm / pool / elementwise-tail breakdown). Usage:
#
#   python scripts/profile_step.py [--hw 512] [--steps 6] [--variant SPFF-UNet]
#
# Prints: total device time per step, top-N ops by self time, and a category
# rollup (conv / matmul / norm-stat / pool / copy / elementwise / other).
#
# CAVEAT (measured 2026-08-16): through the axon tunnel, enabling the
# profiler serializes dispatch — the traced step runs ~5x slower than the
# untraced step (887 vs 161 ms) and async copy-start events are charged
# their full wait time, so the 'copy' category dominates spuriously. Use
# this tool for *relative structure within compute fusions only*; for
# absolute attribution prefer end-to-end step timing with targeted graph
# ablations (bench.py methodology: chained steps + dependent scalar pull).
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(variant: str, hw: int, steps: int, outdir: str, batch: int = 1):
    from spcct_tpu.utils.jax_cache import enable as _enable_cache
    _enable_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from spcct_tpu.models.recipes import get_recipe
    from spcct_tpu.train.loop import create_state, make_steps
    from spcct_tpu.metrics import MetricAccum, metric_names

    recipe = get_recipe(variant)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 5, hw, hw, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 13, (batch, 5, hw, hw)).astype(np.int32))
    state, opt = create_state(recipe, jax.random.PRNGKey(0), x, 100, 100)
    train_step, _ = make_steps(recipe, opt)
    tree = state.tree()
    acc = MetricAccum.zeros(len(metric_names("x")))
    for _ in range(3):
        tree, acc = train_step(tree, acc, x, y)
    float(acc.sums[0])  # drain (block_until_ready insufficient on tunnel)

    with jax.profiler.trace(outdir):
        for _ in range(steps):
            tree, acc = train_step(tree, acc, x, y)
        float(acc.sums[0])


CATEGORIES = (
    ("conv", ("convolution", "conv_general")),
    ("matmul", ("dot", "einsum")),
    ("pool", ("reduce-window", "select-and-scatter", "reduce_window")),
    ("fft", ("fft",)),
    ("copy", ("copy", "transpose", "bitcast")),
    ("allreduce", ("all-reduce", "all-gather", "reduce-scatter")),
    ("scatter", ("scatter",)),
    ("reduce", ("reduce",)),
)


def categorize(name: str) -> str:
    n = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in n for k in keys):
            return cat
    if "fusion" in n or "loop_" in n or n.startswith(("add", "mul", "sub", "div",
            "select", "broadcast", "convert", "compare", "maximum", "minimum",
            "exp", "tanh", "log", "rsqrt", "power", "and", "or", "not",
            "concatenate", "slice", "pad", "reshape", "iota", "dynamic")):
        return "elementwise"
    return "other"


def attribute(outdir: str, steps: int, top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {outdir}"
    path = max(paths, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    per_op = collections.Counter()
    per_op_count = collections.Counter()
    total = 0
    for plane in xs.planes:
        pname = plane.name.lower()
        if "tpu" not in pname and "device" not in pname and "axon" not in pname:
            continue
        if "host" in pname:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            lname = line.name.lower()
            # only per-op XLA lines (skip step/module summary lines)
            if "xla op" not in lname and "xla_op" not in lname:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e12
                per_op[name] += dur
                per_op_count[name] += 1
                total += dur
    if total == 0:
        # fall back: aggregate every non-host line
        for plane in xs.planes:
            pname = plane.name.lower()
            if "host" in pname:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e12
                    per_op[name] += dur
                    per_op_count[name] += 1
                    total += dur

    print(f"\n== device time: {total*1e3:.1f} ms total, {total*1e3/steps:.2f} ms/step ==")
    cats = collections.Counter()
    for name, dur in per_op.items():
        cats[categorize(name)] += dur
    print("\n-- category rollup (ms/step) --")
    for cat, dur in cats.most_common():
        print(f"  {cat:12s} {dur*1e3/steps:8.2f}  ({100*dur/total:5.1f}%)")
    print(f"\n-- top {top} ops (ms/step) --")
    for name, dur in per_op.most_common(top):
        print(f"  {dur*1e3/steps:8.3f}  x{per_op_count[name]//steps:<4d} {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="SPFF-UNet")
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--outdir", default="/tmp/spcct_trace")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        os.makedirs(args.outdir, exist_ok=True)
        capture(args.variant, args.hw, args.steps, args.outdir, args.batch)
    attribute(args.outdir, args.steps, args.top)
