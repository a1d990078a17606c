#!/usr/bin/env python
# scripts/s1_probe.py — AOT diagnosis of the Pallas step-level regression:
# compile the full-resolution train step (no execution) and report which
# buffers XLA pins to alternate memory space S(1) (= VMEM on TPU), with
# shapes and byte totals. Compile-only, so it can run while the chip is
# busy training.
#
#   SPCCT_PALLAS_CONV=1 python scripts/s1_probe.py [--hw 512] [--dump /tmp/x.hlo]
#
# Context (BASELINE.md round-2/3 perf log): with the CW Pallas conv kernels
# in the graph the full train step regresses 161 -> 285 ms even though the
# kernels win in isolation; compiled HLO showed custom-call operands pinned
# to S(1). This tool quantifies that pinning so flag/layout experiments can
# be evaluated without burning a chip window.
from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spcct_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]\{[^}]*S\((\d+)\)[^}]*\}")
_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
          "pred": 1, "f16": 2, "s64": 8, "u64": 8, "c64": 8}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="SPFF-UNet")
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--dump", default=None, help="write full HLO text here")
    ap.add_argument("--compiler-option", action="append", default=[],
                    help="KEY=VALUE passed through jit compiler_options")
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

    copts = dict(kv.split("=", 1) for kv in args.compiler_option)
    lowered = train_step.lower(tree, acc, x, y)
    compiled = lowered.compile(compiler_options=copts or None)
    txt = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)
        print(f"HLO -> {args.dump} ({len(txt)/1e6:.1f} MB)")

    per_space = collections.defaultdict(collections.Counter)
    per_space_bytes = collections.Counter()
    for m in _SHAPE.finditer(txt):
        dt, dims, space = m.group(1), m.group(2), m.group(3)
        n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
        nbytes = n * _BYTES.get(dt, 4)
        per_space[space][f"{dt}[{dims}]"] += 1
        per_space_bytes[space] += nbytes
    if not per_space:
        print("no S(n)-annotated buffers found in HLO text")
    for space in sorted(per_space):
        total = per_space_bytes[space]
        print(f"\n== memory space S({space}): {len(per_space[space])} distinct "
              f"shapes, sum {total/2**20:.1f} MiB (occurrence-weighted) ==")
        biggest = sorted(per_space[space].items(),
                         key=lambda kv: -kv[1])[:15]
        for shape, cnt in biggest:
            print(f"  x{cnt:<4d} {shape}")
    # custom-call lines and their operand spaces
    ccs = [ln for ln in txt.splitlines() if "custom-call" in ln]
    print(f"\n== {len(ccs)} custom-call instructions ==")
    for ln in ccs[:12]:
        s1 = "S(1)" in ln
        name = ln.strip().split(" = ")[0][-60:]
        tgt = re.search(r'custom_call_target="([^"]+)"', ln)
        print(f"  [{'S1' if s1 else '  '}] {name}  target={tgt.group(1) if tgt else '?'}")


if __name__ == "__main__":
    main()
