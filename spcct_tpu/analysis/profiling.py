# profiling.py — per-variant compute profile → model_profile.csv.
#
# Rebuild of reference profiling.py:41-99 (profile_all: THOP MACs/params,
# FLOPs=2xMACs, 50-iter latency, peak memory on (1,1,5,512,512)), replacing
# THOP with XLA's own compiled cost analysis (exact for the compiled graph)
# and CUDA peak-mem with the executable's device memory analysis. The
# reference ships broken (imports a nonexistent ChannelLastLayerNorm3D /
# innovative3D.train — SURVEY.md §2.3); this one runs.
from __future__ import annotations

import csv
import os
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..config import LOG_DIR, NUM_FRAMES, IMAGE_HEIGHT, IMAGE_WIDTH, ensure_dirs


def forward_flops(name: str, batch: int, frames: int, hw: int) -> float:
    """FLOPs of `name`'s wrapped forward at (batch, frames, hw, hw, 1), from
    XLA's cost analysis of the *lowered* (uncompiled) graph — cheap: one trace,
    no backend compile. Tries the current backend first; the axon TPU plugin
    returns None for lowered cost analysis, so falls back to a CPU subprocess
    (FLOP counts are shape arithmetic, identical across backends)."""
    try:
        f = _forward_flops_inline(name, batch, frames, hw)
        if f == f:  # not NaN
            return f
    except Exception:
        pass
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from spcct_tpu.analysis.profiling import _forward_flops_inline\n"
        f"print('FLOPS=%r' % _forward_flops_inline({name!r}, {batch}, {frames}, {hw}))\n"
    )
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=600)
    for line in r.stdout.splitlines():
        if line.startswith("FLOPS="):
            return float(line[6:])
    raise RuntimeError(f"flops subprocess failed: {r.stderr[-500:]}")


def _forward_flops_inline(name: str, batch: int, frames: int, hw: int) -> float:
    import jax
    import jax.numpy as jnp
    from ..models.recipes import get_recipe

    recipe = get_recipe(name)
    x = jnp.zeros((batch, frames, hw, hw, 1), jnp.float32)
    variables = recipe.init(jax.random.PRNGKey(0), x)
    forward = recipe.wrap_forward(recipe.apply_fn())
    lowered = jax.jit(
        lambda v, xx: forward(v, xx, train=False, mutable=False)[0]
    ).lower(variables, x)
    ca = lowered.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    if ca is None:
        return float("nan")
    return float(ca.get("flops", float("nan")))


def profile_variant(name: str, hw: Optional[int] = None, iters: int = 20,
                    warmup: int = 3) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp
    from ..models.recipes import get_recipe
    from ..train.loop import param_count

    recipe = get_recipe(name)
    hw = hw or int(os.getenv("SPCCT_PROFILE_HW", str(IMAGE_HEIGHT)))
    x = jnp.zeros((1, NUM_FRAMES, hw, hw, 1), jnp.float32)
    variables = recipe.init(jax.random.PRNGKey(0), x)
    forward = recipe.wrap_forward(recipe.apply_fn())

    fwd = jax.jit(lambda v, xx: forward(v, xx, train=False, mutable=False)[0])
    lowered = fwd.lower(variables, x)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))
    try:
        mem = compiled.memory_analysis()
        peak_mb = float(getattr(mem, "temp_size_in_bytes", 0) +
                        getattr(mem, "output_size_in_bytes", 0) +
                        getattr(mem, "argument_size_in_bytes", 0)) / 2 ** 20
    except Exception:
        peak_mb = float("nan")

    out = fwd(variables, x)
    float(jnp.ravel(out)[0])  # drain remote stream (see bench.py note)
    for _ in range(warmup):
        out = fwd(variables, x)
    float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, x)
    float(jnp.ravel(out)[0])
    latency_ms = (time.perf_counter() - t0) / iters * 1000.0

    return {
        "model": name,
        "params_M": param_count(variables["params"]) / 1e6,
        "macs_G": flops / 2 / 1e9,   # reference convention FLOPs = 2*MACs
        "flops_G": flops / 1e9,
        "latency_ms_b1": latency_ms,
        "peak_mem_MB": peak_mb,
        "input_hw": hw,
    }


def profile_all(variants=None, out_csv=None):
    """All registered variants → model_profile.csv
    (reference profiling.py:41-99 schema)."""
    from ..models.recipes import VARIANT_NAMES

    ensure_dirs()
    out_csv = Path(out_csv or LOG_DIR / "model_profile.csv")
    rows = []
    for name in variants or VARIANT_NAMES:
        try:
            row = profile_variant(name)
            print(f"[profile] {name}: {row['params_M']:.2f}M params, "
                  f"{row['flops_G']:.1f} GFLOP, {row['latency_ms_b1']:.1f} ms")
        except Exception as e:
            print(f"[profile] {name} FAILED: {e}")
            row = {"model": name, "params_M": float("nan"), "macs_G": float("nan"),
                   "flops_G": float("nan"), "latency_ms_b1": float("nan"),
                   "peak_mem_MB": float("nan"), "input_hw": float("nan")}
        rows.append(row)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"[profile] wrote {out_csv}")
    return rows
