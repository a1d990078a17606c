# xla_opts.py — env-gated XLA compiler options for the jitted steps.
#
# SPCCT_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=65536,xla_tpu_foo=false"
# is parsed into the `compiler_options` dict passed to jax.jit. This is the
# only reliable way to reach TPU backend flags through the tunneled axon
# backend: XLA_FLAGS/LIBTPU_INIT_ARGS are read by the *server-side* libtpu
# at plugin init (outside our control), while per-program compiler options
# travel with each compile request (same mechanism scripts/s1_probe.py uses
# for its --compiler-option experiments).
#
# Reference parity note: the reference has no compiler-flag surface at all
# (torch eager + cudnn picks kernels at runtime); this knob exists for the
# TPU-side perf methodology recorded in BASELINE.md.
from __future__ import annotations

import os
from typing import Dict, Optional


def xla_compiler_options() -> Optional[Dict[str, str]]:
    """Parse SPCCT_XLA_OPTS into a jax.jit compiler_options dict (or None)."""
    s = os.getenv("SPCCT_XLA_OPTS", "").strip()
    if not s:
        return None
    out: Dict[str, str] = {}
    for kv in s.split(","):
        kv = kv.strip()
        if not kv:
            continue
        if "=" not in kv:
            raise ValueError(
                f"SPCCT_XLA_OPTS entry {kv!r} is not KEY=VALUE")
        k, v = kv.split("=", 1)
        out[k.strip()] = v.strip()
    return out or None
