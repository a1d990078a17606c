# jax_cache.py — persistent XLA compilation cache.
#
# First-compile of the 3D models costs 60-500 s on the tunneled TPU; the
# persistent cache makes reruns (bench, resumed training, analysis) start in
# seconds. Enabled by every entry point; opt out with SPCCT_NO_COMPILE_CACHE=1.
from __future__ import annotations

import os
from pathlib import Path


def enable() -> None:
    if os.getenv("SPCCT_NO_COMPILE_CACHE", "0") == "1":
        return
    import jax

    cache_dir = os.getenv("JAX_COMPILATION_CACHE_DIR",
                          str(Path.home() / ".cache" / "spcct_jax_cache"))
    try:
        # mkdir can raise on a read-only HOME / unwritable cache dir; that
        # must degrade to a cold compile, never fail the caller (bench.py's
        # liveness probe would otherwise report a false "device unreachable").
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knobs, or unwritable cache dir
