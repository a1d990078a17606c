#!/usr/bin/env python
# train.py — main training entry point.
#
# TPU-native rebuild of reference train.py:1585-1624 main(): iterate the
# VARIANTS registry x SEEDS, train each with early stopping + checkpoints,
# run the custom test pass, and aggregate all_results.csv.
#
# Env contract (kept from the reference, SURVEY.md §5):
#   INNOVATIVE3D_VARIANT  select one variant (reference defines but ignores
#                         this — config.py:482 vs train.py:1615; we honor it,
#                         quirk #3 fixed)
#   CHECKPOINT_DIR / LOG_DIR
#   FAST_TEST / FAST_TEST_LIMIT / FAST_SKIP_VIZ / FAST_SKIP_TEST_DETAILS /
#   FAST_SIMPLE_METRICS / VIZ_EVERY / SKIP_VIZ
#   PROFILE_ONLY=1        per-variant compute profile, then exit
#   SPCCT_MAX_EPOCHS      cap epochs (reference FINAL_EPOCHS=200)
#   SPCCT_SEEDS           comma-separated seed override
# CLI: --fast [--fast-limit N] [--fast-skip-viz] ... (reference train.py:1588-1594)
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    # Honor JAX_PLATFORMS even under the axon PJRT plugin, which registers
    # its platform regardless of the env var (config-level selection wins).
    # Lets CPU drives run when the TPU tunnel is down: JAX_PLATFORMS=cpu.
    if os.getenv("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.getenv("JAX_PLATFORMS"))

    ap = argparse.ArgumentParser(description="SPCCT TPU-native training driver")
    ap.add_argument("--fast", action="store_true", help="fast smoke mode")
    ap.add_argument("--fast-limit", type=int, default=None)
    ap.add_argument("--fast-skip-viz", action="store_true")
    ap.add_argument("--fast-skip-test-details", action="store_true")
    ap.add_argument("--variant", default=None, help="train a single variant")
    ap.add_argument("--seeds", default=None, help="comma-separated seeds")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--mesh", action="store_true",
                    help="data-parallel over all visible devices")
    args = ap.parse_args(argv)

    if args.fast:
        os.environ["FAST_TEST"] = "1"
        os.environ.setdefault("FAST_SIMPLE_METRICS", "1")
    if args.fast_limit is not None:
        os.environ["FAST_TEST_LIMIT"] = str(args.fast_limit)
    if args.fast_skip_viz:
        os.environ["FAST_SKIP_VIZ"] = "1"
    if args.fast_skip_test_details:
        os.environ["FAST_SKIP_TEST_DETAILS"] = "1"

    # imports AFTER env mutation so module-level flags pick them up
    from spcct_tpu.utils.jax_cache import enable as _enable_cache
    _enable_cache()

    # fail fast on a malformed SPCCT_XLA_OPTS (otherwise the ValueError fires
    # at the first make_steps call, minutes into dataset setup — ADVICE r4)
    from spcct_tpu.utils.xla_opts import xla_compiler_options
    xla_compiler_options()

    # multi-host: must precede any jax backend touch. No-op unless
    # SPCCT_COORDINATOR/SPCCT_NUM_PROCESSES (or SPCCT_AUTO_DISTRIBUTED=1 on a
    # TPU pod) are set — see spcct_tpu/parallel/distributed.py.
    from spcct_tpu.parallel.distributed import initialize_from_env
    multihost = initialize_from_env()

    from spcct_tpu.config import LOG_DIR, SEEDS, SELECTED_VARIANT, ensure_dirs
    from spcct_tpu.models.recipes import VARIANT_NAMES
    from spcct_tpu.train.driver import fit
    from spcct_tpu.train.logging_csv import append_row_csv

    if os.getenv("PROFILE_ONLY") == "1":
        from spcct_tpu.analysis.profiling import profile_all
        profile_all()
        return 0

    ensure_dirs()
    variant_sel = args.variant or SELECTED_VARIANT
    variants = [variant_sel] if variant_sel else VARIANT_NAMES
    seeds_env = args.seeds or os.getenv("SPCCT_SEEDS")
    seeds = [int(s) for s in seeds_env.split(",")] if seeds_env else SEEDS

    mesh = None
    if args.mesh or multihost:
        from spcct_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    import jax
    is_rank0 = jax.process_index() == 0

    for name in variants:
        if name not in VARIANT_NAMES:
            print(f"unknown variant {name!r}; choices: {VARIANT_NAMES}")
            return 2
        for seed in seeds:
            print(f"\n=== {name} / seed {seed} ===")
            from spcct_tpu.analysis.viz import viz_epoch
            res = fit(name, seed, max_epochs=args.epochs, mesh=mesh,
                      batch_size=args.batch_size, viz_hook=viz_epoch)
            if is_rank0:  # rank-zero CSV writes (reference rank_zero_only loggers)
                append_row_csv(LOG_DIR / "all_results.csv", {
                    "model": name, "seed": seed,
                    "test_macro_dice": res.get("test_macro_dice"),
                    "test_micro_dice": res.get("test_micro_dice"),
                    "test_loss": res.get("test_loss"),
                })
    return 0


if __name__ == "__main__":
    sys.exit(main())
