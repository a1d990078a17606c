#!/usr/bin/env python
# cicek_forensic.py — is 3DUNet's converged row (0.318, seed 42) the
# reference recipe faithfully reproduced, or a porting bug? (VERDICT r5
# task 5, in the style of the round-4 R2U micro-dice forensic.)
#
# Evidence already in hand (runs_protocol_r3/logs/3DUNet/seed42):
#   * train fit is healthy (train macro dice 0.80, train loss -> 0.014), so
#     the model/loss/depth-adapter port WORKS;
#   * val macro dice oscillates 0.31-0.66 with no trend after epoch ~9 —
#     the signature of plain SGD(lr=1e-2, momentum=0.99) with NO scheduler
#     (effective LR ~ lr/(1-m) = 1.0), which is exactly the reference
#     recipe (config.py:283-303: nesterov=False, weight_decay=0, no
#     configure_optimizers scheduler — models.py:851-853).
#
# This script runs the controlled experiment: SAME code path end to end,
# three optimizer arms, reduced resolution so it can run on CPU while the
# chip executes the protocol:
#   ref    — SGD(1e-2, m=.99)        (the reference recipe)
#   lowlr  — SGD(1e-3, m=.99)        (10x lower LR, same family)
#   adam   — Adam(1e-4)              (the BaseLitModel default family)
# If ref oscillates while lowlr/adam converge smoothly through the
# identical model/adapter/loss/data, the 0.318 row is recipe-faithful,
# not a port defect.
#
#   JAX_PLATFORMS=cpu SPCCT_SYNTH_HW=64 SPCCT_SYNTH_SLICES=6 \
#     python scripts/cicek_forensic.py --epochs 25
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="/tmp/cicek_forensic")
    args = ap.parse_args()

    if os.getenv("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.getenv("JAX_PLATFORMS"))

    from spcct_tpu.models import recipes as R
    from spcct_tpu.train.driver import fit

    base = R.get_recipe("3DUNet")
    arms = {
        "ref": base,
        "lowlr": dataclasses.replace(base, lr=1e-3),
        "adam": dataclasses.replace(base, opt_kind="adam", lr=1e-4),
    }
    results = {}
    for arm, rec in arms.items():
        R.registry()["3DUNet"] = rec        # same name -> same ckpt contract
        out = os.path.join(args.out, arm)
        print(f"\n=== arm {arm}: opt={rec.opt_kind} lr={rec.lr} ===",
              flush=True)
        res = fit("3DUNet", args.seed, max_epochs=args.epochs,
                  log_root=os.path.join(out, "logs"),
                  ckpt_root=os.path.join(out, "ckpt"))
        results[arm] = res.get("test_macro_dice")
        print(f"[{arm}] test_macro_dice={results[arm]}", flush=True)

    print("\n=== forensic summary ===")
    for arm, v in results.items():
        print(f"  {arm:6s} test_macro_dice={v}")
    print("read val trajectories from "
          f"{args.out}/<arm>/logs/3DUNet/seed{args.seed}/logs/metrics.csv")


if __name__ == "__main__":
    main()
