# unified.py — opt-in global loss/optimizer overrides.
#
# Rebuild of reference unified_loss.py (apply_unified_loss: monkey-patches
# every Lightning model's train/val/test step to one shared
# ce_plus_macro_dice step, unified_loss.py:29-144) and unified_optimizer.py
# (apply_unified_optimizer: forces Adam/AdamW with a constant/poly/cosine
# schedule, unified_optimizer.py:5-60). Both are OFF by default in the
# reference (commented out at train.py:31,673) and off here; enable by
# calling these before training or via SPCCT_UNIFIED_LOSS/OPTIMIZER env.
#
# Rather than monkey-patching classes, we return modified Recipe dataclasses
# — same effect (every variant trains with one shared loss/optimizer),
# functional style.
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

from ..config import IGNORE_INDEX, NUM_CLASSES
from ..losses import LOSS_REGISTRY
from ..models.recipes import Recipe


def apply_unified_loss(recipes: Dict[str, Recipe],
                       loss_name: str = "ce_plus_macro_dice") -> Dict[str, Recipe]:
    """Every variant trains with the same registry loss
    (reference unified_loss.apply_unified_loss)."""
    fn = LOSS_REGISTRY[loss_name]

    def unified(logits, labels):
        return fn(logits, labels, NUM_CLASSES, IGNORE_INDEX), {}

    return {name: dataclasses.replace(r, loss=unified)
            for name, r in recipes.items()}


def apply_unified_optimizer(recipes: Dict[str, Recipe],
                            opt: str = "adam",
                            lr: float = 1e-4,
                            weight_decay: float = 0.0,
                            schedule: str = "const") -> Dict[str, Recipe]:
    """Every variant trains with one optimizer recipe
    (reference unified_optimizer.apply_unified_optimizer). schedule:
    'const' | 'cosine' (warmup-cosine) — poly decay maps to cosine here."""
    def patch(r: Recipe) -> Recipe:
        if schedule == "cosine":
            return dataclasses.replace(r, opt_kind="adamw_cosine", lr=lr,
                                       weight_decay=weight_decay,
                                       warmup_epochs=0, plateau=False)
        kind = "torch_adam_wd" if weight_decay else "adam"
        return dataclasses.replace(r, opt_kind=kind, lr=lr,
                                   weight_decay=weight_decay, plateau=False)

    return {name: patch(r) for name, r in recipes.items()}


def maybe_apply_env_overrides(recipes: Dict[str, Recipe]) -> Dict[str, Recipe]:
    if os.getenv("SPCCT_UNIFIED_LOSS"):
        recipes = apply_unified_loss(recipes, os.environ["SPCCT_UNIFIED_LOSS"])
    if os.getenv("SPCCT_UNIFIED_OPTIMIZER"):
        recipes = apply_unified_optimizer(
            recipes,
            opt=os.environ["SPCCT_UNIFIED_OPTIMIZER"],
            lr=float(os.getenv("SPCCT_UNIFIED_LR", "1e-4")),
            weight_decay=float(os.getenv("SPCCT_UNIFIED_WD", "0")),
            schedule=os.getenv("SPCCT_UNIFIED_SCHEDULE", "const"),
        )
    return recipes
