# recipes.py — per-variant training recipes: module + forward wrapper + loss +
# optimizer. This is the TPU-native VARIANTS registry.
#
# Rebuilds reference innovative3D/config.py:271-482 (registry + exact
# hyperparameters) and the Lightning wrappers' forward/loss/optimizer logic
# from innovative3D/models.py. Each entry keeps the reference's name, data
# module, per-variant checkpoint dir, and numerical recipe.
from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .. import losses as L
from ..config import BEST_LR, CHECKPOINT_DIR, IGNORE_INDEX, NUM_CLASSES, NUM_FRAMES, SOFT_DICE_IN_LOSS
from ..ops.shape import center_crop_3d, pad_to_mult_3d, resize_depth
from ..ops.resize import trilinear_resize
from .baselines import Cicek3DUNet, R2UNet3D, ResUNetPP3D
from .spff import UNet3DSpectralCore

LossFn = Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]


@dataclasses.dataclass(frozen=True)
class Recipe:
    """Everything the training loop needs to train one registered variant."""
    name: str
    module: Any                       # flax module; __call__(x, train)
    loss: LossFn                      # (logits, labels) -> (loss, aux)
    opt_kind: str                     # 'adam' | 'torch_adam_wd' | 'sgd' | 'adamw_cosine'
    lr: float
    weight_decay: float = 0.0
    momentum: float = 0.0
    warmup_epochs: int = 0
    plateau: bool = False             # ReduceLROnPlateau(max, 0.5, patience 5)
    forward_wrap: str = "plain"       # 'plain'|'pad16'|'depth16'|'resize96'|'pad32'
    img_size: Tuple[int, int, int] = (96, 96, 96)
    full_metrics: bool = True         # BaseLitModel logs per-class metrics
    ckpt_dir: Any = None
    dm: str = "3d"
    engine: str = "standard"          # 'standard' | 'folded' (SPFF family)
    remat: bool = False               # gradient checkpointing (Swin: reference config.py:378 use_checkpoint=True)

    def apply_fn(self):
        """Execution engine: 'folded' computes the identical function in
        depth-folded layout (see models/spff_folded.py) — parameter trees and
        checkpoints are interchangeable with 'standard'."""
        if self.engine == "folded":
            from .spff_folded import make_folded_apply
            return make_folded_apply(self.module)
        return self.module.apply

    def wrap_forward(self, apply_fn):
        """Return forward(variables, x, train, rngs) -> (logits, mutated) with
        the variant's pad/resize policy applied (reference forward overrides:
        models.py:707-712 pad16; 773-777 depth adapter; 1022-1036 UNETR
        resize; 899-904 Swin pad32; 1199-1204/1381-1386 pad16).

        Model outputs are normalized through select_main_logits (reference
        _select_main_logits, train.py:160-187 used at 723-733): a module may
        return a tensor, a deep-supervision tuple/list, or a dict — downstream
        always sees the largest-spatial-volume logits."""
        from ..utils.outputs import select_main_logits

        wrap = self.forward_wrap

        def forward(variables, x, train=False, mutable=False):
            def run(z):
                if mutable:
                    out, mut = apply_fn(variables, z, train=train, mutable=["batch_stats"])
                    return select_main_logits(out), mut
                return select_main_logits(apply_fn(variables, z, train=train)), None

            if wrap == "plain":
                y, mut = run(x)
            elif wrap == "pad16":
                xp, orig = pad_to_mult_3d(x, 16)
                y, mut = run(xp)
                y = center_crop_3d(y, orig).astype(jnp.float32)
            elif wrap == "pad32":
                xp, orig = pad_to_mult_3d(x, 32)
                y, mut = run(xp)
                # deferred upcast: crop the (possibly bf16) padded logits
                # first — upcast commutes exactly with cropping
                y = center_crop_3d(y, orig).astype(jnp.float32)
            elif wrap == "depth16":
                d0 = x.shape[1]
                y, mut = run(resize_depth(x, 16))
                if y.shape[1] != d0:
                    # deferred upcast: resize the depth-16 logits back to 5
                    # frames in the model dtype, upcast the small result
                    # (resize is linear; bf16 blend error ~0.4% relative,
                    # well under the bf16 conv noise already in the logits)
                    y = trilinear_resize(y, (d0, y.shape[2], y.shape[3]))
                y = y.astype(jnp.float32)
            elif wrap == "resize96":
                xp, orig = pad_to_mult_3d(x, 16)
                tgt = self.img_size
                pdhw = xp.shape[1:4]
                xr = trilinear_resize(xp, tgt) if pdhw != tgt else xp
                y, mut = run(xr)
                if y.shape[1:4] != pdhw:
                    y = trilinear_resize(y, pdhw)
                y = center_crop_3d(y, orig)
            else:
                raise ValueError(wrap)
            return y, mut

        return forward

    def init_input(self, x: jnp.ndarray) -> jnp.ndarray:
        """Input as the module will actually see it (post pad/resize) — init
        must trace the module with this shape, not the raw batch shape."""
        if self.forward_wrap == "pad16":
            return pad_to_mult_3d(x, 16)[0]
        if self.forward_wrap == "pad32":
            return pad_to_mult_3d(x, 32)[0]
        if self.forward_wrap == "depth16":
            return resize_depth(x, 16)
        if self.forward_wrap == "resize96":
            return jnp.zeros((x.shape[0],) + tuple(self.img_size) + (x.shape[-1],),
                             x.dtype)
        return x

    def init(self, rng, x: jnp.ndarray):
        return self.module.init(rng, self.init_input(x), train=False)

    def make_optimizer(self, steps_per_epoch: int, max_epochs: int):
        """Optimizer factory. Plateau-capable optimizers are wrapped in
        optax.inject_hyperparams so the loop can halve the learning rate in
        place (reference models.py:591-594 ReduceLROnPlateau)."""
        if self.opt_kind == "adam":
            return optax.inject_hyperparams(optax.adam)(learning_rate=self.lr)
        if self.opt_kind == "torch_adam_wd":
            # torch Adam(weight_decay=w): L2 added to the gradient BEFORE the
            # moment updates (not decoupled).
            def make(learning_rate):
                return optax.chain(
                    optax.add_decayed_weights(self.weight_decay),
                    optax.adam(learning_rate),
                )
            return optax.inject_hyperparams(make)(learning_rate=self.lr)
        if self.opt_kind == "sgd":
            def make_sgd(learning_rate):
                return optax.sgd(learning_rate, momentum=self.momentum or None,
                                 nesterov=False)
            return optax.inject_hyperparams(make_sgd)(learning_rate=self.lr)
        if self.opt_kind == "adamw_cosine":
            # Per-iteration warmup + cosine (reference models.py:1072-1081):
            # t < warmup: lr*(t+1)/warmup; else 0.5*lr*(1+cos(pi*prog)).
            warmup_iters = max(1, int(self.warmup_epochs * steps_per_epoch))
            total_iters = max(1, int(steps_per_epoch * max_epochs))

            def sched(t):
                t = jnp.asarray(t, jnp.float32)
                warm = self.lr * (t + 1.0) / warmup_iters
                prog = (t - warmup_iters) / max(1, total_iters - warmup_iters)
                prog = jnp.clip(prog, 0.0, 1.0)
                cos = 0.5 * self.lr * (1.0 + jnp.cos(jnp.pi * prog))
                return jnp.where(t < warmup_iters, warm, cos)

            return optax.adamw(sched, b1=0.9, b2=0.999,
                               weight_decay=self.weight_decay)
        raise ValueError(self.opt_kind)

    def example_input(self, hw: int = 64, batch: int = 1) -> jnp.ndarray:
        return jnp.zeros((batch, NUM_FRAMES, hw, hw, 1), jnp.float32)


# ─────────────────────────────────────────────────────────────
# Loss closures (exact per-variant recipes)
# ─────────────────────────────────────────────────────────────
def _base_lit_loss(logits, labels):
    loss = L.ce_plus_macro_dice_loss(
        logits, labels, NUM_CLASSES, IGNORE_INDEX, soft_dice=SOFT_DICE_IN_LOSS
    )
    return loss, {}


def _cicek_loss(logits, labels):
    # SGD + weighted CE recipe, dice weight 0 (reference config.py:283-303)
    ce = L.weighted_softmax_ce(logits, labels, IGNORE_INDEX)
    return ce, {}


def _r2u_loss(logits, labels):
    loss, dice = L.r2u_dice_only_loss(logits, labels, IGNORE_INDEX)
    return loss, {"soft_dice": dice}


def _resunetpp_loss(logits, labels):
    loss, dice, ce = L.dice_ce_loss_with_metrics(
        logits, labels, NUM_CLASSES, IGNORE_INDEX,
        include_bg_in_dice=False, ce_weight=0.5, dice_weight=0.5,
    )
    return loss, {"soft_dice": dice, "ce": ce}


def _transformer_loss(logits, labels):
    loss = L.transformer_dice_ce_loss(
        logits, labels, NUM_CLASSES, IGNORE_INDEX,
        ce_weight=0.5, include_bg_in_dice=False, use_ce=True,
    )
    return loss, {}


# ─────────────────────────────────────────────────────────────
# SPCT family constructors (reference config.py:410-476 _SPCT_COMMON)
# ─────────────────────────────────────────────────────────────
def _spct_core(**overrides):
    kw = dict(
        num_classes=NUM_CLASSES, base=32, ksd=3,
        use_se=True, use_specse=True, use_spatial=False, use_skip_gate=False,
        num_frames=NUM_FRAMES, dtype=jnp.bfloat16,
        # Measurement knobs for the round-5 bandwidth-remat experiments
        # (BASELINE.md round-5): per-DoubleConv / per-decoder-level remat on
        # ANY SPCT-family recipe. Both recompute elementwise/norm chains in
        # the backward pass, trading idle MXU FLOPs for HBM traffic.
        # level_remat changes the decoder parameter-tree layout — fresh
        # trees only (bench/probe use, not resuming checkpoints).
        block_remat=os.getenv("SPCCT_BLOCK_REMAT") == "1",
        level_remat=os.getenv("SPCCT_LEVEL_REMAT_ALL") == "1",
    )
    kw.update(overrides)
    return UNet3DSpectralCore(**kw)


# SPFF execution engine: 'standard' (channels-last conv3d) or 'folded'
# (depth-folded banded conv2d, models/spff_folded.py — bit-equivalent;
# currently slower end-to-end on v5e despite winning the conv microbenchmark,
# so default stays standard until its backward path is tuned).
import os as _os
_SPFF_ENGINE = _os.getenv("SPCCT_SPFF_ENGINE", "standard")


def build_registry() -> Dict[str, Recipe]:
    """All ten variants in reference registration order (config.py:271-476)."""
    r: Dict[str, Recipe] = {}

    def add(rec: Recipe):
        r[rec.name] = rec

    # 1. 3DUNet — Cicek depth-adapter, SGD(1e-2, m=.99), weighted CE.
    #    remat: the depth16 adapter resizes depth 5→16 (3.2x activations) and
    #    the step ResourceExhausts 16 GB HBM at full resolution without it.
    add(Recipe(
        name="3DUNet",
        module=Cicek3DUNet(num_classes=NUM_CLASSES, base=32, use_bn=True,
                           block_remat=True, logits_f32=False,
                           dtype=jnp.bfloat16),
        loss=_cicek_loss, opt_kind="sgd", lr=1e-2, momentum=0.99,
        forward_wrap="depth16", full_metrics=False,
        ckpt_dir=CHECKPOINT_DIR / "3DUNet",
    ))

    # 2. UNETR — ViT 96^3, AdamW 1e-4 wd 1e-2, warmup-5 cosine, Dice+CE .5
    from .unetr import UNETR
    add(Recipe(
        name="UNETR",
        module=UNETR(num_classes=NUM_CLASSES, img_size=(96, 96, 96), feature_size=16,
                     hidden_size=768, mlp_dim=3072, num_heads=12, dtype=jnp.bfloat16),
        loss=_transformer_loss, opt_kind="adamw_cosine", lr=1e-4,
        weight_decay=1e-2, warmup_epochs=5, forward_wrap="resize96",
        img_size=(96, 96, 96), full_metrics=False,
        ckpt_dir=CHECKPOINT_DIR / "UNETR",
    ))

    # 3. R2UNet3D — base 16, t=2, Adam 1e-3, dice-only. remat: pad16 pads
    #    depth 5→16 and the recurrent units hold t+1 copies per block —
    #    gradient checkpointing keeps full-resolution within 16 GB HBM.
    add(Recipe(
        name="R2UNet3D",
        module=R2UNet3D(num_classes=NUM_CLASSES, base=16, t=2, dtype=jnp.bfloat16),
        loss=_r2u_loss, opt_kind="adam", lr=1e-3,
        forward_wrap="pad16", full_metrics=False, remat=True,
        ckpt_dir=CHECKPOINT_DIR / "R2UNet3D",
    ))

    # 4. SwinUNETR — 64^3 crop recipe, feat 12, depths (1,1,1,1), window 2^3,
    #    AdamW 8e-4 wd 1e-2, warmup-5 cosine.
    #    Window size: the reference CONFIGURES (2,2,2) (config.py:374) but its
    #    kwarg filter drops it, so MONAI's default 7^3 is what actually runs.
    #    Default here is 7^3: actual-reference-behavior parity AND the winner
    #    of the round-5 matched-budget comparison (test macro dice 0.7413 vs
    #    0.6559 at +4% epoch time — BASELINE.md "Phase C COMPLETE").
    #    SPCCT_SWIN_WINDOW=2 reproduces the configured-intent arm (the v1
    #    protocol table in runs_protocol_r3/ pins it for row consistency).
    from .swin_unetr import SwinUNETR
    _win = int(os.getenv("SPCCT_SWIN_WINDOW", "7"))
    add(Recipe(
        name="SwinUNETR",
        module=SwinUNETR(num_classes=NUM_CLASSES, feature_size=12,
                         depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                         window_size=(_win,) * 3, mlp_ratio=2.0,
                         block_remat=True, logits_f32=False,
                         dtype=jnp.bfloat16),
        loss=_transformer_loss, opt_kind="adamw_cosine", lr=8e-4,
        weight_decay=1e-2, warmup_epochs=5, forward_wrap="pad32",
        full_metrics=False, remat=True,
        ckpt_dir=CHECKPOINT_DIR / "SwinUNETR",
    ))

    # 5. ResUNet++ — base 16, Adam 1e-4 wd 1e-5 (torch-style), Dice+CE .5/.5.
    #    remat: pad16 depth padding, same 16 GB HBM rationale as R2UNet3D.
    add(Recipe(
        name="ResUNet++",
        module=ResUNetPP3D(num_classes=NUM_CLASSES, base=16, dtype=jnp.bfloat16),
        loss=_resunetpp_loss, opt_kind="torch_adam_wd", lr=1e-4, weight_decay=1e-5,
        forward_wrap="pad16", full_metrics=False, remat=True,
        ckpt_dir=CHECKPOINT_DIR / "ResUNet++",
    ))

    # 6. SPFF-UNet — spectral core + EFiLM + FourierGate (+SE +SpecSE)
    add(Recipe(
        name="SPFF-UNet",
        module=_spct_core(use_efilm=True, use_fouriergate=True),
        loss=_base_lit_loss, opt_kind="adam", lr=BEST_LR, plateau=True,
        ckpt_dir=CHECKPOINT_DIR / "SPFF-UNet",
        engine=_SPFF_ENGINE,
    ))

    # 7. E_SP_UNet — EFiLM only
    add(Recipe(
        name="E_SP_UNet",
        module=_spct_core(use_efilm=True, use_fouriergate=False),
        loss=_base_lit_loss, opt_kind="adam", lr=BEST_LR, plateau=True,
        ckpt_dir=CHECKPOINT_DIR / "E_SP_UNet",
        engine=_SPFF_ENGINE,
    ))

    # 8. FG_SP_UNet — FourierGate only
    add(Recipe(
        name="FG_SP_UNet",
        module=_spct_core(use_efilm=False, use_fouriergate=True),
        loss=_base_lit_loss, opt_kind="adam", lr=BEST_LR, plateau=True,
        ckpt_dir=CHECKPOINT_DIR / "FG_SP_UNet",
        engine=_SPFF_ENGINE,
    ))

    # 9. SP_UNet — SE+SpecSE only, pad-to-16 forward (_LitSPCT_Base).
    #    remat: the pad16 wrap pads depth 5→16 (3.2x activations); at the
    #    reference full-resolution config this needs 21.8 GB of activations
    #    vs 16 GB HBM (measured OOM) — gradient checkpointing fits it.
    add(Recipe(
        name="SP_UNet",
        # vcat_skips: full-res pad16 step sits 0.15 GiB under HBM — keep
        # the virtual-concat joins that measurement assumed (layers.py)
        # Level-remat DEFAULT-ON (round-5 AOT A/B, perf_logs/
        # r5_memprobe_spunet_{off,on}.log): decoder-level remat cells
        # (spff._DecStage) stop saving the ConvTranspose outputs, cutting
        # live step demand 15.55 -> 14.63 GiB (+0.92 GiB headroom vs the
        # 0.15 GiB-from-OOM default it replaces). SPCCT_LEVEL_REMAT=0
        # restores the old configuration for measurement.
        module=_spct_core(block_remat=True, logits_f32=False,
                          vcat_skips=True,
                          level_remat=os.getenv("SPCCT_LEVEL_REMAT", "1") == "1"),
        loss=_base_lit_loss, opt_kind="adam", lr=BEST_LR, plateau=True,
        forward_wrap="pad16",
        ckpt_dir=CHECKPOINT_DIR / "SP_UNet",
        engine=_SPFF_ENGINE,
    ))

    # 10. PlainCore_UNet — all gates off
    add(Recipe(
        name="PlainCore_UNet",
        module=_spct_core(use_se=False, use_specse=False),
        loss=_base_lit_loss, opt_kind="adam", lr=BEST_LR, plateau=True,
        ckpt_dir=CHECKPOINT_DIR / "PlainCore_UNet",
        engine=_SPFF_ENGINE,
    ))

    return r


_REGISTRY: Optional[Dict[str, Recipe]] = None


def registry() -> Dict[str, Recipe]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = build_registry()
        # unified loss/optimizer overrides (reference unified_loss.py /
        # unified_optimizer.py — OFF unless SPCCT_UNIFIED_* env set)
        from ..train.unified import maybe_apply_env_overrides
        _REGISTRY = maybe_apply_env_overrides(_REGISTRY)
    return _REGISTRY


VARIANT_NAMES = [
    "3DUNet", "UNETR", "R2UNet3D", "SwinUNETR", "ResUNet++",
    "SPFF-UNet", "E_SP_UNet", "FG_SP_UNet", "SP_UNet", "PlainCore_UNet",
]


def get_recipe(name: str) -> Recipe:
    return registry()[name]
