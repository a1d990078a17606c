# loop.py — jitted train/eval steps and training state.
#
# TPU-native replacement for the reference's Lightning engine
# (reference train.py:1486-1516 Trainer + innovative3D/models.py _shared_step).
# One compiled train_step per variant: forward + loss + grads + optimizer +
# the full metric vector, all on device; the host touches scalars once per
# epoch (the reference syncs 13x4 counts to host EVERY step —
# helpers.py:687-690, SURVEY.md §8 quirk #8).
#
# Parallelism: with a Mesh, the batch is sharded over the 'data' axis and
# parameters are replicated; XLA inserts the gradient all-reduce from the
# sharding annotations (no hand-written collectives — SURVEY.md §2.8).
from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from ..metrics import metric_vector
from ..models.recipes import Recipe
from ..parallel.mesh import DATA_AXIS, batch_sharding, replicated
from ..utils.xla_opts import xla_compiler_options


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    batch_stats: Any          # None for models without BatchNorm
    step: int = 0

    def tree(self):
        return {"params": self.params, "opt_state": self.opt_state,
                "batch_stats": self.batch_stats}


def create_state(
    recipe: Recipe,
    rng: jax.Array,
    example_input: jnp.ndarray,
    steps_per_epoch: int,
    max_epochs: int,
) -> Tuple[TrainState, optax.GradientTransformation]:
    variables = recipe.init(rng, example_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    optimizer = recipe.make_optimizer(steps_per_epoch, max_epochs)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, batch_stats, 0), optimizer


def param_count(params) -> int:
    return int(sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params)))


def make_steps(
    recipe: Recipe,
    optimizer: optax.GradientTransformation,
    mesh=None,
    remat: bool = False,
):
    """Build (train_step, eval_step), jit-compiled, optionally mesh-sharded.

    train_step(state_tree, x, y) -> (new_state_tree, metric_vec)
    eval_step(state_tree, x, y)  -> (metric_vec, logits)
    """
    train_step, eval_step = _unjitted_steps(recipe, optimizer, remat)
    copts = xla_compiler_options()

    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        train_step = jax.jit(
            train_step,
            in_shardings=(rep, rep, bsh, bsh),
            out_shardings=(rep, rep),
            donate_argnums=(0, 1),
            compiler_options=copts,
        )
        eval_step = jax.jit(
            eval_step, in_shardings=(rep, rep, bsh, bsh),
            out_shardings=(rep, rep), donate_argnums=(1,),
            compiler_options=copts,
        )
    else:
        # SPCCT_NO_DONATE=1: measurement knob — isolates donation/custom-call
        # buffer-aliasing interactions (see BASELINE.md perf log)
        don = () if os.getenv("SPCCT_NO_DONATE") == "1" else (0, 1)
        train_step = jax.jit(train_step, donate_argnums=don,
                             compiler_options=copts)
        eval_step = jax.jit(eval_step, donate_argnums=(1,) if don else (),
                            compiler_options=copts)
    return train_step, eval_step


def make_scan_epoch(recipe: "Recipe", optimizer: optax.GradientTransformation,
                    remat: bool = False):
    """One-dispatch compiled training epoch for device-resident data.

    With the dataset in HBM (data/device_aug.py) there is nothing to feed
    per step, so the whole epoch — per-step gather + augmentation + train
    step — compiles into a single lax.scan executable. One dispatch per
    epoch instead of steps_per_epoch round-trips through the (tunneled)
    dispatch path. Augmentation parameters for all steps arrive stacked as
    the scan's xs.

    train_epoch(tree, acc, images, labels, idxs (S,B), params (S,...))
      -> (tree, acc)
    """
    import functools

    from ..data.device_aug import batch_from_params

    inner_train, _ = _unjitted_steps(recipe, optimizer, remat)

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       compiler_options=xla_compiler_options())
    def train_epoch(tree, acc, images, labels, idxs, params):
        def body(carry, xs):
            tree, acc = carry
            idx, p = xs
            x, y = batch_from_params(images, labels, idx, p)
            tree, acc = inner_train(tree, acc, x, y)
            return (tree, acc), ()
        (tree, acc), _ = jax.lax.scan(body, (tree, acc), (idxs, params))
        return tree, acc

    return train_epoch


def _unjitted_steps(recipe, optimizer, remat=False):
    """The train/eval step bodies without jit wrappers — jitted individually
    by make_steps, or composed whole into larger compiled programs
    (make_scan_epoch)."""
    apply_fn = recipe.apply_fn()
    if remat:
        # gradient checkpointing (reference SwinUNETR use_checkpoint=True,
        # config.py:378). Both paths are rematerialized: the mutable
        # (BatchNorm) path checkpoints the (logits, mutated-vars) pytree, so
        # the flag is honored on BN models too instead of silently no-oping.
        base_apply = apply_fn

        def apply_fn(variables, x, train=False, mutable=False):
            if mutable:
                return jax.checkpoint(
                    lambda v, z: base_apply(v, z, train=train, mutable=mutable)
                )(variables, x)
            return jax.checkpoint(
                lambda v, z: base_apply(v, z, train=train))(variables, x)
    forward = recipe.wrap_forward(apply_fn)

    def train_step(tree, acc, x, y):
        params, opt_state, batch_stats = tree["params"], tree["opt_state"], tree["batch_stats"]
        has_bn = batch_stats is not None

        def loss_fn(p):
            variables = {"params": p}
            if has_bn:
                variables["batch_stats"] = batch_stats
            logits, mut = forward(variables, x, train=True, mutable=has_bn)
            loss, _aux = recipe.loss(logits, y)
            return loss, (logits, mut)

        (loss, (logits, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if os.getenv("SPCCT_NO_OPT") == "1":
            # measurement knob: skip optax, keep the backward alive with a
            # tiny SGD-like touch so grads are not dead code (perf bisection
            # of the Pallas step regression — BASELINE.md round-3 log)
            new_params = jax.tree.map(lambda p, g: p - 1e-12 * g.astype(p.dtype),
                                      params, grads)
            new_opt = opt_state
        else:
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
        new_bs = mut["batch_stats"] if (has_bn and mut) else batch_stats
        if os.getenv("SPCCT_NO_METRICS") == "1":
            # measurement knob: loss-only metric vector (keeps the host-pull
            # completion barrier alive, drops the joint-histogram work)
            vec = jnp.zeros_like(acc.sums).at[0].set(loss)
            acc = acc.update(vec)
        else:
            acc = acc.update(metric_vector(loss, logits, y))
        return {"params": new_params, "opt_state": new_opt, "batch_stats": new_bs}, acc

    def eval_step(tree, acc, x, y):
        params, batch_stats = tree["params"], tree["batch_stats"]
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        logits, _ = forward(variables, x, train=False, mutable=False)
        loss, _aux = recipe.loss(logits, y)
        return acc.update(metric_vector(loss, logits, y)), logits

    return train_step, eval_step


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning_rate hyperparam (plateau scheduler hook;
    reference models.py:591-594 ReduceLROnPlateau)."""
    if hasattr(opt_state, "hyperparams") and "learning_rate" in opt_state.hyperparams:
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state._replace(hyperparams=hp)
    return opt_state


def get_learning_rate(opt_state) -> Optional[float]:
    if hasattr(opt_state, "hyperparams") and "learning_rate" in opt_state.hyperparams:
        return float(opt_state.hyperparams["learning_rate"])
    return None


class EarlyStopping:
    """val_macro_dice(max) early stopping, patience 12, min_delta 1e-3
    (reference train.py:1451-1458)."""

    def __init__(self, patience: int = 12, min_delta: float = 1e-3, mode: str = "max"):
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def update(self, value: float) -> bool:
        """Returns True when training should stop."""
        if value is None or not np.isfinite(value):
            self.bad_epochs += 1
            return self.bad_epochs >= self.patience
        improved = (
            self.best is None
            or (self.mode == "max" and value > self.best + self.min_delta)
            or (self.mode == "min" and value < self.best - self.min_delta)
        )
        if improved:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        # Lightning stops when wait_count >= patience (not >) — 12 bad epochs
        # with the default patience, matching reference train.py:1451-1458.
        return self.bad_epochs >= self.patience


class PlateauScheduler:
    """ReduceLROnPlateau(max, factor 0.5, patience 5) on val_macro_dice
    (reference models.py:591-594; torch semantics: threshold 1e-4 rel-or-abs?
    torch default threshold=1e-4 in 'rel' mode w/ mode='max' →
    value > best*(1+1e-4) counts as improvement)."""

    def __init__(self, lr: float, factor: float = 0.5, patience: int = 5,
                 threshold: float = 1e-4):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best: Optional[float] = None
        self.bad = 0

    def update(self, value: float) -> Optional[float]:
        """Returns the new lr when it changes, else None."""
        if value is None or not np.isfinite(value):
            return None
        if self.best is None or value > self.best * (1.0 + self.threshold):
            self.best = value
            self.bad = 0
            return None
        self.bad += 1
        if self.bad > self.patience:
            self.bad = 0
            self.lr = self.lr * self.factor
            return self.lr
        return None
