# ablation.py — seed harness + robustness probes.
#
# Rebuild of reference ablation_tools.py (89 LoC): set_all_seeds/run_seeds
# (ablation_tools.py:5-23 — broken in the reference via undefined MAX_EPOCHS;
# working here), profile_model (27-62, superseded by analysis/profiling.py),
# and eval_with_perturbations (68-89): clean vs gamma-0.9 vs noise-0.02 vs
# down-up-scale-0.9 forwards.
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def set_all_seeds(seed: int):
    import jax

    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def run_seeds(variant: str, seeds: Optional[List[int]] = None,
              max_epochs: Optional[int] = None, **fit_kwargs) -> Dict[int, Dict]:
    """Train one variant across seeds; returns {seed: test metrics}."""
    from ..config import SEEDS
    from ..train.driver import fit

    out = {}
    for seed in seeds or SEEDS:
        out[seed] = fit(variant, seed, max_epochs=max_epochs, **fit_kwargs)
    return out


def _perturb(x: np.ndarray, kind: str) -> np.ndarray:
    if kind == "clean":
        return x
    if kind == "gamma":
        # gamma 0.9 on normalized intensities (ablation_tools.py:74-77)
        lo, hi = x.min(), x.max()
        xn = (x - lo) / max(hi - lo, 1e-8)
        return (np.power(xn, 0.9) * (hi - lo) + lo).astype(x.dtype)
    if kind == "noise":
        return (x + np.random.default_rng(0).standard_normal(x.shape)
                .astype(np.float32) * 0.02 * max(float(x.std()), 1e-8)).astype(x.dtype)
    if kind == "scale":
        # down-up resize 0.9 through jax.image (ablation_tools.py:83-87)
        import jax
        H, W = x.shape[-3:-1]
        small = jax.image.resize(x, x.shape[:-3] + (int(H * 0.9), int(W * 0.9),
                                                    x.shape[-1]), "linear")
        return np.asarray(jax.image.resize(small, x.shape, "linear"),
                          dtype=x.dtype)
    raise ValueError(kind)


def eval_with_perturbations(variant: str, seed: int = 42,
                            kinds=("clean", "gamma", "noise", "scale"),
                            max_batches: int = 4) -> Dict[str, float]:
    """Robustness probe: macro dice under input perturbations
    (ablation_tools.py:68-89)."""
    import jax
    import jax.numpy as jnp
    from ..config import CHECKPOINT_DIR, NUM_FRAMES, trainval_sets
    from ..data.pipeline import SpcctDataModule3D
    from ..metrics import MetricAccum, metric_names, metric_vector
    from ..models.recipes import get_recipe
    from ..train.checkpoint import CheckpointManager, seed_dir

    recipe = get_recipe(variant)
    dm = SpcctDataModule3D(trainval_sets, batch_size=1, num_frames=NUM_FRAMES)
    dm.setup("test")
    mgr = CheckpointManager(seed_dir(CHECKPOINT_DIR, variant, seed))
    kind_ck = "best" if mgr.has("best") else ("last" if mgr.has("last") else None)

    x0 = jnp.zeros((1, NUM_FRAMES) + dm.test_set.images[0].shape[-2:] + (1,),
                   jnp.float32)
    template = recipe.init(jax.random.PRNGKey(seed), x0)
    state = {"params": template["params"],
             "batch_stats": template.get("batch_stats")}
    if kind_ck:
        state, _ = mgr.restore(kind_ck, state)
    forward = recipe.wrap_forward(recipe.apply_fn())

    names = metric_names("t")
    macro_idx = names.index("t_macro_dice")
    out: Dict[str, float] = {}
    for pk in kinds:
        acc = MetricAccum.zeros(len(names))
        for bi, (x, y) in enumerate(dm.test_batches(prefetch=False)):
            if bi >= max_batches:
                break
            xp = _perturb(np.asarray(x), pk)
            variables = {"params": state["params"]}
            if state.get("batch_stats") is not None:
                variables["batch_stats"] = state["batch_stats"]
            logits, _ = forward(variables, jnp.asarray(xp), train=False,
                                mutable=False)
            mv = metric_vector(jnp.float32(0), logits, jnp.asarray(y))
            acc = acc.update(mv)
        out[pk] = float(np.asarray(acc.result())[macro_idx])
    return out
