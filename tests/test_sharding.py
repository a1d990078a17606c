# Multi-device tests on the virtual 8-device CPU mesh
# (xla_force_host_platform_device_count=8, set in conftest.py).
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spcct_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    pad_batch_to_mesh,
    shard_batch,
)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(8, 1)
    assert mesh.shape[DATA_AXIS] == 8
    mesh2 = make_mesh(4, 2)
    assert mesh2.shape[DATA_AXIS] == 4 and mesh2.shape["model"] == 2


def test_pad_batch_to_mesh():
    mesh = make_mesh(8, 1)
    x = np.zeros((3, 5, 8, 8, 1), np.float32)
    y = np.zeros((3, 5, 8, 8), np.int32)
    xp, yp = pad_batch_to_mesh(x, y, mesh)
    assert xp.shape[0] == 8 and yp.shape[0] == 8
    assert (yp[3:] == 255).all()  # padded samples fully ignored


def test_data_parallel_train_step_matches_single_device():
    """Gradient all-reduce via sharding annotations: an 8-way sharded step
    must produce the same params as the unsharded step.

    SGD, not the recipe's Adam (same rationale as
    test_scan_epoch_matches_per_step): Adam's first step is ~lr*sign(g),
    so reduction-order noise on near-zero grads flips signs and breaks
    elementwise closeness — and Adam's scale invariance would HIDE a
    sum-vs-mean all-reduce bug, which SGD exposes directly."""
    import optax

    from spcct_tpu.models.spff import UNet3DSpectralCore
    from spcct_tpu.models.recipes import Recipe, _base_lit_loss
    from spcct_tpu.train.loop import create_state, make_steps

    recipe = Recipe(name="tiny", module=UNet3DSpectralCore(num_classes=13, base=2, ksd=1),
                    loss=_base_lit_loss, opt_kind="adam", lr=1e-3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 5, 8, 8, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 13, (8, 5, 8, 8)).astype(np.int32))

    from spcct_tpu.metrics import MetricAccum, metric_names
    state, _ = create_state(recipe, jax.random.PRNGKey(0), x, 1, 1)
    opt = optax.sgd(5e-2)
    state.opt_state = opt.init(state.params)
    tree_a = jax.tree.map(lambda a: a.copy(), state.tree())
    tree_b = jax.tree.map(lambda a: a.copy(), state.tree())
    n_m = len(metric_names("x"))

    step_single, _ = make_steps(recipe, opt, mesh=None)
    tree_a, acc_a = step_single(tree_a, MetricAccum.zeros(n_m), x, y)
    mv_a = acc_a.result()

    mesh = make_mesh(8, 1)
    step_mesh, eval_mesh = make_steps(recipe, opt, mesh=mesh)
    xb, yb = shard_batch((np.asarray(x), np.asarray(y)), mesh)
    tree_b, acc_b = step_mesh(tree_b, MetricAccum.zeros(n_m), xb, yb)
    mv_b = acc_b.result()

    for a, b in zip(jax.tree.leaves(tree_a["params"]), jax.tree.leaves(tree_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mv_a), np.asarray(mv_b), atol=1e-4,
                               equal_nan=True)


def test_fit_with_mesh_end_to_end(tmp_path):
    """driver.fit on the virtual 8-device mesh: pad_batch_to_mesh + sharded
    train/eval steps + checkpointing, one epoch."""
    from spcct_tpu.config import trainval_sets
    from spcct_tpu.data.pipeline import SpcctDataModule3D
    from spcct_tpu.train import driver

    mesh = make_mesh(8, 1)
    dm = SpcctDataModule3D(trainval_sets[:1], batch_size=3, num_frames=5)
    res = driver.fit("PlainCore_UNet", 7, max_epochs=1, dm=dm, mesh=mesh,
                     log_root=tmp_path / "logs", ckpt_root=tmp_path / "ckpt",
                     run_test=True)
    assert np.isfinite(res["test_loss"])


def test_graft_entry_dryrun_multichip():
    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
