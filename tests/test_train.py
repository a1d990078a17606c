# Training-loop tests: end-to-end fit on tiny synthetic data, resume,
# plateau/early-stop logic, optimizer parity.
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from spcct_tpu.models.recipes import Recipe
from spcct_tpu.train.loop import (
    EarlyStopping,
    PlateauScheduler,
    create_state,
    get_learning_rate,
    make_steps,
    set_learning_rate,
)


def _tiny_recipe(**kw):
    from spcct_tpu.models.spff import UNet3DSpectralCore
    from spcct_tpu.models.recipes import _base_lit_loss
    defaults = dict(
        name="tiny",
        module=UNet3DSpectralCore(num_classes=13, base=4, ksd=3),
        loss=_base_lit_loss, opt_kind="adam", lr=1e-3, plateau=True,
    )
    defaults.update(kw)
    return Recipe(**defaults)


def _batch(rng, b=2, hw=16):
    x = rng.standard_normal((b, 5, hw, hw, 1)).astype(np.float32)
    y = rng.integers(0, 13, (b, 5, hw, hw)).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(y)


def test_train_step_decreases_loss():
    recipe = _tiny_recipe()
    rng = np.random.default_rng(0)
    x, y = _batch(rng)
    from spcct_tpu.metrics import MetricAccum, metric_names
    state, opt = create_state(recipe, jax.random.PRNGKey(0), x, 10, 10)
    train_step, _ = make_steps(recipe, opt)
    tree = state.tree()
    losses = []
    for _ in range(8):
        acc = MetricAccum.zeros(len(metric_names("x")))
        tree, acc = train_step(tree, acc, x, y)
        losses.append(float(np.asarray(acc.result())[0]))
    assert losses[-1] < losses[0]


def test_set_learning_rate_roundtrip():
    recipe = _tiny_recipe()
    x, _ = _batch(np.random.default_rng(0))
    state, opt = create_state(recipe, jax.random.PRNGKey(0), x, 10, 10)
    assert abs(get_learning_rate(state.opt_state) - 1e-3) < 1e-9
    new = set_learning_rate(state.opt_state, 5e-4)
    assert abs(get_learning_rate(new) - 5e-4) < 1e-9


def test_early_stopping_lightning_semantics():
    # Lightning stops when wait_count >= patience (reference train.py:1451-1458)
    es = EarlyStopping(patience=2, min_delta=1e-3)
    assert not es.update(0.5)
    assert not es.update(0.5005)  # below min_delta → bad epoch 1
    assert es.update(0.5006)      # bad epoch 2 >= patience → stop
    es2 = EarlyStopping(patience=2, min_delta=1e-3)
    es2.update(0.5)
    es2.update(0.6)               # improvement resets
    assert es2.bad_epochs == 0


def test_plateau_halves_after_patience():
    pl = PlateauScheduler(1e-3, factor=0.5, patience=2)
    assert pl.update(0.5) is None
    for _ in range(2):
        assert pl.update(0.4) is None
    assert pl.update(0.4) == pytest.approx(5e-4)


def test_sgd_momentum_matches_torch():
    torch = pytest.importorskip("torch")
    # one param, few steps: optax.sgd(momentum) must match torch.optim.SGD
    w0 = np.asarray([1.0, -2.0], np.float32)
    grads = [np.asarray(g, np.float32) for g in ([0.1, 0.2], [0.3, -0.1], [0.05, 0.0])]
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tw], lr=0.01, momentum=0.99)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()
    opt = optax.sgd(0.01, momentum=0.99)
    p = jnp.asarray(w0)
    s = opt.init(p)
    for g in grads:
        u, s = opt.update(jnp.asarray(g), s, p)
        p = optax.apply_updates(p, u)
    np.testing.assert_allclose(np.asarray(p), tw.detach().numpy(), atol=1e-6)


def test_torch_adam_wd_matches_torch():
    torch = pytest.importorskip("torch")
    w0 = np.asarray([1.0, -2.0], np.float32)
    grads = [np.asarray(g, np.float32) for g in ([0.1, 0.2], [0.3, -0.1])]
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=1e-3, weight_decay=1e-2)
    for g in grads:
        tw.grad = torch.from_numpy(g.copy())
        topt.step()
    recipe = _tiny_recipe(opt_kind="torch_adam_wd", lr=1e-3, weight_decay=1e-2)
    opt = recipe.make_optimizer(1, 1)
    p = jnp.asarray(w0)
    s = opt.init(p)
    for g in grads:
        u, s = opt.update(jnp.asarray(g), s, p)
        p = optax.apply_updates(p, u)
    np.testing.assert_allclose(np.asarray(p), tw.detach().numpy(), atol=1e-6)


def test_fit_and_resume(tmp_path, monkeypatch):
    """2-epoch fit writes last/best checkpoints and metrics.csv; a rerun with
    a higher epoch budget resumes from `last` instead of restarting."""
    from spcct_tpu.data.pipeline import SpcctDataModule3D
    from spcct_tpu.config import trainval_sets
    from spcct_tpu.train import driver

    monkeypatch.setenv("SPCCT_SCAN_LABELS", "1")
    dm = SpcctDataModule3D(trainval_sets[:1], batch_size=2, num_frames=5)
    res = driver.fit("PlainCore_UNet", 42, max_epochs=2, dm=dm,
                     log_root=tmp_path / "logs", ckpt_root=tmp_path / "ckpt",
                     run_test=True)
    assert "test_macro_dice" in res
    sdir = tmp_path / "ckpt" / "PlainCore_UNet" / "seed42"
    assert (sdir / "last").exists() and (sdir / "meta.json").exists()
    run_dir = tmp_path / "logs" / "PlainCore_UNet" / "seed42"
    assert (run_dir / "logs" / "metrics.csv").exists()
    assert (run_dir / "test_details.csv").exists()
    # SPCCT_SCAN_LABELS=1 wiring (reference train.py:379-501)
    scan_csv = (run_dir / "scan_labels.csv").read_text()
    assert scan_csv.startswith("case,pred_BG") and len(scan_csv.splitlines()) > 1
    # model_compute.txt carries Params AND MACs/FLOPs (reference train.py:1272-1396)
    compute = (run_dir / "model_compute.txt").read_text()
    assert "Params:" in compute and "FLOPs:" in compute and "MACs:" in compute

    # resume: epoch counter continues from 2
    res2 = driver.fit("PlainCore_UNet", 42, max_epochs=3, dm=dm,
                      log_root=tmp_path / "logs", ckpt_root=tmp_path / "ckpt",
                      run_test=False)
    import json
    meta = json.loads((sdir / "meta.json").read_text())
    assert meta["last"]["epoch"] == 2
