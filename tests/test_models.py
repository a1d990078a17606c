# Model architecture tests. Full-size registry variants are shape-checked via
# jax.eval_shape (no compilation); small configurations run real forwards.
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spcct_tpu.config import NUM_CLASSES
from spcct_tpu.models.recipes import VARIANT_NAMES, get_recipe, registry
from spcct_tpu.models.spff import FourierGate3D, UNet3DSpectralCore, sinusoidal_pe


def test_registry_has_all_ten_variants_in_reference_order():
    # reference config.py:271-476 registration order
    assert VARIANT_NAMES == [
        "3DUNet", "UNETR", "R2UNet3D", "SwinUNETR", "ResUNet++",
        "SPFF-UNet", "E_SP_UNet", "FG_SP_UNet", "SP_UNet", "PlainCore_UNet",
    ]
    assert set(registry().keys()) == set(VARIANT_NAMES)


@pytest.mark.parametrize("name", VARIANT_NAMES)
def test_variant_forward_shape_abstract(name):
    """init + forward via eval_shape: checks wiring of every registered
    variant (incl. pad/resize wrappers) without compiling convs."""
    recipe = get_recipe(name)
    hw = 32
    x = jnp.zeros((1, 5, hw, hw, 1), jnp.float32)
    variables = jax.eval_shape(
        lambda: recipe.init(jax.random.PRNGKey(0), x))
    forward = recipe.wrap_forward(recipe.module.apply)
    out = jax.eval_shape(lambda v: forward(v, x, train=False)[0], variables)
    assert out.shape == (1, 5, hw, hw, NUM_CLASSES)
    assert out.dtype == jnp.float32


def test_spff_param_structure_and_gates():
    m = UNet3DSpectralCore(num_classes=13, base=8, ksd=3, use_se=True,
                           use_specse=True, use_efilm=True, use_fouriergate=True)
    x = jnp.zeros((1, 5, 16, 16, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    params = v["params"]
    # gated blocks exist at every stage; FourierGate mask is static (F//2+1,)
    assert "enc1" in params and "bott" in params and "dec1" in params
    fg = params["enc1"]["FourierGate3D_0"]
    assert fg["freq_mask"].shape == (5 // 2 + 1,)
    assert fg["mag_scale"].shape == (1,)
    # SE blocks present when enabled
    assert "se0" in params
    y = m.apply(v, x)
    assert y.shape == (1, 5, 16, 16, 13)


def test_fouriergate_identity_at_init_is_sigmoid_of_mean():
    """With mask=1 and scale=1 the gate passes rfft→irfft unchanged, so the
    gate weight equals sigmoid(spectral mean) — checks the FFT path."""
    m = FourierGate3D(num_frames=5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 4, 4, 3)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    s = np.asarray(x).mean(axis=(2, 3, 4))
    w = 1.0 / (1.0 + np.exp(-s))
    want = np.asarray(x) * w[:, :, None, None, None]
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)


def test_sinusoidal_pe_matches_reference_shape():
    pe = sinusoidal_pe(5, 16)
    assert pe.shape == (16, 5)
    # first row is sin(pos * 1)
    np.testing.assert_allclose(pe[0], np.sin(np.arange(5)), atol=1e-6)


def test_depth_preservation_spff():
    """Spectral axis is never downsampled (reference models.py:658-673)."""
    m = UNet3DSpectralCore(num_classes=4, base=4, ksd=3)
    for F in (3, 5, 7):
        x = jnp.zeros((1, F, 16, 16, 1))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape[1] == F


def test_swin_window_partition_roundtrip():
    from spcct_tpu.models.swin_unetr import window_partition, window_reverse
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 4, 3)),
                    jnp.float32)
    w = (2, 2, 2)
    wins = window_partition(x, w)
    assert wins.shape == (2 * 8, 8, 3)
    back = window_reverse(wins, w, (2, 4, 4, 4))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_swin_rel_pos_index_range():
    from spcct_tpu.models.swin_unetr import _rel_pos_index
    w = (2, 3, 3)
    idx = _rel_pos_index(w)
    n = w[0] * w[1] * w[2]
    assert idx.shape == (n, n)
    assert idx.min() >= 0
    assert idx.max() < (2 * w[0] - 1) * (2 * w[1] - 1) * (2 * w[2] - 1)
    assert np.all(np.diag(idx) == idx[0, 0])  # zero-offset index is constant


def test_skip_join_channel_gate(monkeypatch):
    """skip_join: tuple (virtual concat) only when the smaller side is
    <= SPCCT_VCAT_MAXC channels (the Swin memory-rescue region); larger
    joins get a real concatenate (measured 11% step cost of virtual
    concat at SPFF's channel counts — BASELINE.md round-3 bisect)."""
    import jax.numpy as jnp
    from spcct_tpu.models.layers import skip_join

    small = jnp.zeros((1, 2, 4, 4, 12))
    big = jnp.zeros((1, 2, 4, 4, 32))
    assert isinstance(skip_join(small, small), tuple)
    j = skip_join(big, big)
    assert not isinstance(j, tuple) and j.shape[-1] == 64
    # mixed: gate keys on the smaller side
    assert isinstance(skip_join(big, small), tuple)
    monkeypatch.setenv("SPCCT_REAL_CONCAT", "1")
    assert not isinstance(skip_join(small, small), tuple)
    monkeypatch.delenv("SPCCT_REAL_CONCAT")
    monkeypatch.setenv("SPCCT_VCAT_MAXC", "64")
    assert isinstance(skip_join(big, big), tuple)


def test_level_remat_decoder_is_math_identical():
    """level_remat=True regroups the decoder into per-level remat cells
    (spff._DecStage) — the parameter tree nests differently but the math
    must be identical. Map the trees and compare logits and grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.core import freeze, unfreeze

    from spcct_tpu.models.spff import UNet3DSpectralCore

    kw = dict(num_classes=13, base=4, ksd=3, use_se=True, use_specse=True,
              block_remat=True, logits_f32=False, vcat_skips=True)
    m0 = UNet3DSpectralCore(**kw)
    m1 = UNet3DSpectralCore(**kw, level_remat=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 5, 16, 16, 1)).astype(np.float32))
    p0 = m0.init(jax.random.PRNGKey(0), x, train=False)["params"]
    p1 = unfreeze(m1.init(jax.random.PRNGKey(1), x, train=False)["params"])

    p0u = unfreeze(p0)
    for lvl, stage in ((3, "stage3"), (2, "stage2"), (1, "stage1")):
        p1[stage]["up"] = p0u[f"up{lvl}"]
        p1[stage]["dec"] = p0u[f"dec{lvl}"]
    for k in p1:
        if not k.startswith("stage"):
            p1[k] = p0u[k]

    y0 = m0.apply({"params": p0}, x, train=False)
    y1 = m1.apply({"params": freeze(p1)}, x, train=False)
    np.testing.assert_allclose(np.asarray(y0, np.float32),
                               np.asarray(y1, np.float32), atol=1e-6)

    def loss0(p):
        return jnp.sum(m0.apply({"params": p}, x, train=True).astype(jnp.float32) ** 2)

    def loss1(p):
        return jnp.sum(m1.apply({"params": p}, x, train=True).astype(jnp.float32) ** 2)

    g0 = jax.grad(loss0)(p0)
    g1 = jax.grad(loss1)(freeze(p1))
    g0u, g1u = unfreeze(g0), unfreeze(g1)
    for lvl, stage in ((3, "stage3"), (2, "stage2"), (1, "stage1")):
        for a, b in (("up", f"up{lvl}"), ("dec", f"dec{lvl}")):
            ga = jax.tree.leaves(g1u[stage][a])
            gb = jax.tree.leaves(g0u[b])
            for la, lb in zip(ga, gb):
                np.testing.assert_allclose(np.asarray(la, np.float32),
                                           np.asarray(lb, np.float32),
                                           atol=5e-3, rtol=5e-3)


def test_sp_unet_level_remat_default_on(monkeypatch):
    """Round-5 AOT A/B (BASELINE.md): decoder-level remat cuts SP_UNet's
    full-res live demand 15.55 -> 14.63 GiB, so it is the default;
    SPCCT_LEVEL_REMAT=0 must restore the old configuration."""
    from spcct_tpu.models import recipes as R

    monkeypatch.delenv("SPCCT_LEVEL_REMAT", raising=False)
    assert R.build_registry()["SP_UNet"].module.level_remat is True
    monkeypatch.setenv("SPCCT_LEVEL_REMAT", "0")
    assert R.build_registry()["SP_UNet"].module.level_remat is False


def test_swin_window_default_is_seven(monkeypatch):
    """Round-5 Phase C (BASELINE.md): 7^3 is both actual-reference-behavior
    parity (the reference's kwarg filter drops its configured 2^3, so
    MONAI's 7^3 default is what the published numbers ran) and the
    matched-budget winner (0.7413 vs 0.6559 test macro dice).
    SPCCT_SWIN_WINDOW=2 must reproduce the configured-intent arm."""
    from spcct_tpu.models import recipes as R

    monkeypatch.delenv("SPCCT_SWIN_WINDOW", raising=False)
    assert R.build_registry()["SwinUNETR"].module.window_size == (7, 7, 7)
    monkeypatch.setenv("SPCCT_SWIN_WINDOW", "2")
    assert R.build_registry()["SwinUNETR"].module.window_size == (2, 2, 2)
