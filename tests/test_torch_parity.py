# Weight-transplant forward-parity tests against the mounted torch reference.
#
# The strongest correctness check available: instantiate the reference's torch
# backbones (/root/reference/innovative3D/models.py), copy their randomly-
# initialized state_dicts into the flax parameter trees (OIDHW -> DHWIO), and
# assert float32 logits agree. Covers UNet3D_SpectralCore (+ novel blocks,
# models.py:647-701/1416-1544), Cicek3DUNet (718-751), R2UNet3D_backbone
# (1151-1176), and ResUNetPP3D_backbone (1309-1361).
#
# Import strategy: only models.py from the reference is loaded. Its siblings
# (config.py mkdirs a hard-coded /home path at import; helpers.py needs
# pydicom/torchvision) are replaced by stub modules carrying just the
# constants/symbols models.py pulls in — the backbones under test never touch
# them. pytorch_lightning / torchmetrics (not installed here) are stubbed the
# same way; the Lightning wrapper classes are defined but never instantiated.
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference/innovative3D"

import os

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


def _stub_module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref():
    """Import /root/reference/innovative3D/models.py in isolation."""
    if "innovative3D.models" in sys.modules:
        return sys.modules["innovative3D.models"]

    class _LightningModule(torch.nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

    pl = _stub_module("pytorch_lightning", LightningModule=_LightningModule,
                      LightningDataModule=object, Trainer=object,
                      seed_everything=lambda *a, **k: None)
    pl.callbacks = _stub_module("pytorch_lightning.callbacks",
                                Callback=object, ModelCheckpoint=object,
                                EarlyStopping=object)
    pl.loggers = _stub_module("pytorch_lightning.loggers", CSVLogger=object)
    _stub_module("torchmetrics", MeanMetric=object)

    pkg = _stub_module("innovative3D")
    pkg.__path__ = [REF]
    # constants models.py imports from innovative3D.config (values: reference
    # config.py:21-33, 232-236)
    _stub_module("innovative3D.config", NUM_CLASSES=13, BEST_LR=1e-4,
                 IGNORE_INDEX=255, LOSS_NAME="ce_plus_macro_dice",
                 FOCAL_ALPHA=0.25, FOCAL_GAMMA=2.0, GRAD_WEIGHT=1.0,
                 NUM_FRAMES=5)
    _stub_module("innovative3D.helpers", per_class_metrics_3d=None,
                 per_class_metrics_2d=None, ce_plus_macro_dice_loss=None,
                 focal_plus_gradient_loss=None, LOSS_REGISTRY={})

    import innovative3D.models as rm
    return rm


# ── torch → flax weight conversion ──────────────────────────
def t2n(t):
    return t.detach().cpu().numpy().astype(np.float32)


def conv_w(w):
    """torch Conv3d (O,I,kD,kH,kW) → flax (kD,kH,kW,I,O)."""
    return t2n(w).transpose(2, 3, 4, 1, 0)


def deconv_w(w):
    """torch ConvTranspose3d (I,O,kD,kH,kW) → flax ConvTranspose
    (kD,kH,kW,I,O) with all spatial dims flipped (flax's conv_transpose does
    not flip the kernel; torch's transposed conv effectively does)."""
    return np.ascontiguousarray(t2n(w).transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1])


def conv3d(mod, bias=None):
    out = {"kernel": conv_w(mod.weight)}
    b = mod.bias if bias is None else bias
    if b is not None:
        out["bias"] = t2n(b)
    return {"Conv_0": out}


def deconv3d(mod):
    return {"ConvTranspose_0": {"kernel": deconv_w(mod.weight), "bias": t2n(mod.bias)}}


def in_affine(mod):
    """InstanceNorm3d(affine) → Norm3d/GroupNorm params."""
    return {"GroupNorm_0": {"scale": t2n(mod.weight), "bias": t2n(mod.bias)}}


def bn_affine(mod):
    return {"BatchNorm_0": {"scale": t2n(mod.weight), "bias": t2n(mod.bias)}}


def bn_stats(mod):
    return {"BatchNorm_0": {"mean": t2n(mod.running_mean), "var": t2n(mod.running_var)}}


def dense_from_conv1d(mod):
    """torch Conv1d(k=1) (O,I,1) → flax Dense {(I,O), (O,)}."""
    return {"kernel": t2n(mod.weight)[:, :, 0].T, "bias": t2n(mod.bias)}


def assert_same_tree(flax_params, built):
    """The transplanted tree must have exactly the init tree's structure."""
    import jax.tree_util as jtu

    want = {jtu.keystr(p): tuple(l.shape) for p, l in
            jtu.tree_leaves_with_path(flax_params)}
    got = {jtu.keystr(p): tuple(np.asarray(l).shape) for p, l in
           jtu.tree_leaves_with_path(built)}
    assert want == got, (
        f"missing={sorted(set(want) - set(got))} "
        f"extra={sorted(set(got) - set(want))} "
        f"shape_mismatch={[k for k in want.keys() & got.keys() if want[k] != got[k]]}"
    )


def _run_both(fm, params, xt, yt, batch_stats=None, atol=2e-4):
    variables = {"params": jax.tree.map(jnp.asarray, params)}
    if batch_stats is not None:
        variables["batch_stats"] = jax.tree.map(jnp.asarray, batch_stats)
    xf = jnp.asarray(xt.numpy()[:, 0][..., None])        # (B,1,D,H,W)→(B,D,H,W,1)
    yf = np.asarray(fm.apply(variables, xf, train=False))
    yt = yt.numpy().transpose(0, 2, 3, 4, 1)             # (B,C,D,H,W)→(B,D,H,W,C)
    np.testing.assert_allclose(yf, yt, atol=atol, rtol=1e-3)


# ── per-block mappers ────────────────────────────────────────
def map_dcs_novel(tb):
    """_DoubleConvSpectral_Novel (pre/body/efilm/fgate) → DoubleConvSpectral."""
    out = {
        "Conv3d_0": conv3d(tb.pre[0]),
        "Norm3d_0": in_affine(tb.pre[1]),
        "Conv3d_1": conv3d(tb.body[0]),
        "Norm3d_1": in_affine(tb.body[1]),
    }
    if not isinstance(tb.efilm, torch.nn.Identity):
        out["EnergyFiLM3D_0"] = {
            "Dense_0": dense_from_conv1d(tb.efilm.mlp[0]),
            "Dense_1": dense_from_conv1d(tb.efilm.mlp[2]),
        }
    if not isinstance(tb.fgate, torch.nn.Identity):
        out["FourierGate3D_0"] = {
            "mag_scale": t2n(tb.fgate.mag_scale),
            "freq_mask": t2n(tb.fgate.freq_mask).reshape(-1),
        }
    return out


def map_dcs_plain(tb):
    return {
        "Conv3d_0": conv3d(tb.b1[0]),
        "Norm3d_0": in_affine(tb.b1[1]),
        "Conv3d_1": conv3d(tb.b2[0]),
        "Norm3d_1": in_affine(tb.b2[1]),
    }


def map_residual_unit(tb):
    """ResidualUnit3D: skip conv (if present) is created first in the flax
    module, shifting the body convs' auto-indices."""
    has_skip = not isinstance(tb.skip, torch.nn.Identity)
    i = 1 if has_skip else 0
    out = {
        f"Conv3d_{i}": conv3d(tb.c1),
        "Norm3d_0": in_affine(tb.n1),
        f"Conv3d_{i + 1}": conv3d(tb.c2),
        "Norm3d_1": in_affine(tb.n2),
    }
    if has_skip:
        out["Conv3d_0"] = conv3d(tb.skip)
    return out


def map_rrcnn(tb):
    return {
        "Conv3d_0": conv3d(tb.inp),
        "RecurrentUnit3D_0": {
            "Conv3d_0": conv3d(tb.ru.conv),
            "Norm3d_0": in_affine(tb.ru.inn),
        },
        "Conv3d_1": conv3d(tb.out),
        "Norm3d_0": in_affine(tb.bn),
    }


def map_se3d(tb):
    return {"Conv3d_0": conv3d(tb.fc[0]), "Conv3d_1": conv3d(tb.fc[2])}


def map_attention_gate(tb):
    """torch AttentionGate (W_x → x_skip path, W_g → g path, psi)."""
    return {"Conv3d_0": conv3d(tb.W_x), "Conv3d_1": conv3d(tb.W_g),
            "Conv3d_2": conv3d(tb.psi)}


def map_aspp(tb):
    out = {f"Conv3d_{i}": conv3d(b) for i, b in enumerate(tb.branches)}
    out[f"Conv3d_{len(tb.branches)}"] = conv3d(tb.proj[0])
    return out


# ── the tests ────────────────────────────────────────────────
@pytest.mark.parametrize("gates", ["novel", "plain"])
def test_spff_core_parity(ref, gates):
    """SPFF-UNet core (reference models.py:647-701 + novel blocks 1416-1544 +
    SE/SpecSE 600-614): full weight transplant, logits must match."""
    from spcct_tpu.models.spff import UNet3DSpectralCore

    novel = gates == "novel"
    torch.manual_seed(0)
    tm = ref.UNet3D_SpectralCore(in_channels=1, num_classes=13, base=8, ksd=3,
                                 use_se=novel, use_specse=novel,
                                 use_skip_gate=not novel)
    if novel:
        tm = ref.upgrade_spct_with_novel_blocks(tm, use_efilm=True,
                                                use_fouriergate=True)
    tm.eval()
    xt = torch.randn(1, 1, 5, 16, 16)
    with torch.no_grad():
        yt = tm(xt)  # also materializes FourierGate's lazy freq_mask

    mapper = map_dcs_novel if novel else map_dcs_plain
    params = {blk: mapper(getattr(tm, blk))
              for blk in ["enc1", "enc2", "enc3", "bott", "dec3", "dec2", "dec1"]}
    if novel:
        for i in range(4):
            params[f"se{i}"] = map_se3d(tm.se[i])
    else:
        for j in (1, 2, 3):
            params[f"g{j}"] = map_attention_gate(getattr(tm, f"g{j}"))
    for j in (1, 2, 3):
        params[f"up{j}"] = deconv3d(getattr(tm, f"up{j}"))
    params["out"] = conv3d(tm.out)

    fm = UNet3DSpectralCore(num_classes=13, base=8, ksd=3,
                            use_se=novel, use_specse=novel,
                            use_skip_gate=not novel,
                            use_efilm=novel, use_fouriergate=novel,
                            dtype=jnp.float32)
    init = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 1)), train=False)
    assert_same_tree(init["params"], params)
    _run_both(fm, params, xt, yt)


def test_cicek_parity(ref):
    """Cicek3DUNet (reference models.py:718-751), BatchNorm running stats
    randomized and transplanted; eval-mode forward must match."""
    from spcct_tpu.models.baselines import Cicek3DUNet

    torch.manual_seed(1)
    tm = ref.Cicek3DUNet(num_classes=13, base=8, use_bn=True)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    tm.eval()
    xt = torch.randn(1, 1, 32, 32, 32)
    with torch.no_grad():
        yt = tm(xt)

    def map_block(tb):
        return ({
            "Conv3d_0": conv3d(tb[0]),
            "Norm3d_0": bn_affine(tb[1]),
            "Conv3d_1": conv3d(tb[3]),
            "Norm3d_1": bn_affine(tb[4]),
        }, {
            "Norm3d_0": bn_stats(tb[1]),
            "Norm3d_1": bn_stats(tb[4]),
        })

    params, stats = {}, {}
    for blk in ["enc1", "enc2", "enc3", "enc4", "bott", "dec4", "dec3", "dec2", "dec1"]:
        params[blk], stats[blk] = map_block(getattr(tm, blk))
    for j in (1, 2, 3, 4):
        params[f"up{j}"] = deconv3d(getattr(tm, f"up{j}"))
    params["out"] = conv3d(tm.out)

    fm = Cicek3DUNet(num_classes=13, base=8, use_bn=True, dtype=jnp.float32)
    init = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1)), train=False)
    assert_same_tree(init["params"], params)
    assert_same_tree(init["batch_stats"], stats)
    _run_both(fm, params, xt, yt, batch_stats=stats)


def test_r2unet_parity(ref):
    """R2UNet3D_backbone (reference models.py:1121-1176) + the Lit head's 1x1
    conv (1189-1193); recurrent units share conv+norm weights across t steps."""
    from spcct_tpu.models.baselines import R2UNet3D

    torch.manual_seed(2)
    tm = ref.R2UNet3D_backbone(in_channels=1, base=8, t=2)
    head = torch.nn.Conv3d(8, 13, 1)
    tm.eval()
    xt = torch.randn(1, 1, 32, 32, 32)
    with torch.no_grad():
        yt = head(tm(xt))

    params = {blk: map_rrcnn(getattr(tm, blk))
              for blk in ["e1", "e2", "e3", "e4", "b", "d4", "d3", "d2", "d1"]}
    for j in (1, 2, 3, 4):
        params[f"up{j}"] = deconv3d(getattr(tm, f"up{j}"))
    params["head"] = conv3d(head)

    fm = R2UNet3D(num_classes=13, base=8, t=2, dtype=jnp.float32)
    init = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1)), train=False)
    assert_same_tree(init["params"], params)
    _run_both(fm, params, xt, yt)


def test_resunetpp_parity(ref):
    """ResUNetPP3D_backbone (reference models.py:1309-1361) + 1x1 head:
    residual units, ASPP bottleneck, SE skips, attention gates — including the
    reference's gate argument order ag(u, se(e)) where the UPSAMPLED feature
    is what gets gated."""
    from spcct_tpu.models.baselines import ResUNetPP3D

    torch.manual_seed(3)
    tm = ref.ResUNetPP3D_backbone(in_channels=1, base=8)
    head = torch.nn.Conv3d(8, 13, 1)
    tm.eval()
    xt = torch.randn(1, 1, 32, 32, 32)
    with torch.no_grad():
        yt = head(tm(xt))

    params = {}
    for blk in ["e1", "e2", "e3", "e4", "d4", "d3", "d2", "d1"]:
        params[blk] = map_residual_unit(getattr(tm, blk))
    params["b_in"] = map_residual_unit(tm.b_aspp_in)
    params["b_aspp"] = map_aspp(tm.b_aspp)
    params["b_out"] = map_residual_unit(tm.b_aspp_out)
    for j in (1, 2, 3, 4):
        params[f"up{j}"] = deconv3d(getattr(tm, f"up{j}"))
        params[f"se{j}"] = map_se3d(getattr(tm, f"se{j}"))
    for j in (2, 3, 4):
        params[f"ag{j}"] = map_attention_gate(getattr(tm, f"ag{j}"))
    params["head"] = conv3d(head)

    fm = ResUNetPP3D(num_classes=13, base=8, dtype=jnp.float32)
    init = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1)), train=False)
    assert_same_tree(init["params"], params)
    _run_both(fm, params, xt, yt)
