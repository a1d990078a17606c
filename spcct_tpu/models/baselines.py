# baselines.py — conv baselines: Cicek 3D U-Net, R2U-Net 3D, ResUNet++ 3D.
#
# TPU-native rebuilds of reference innovative3D/models.py:718-751 (Cicek),
# 1151-1176 (R2UNet3D_backbone), 1309-1361 (ResUNetPP3D_backbone).
# Channels-last (B, D, H, W, C); isotropic (2,2,2) pooling — these baselines
# DO downsample the spectral axis, which is why their Lightning recipes pad or
# depth-resize the 5-frame input first (handled by the recipe wrappers in
# recipes.py, mirroring models.py:773-777, 1199-1204, 1381-1386).
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    ASPP3D,
    AttentionGate,
    Conv3d,
    ConvTranspose3d,
    Norm3d,
    RRCNNBlock3D,
    ResidualUnit3D,
    SE3D,
    max_pool_3d,
    skip_join,
)

Dtype = Any


class CicekBlock(nn.Module):
    """(conv-BN-relu) x2, bias only when BN is off (reference models.py:722-726)."""
    features: int
    use_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = Conv3d(self.features, use_bias=not self.use_bn, dtype=self.dtype)(x)
            if self.use_bn:
                x = Norm3d("batch", dtype=self.dtype)(x, train=train)
            x = nn.relu(x)
        return x


class Cicek3DUNet(nn.Module):
    """Isotropic 4-level 3D U-Net (Çiçek et al.), base 32, BN
    (reference models.py:718-751).

    block_remat: per-block gradient checkpointing — whole-model remat still
    needs 16.8 GB of temporaries at the depth-16 full-resolution config
    (measured via XLA memory_analysis) vs 15.75 GB HBM; checkpointing each
    CicekBlock keeps one level's activations live at a time."""
    num_classes: int
    base: int = 32
    use_bn: bool = True
    block_remat: bool = False
    # logits_f32=False defers the f32 upcast to the recipe wrapper (after the
    # depth16 resize back to 5 frames): the f32 logits at padded depth
    # (1,16,512,512,13) are 218 MB of pure temp vs 109 MB in bf16 — same
    # trick as UNet3DSpectralCore.logits_f32 (spff.py:169-172)
    logits_f32: bool = True
    # keep virtual-concat joins at every channel count (the depth16
    # full-resolution step sits ~1.7 GB under HBM; real concats at the
    # 32-256ch joins would add back hundreds of MB of temps)
    vcat_skips: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base
        P = (2, 2, 2)
        cls = (nn.remat(CicekBlock, static_argnums=(2,))
               if self.block_remat else CicekBlock)
        blk = lambda c, name: cls(c, self.use_bn, name=name, dtype=self.dtype)
        e1 = blk(f, "enc1")(x, train)
        e2 = blk(2 * f, "enc2")(max_pool_3d(e1, P), train)
        e3 = blk(4 * f, "enc3")(max_pool_3d(e2, P), train)
        e4 = blk(8 * f, "enc4")(max_pool_3d(e3, P), train)
        b = blk(16 * f, "bott")(max_pool_3d(e4, P), train)
        d4 = blk(8 * f, "dec4")(
            skip_join(ConvTranspose3d(8 * f, name="up4", dtype=self.dtype)(b), e4, prefer=self.vcat_skips), train)
        d3 = blk(4 * f, "dec3")(
            skip_join(ConvTranspose3d(4 * f, name="up3", dtype=self.dtype)(d4), e3, prefer=self.vcat_skips), train)
        d2 = blk(2 * f, "dec2")(
            skip_join(ConvTranspose3d(2 * f, name="up2", dtype=self.dtype)(d3), e2, prefer=self.vcat_skips), train)
        d1 = blk(f, "dec1")(
            skip_join(ConvTranspose3d(f, name="up1", dtype=self.dtype)(d2), e1, prefer=self.vcat_skips), train)
        out = Conv3d(self.num_classes, (1, 1, 1), name="out", dtype=self.dtype)(d1)
        return out.astype(jnp.float32) if self.logits_f32 else out


class R2UNet3D(nn.Module):
    """Residual-recurrent U-Net 3D, base 16, t=2, + 1x1 head
    (reference models.py:1151-1204: backbone + LitR2UNet3D head)."""
    num_classes: int
    base: int = 16
    t: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = [self.base * m for m in (1, 2, 4, 8, 16)]
        P = (2, 2, 2)
        rr = lambda ch, name: RRCNNBlock3D(ch, self.t, name=name, dtype=self.dtype)
        e1 = rr(c[0], "e1")(x)
        e2 = rr(c[1], "e2")(max_pool_3d(e1, P))
        e3 = rr(c[2], "e3")(max_pool_3d(e2, P))
        e4 = rr(c[3], "e4")(max_pool_3d(e3, P))
        b = rr(c[4], "b")(max_pool_3d(e4, P))
        d4 = rr(c[3], "d4")(skip_join(
            ConvTranspose3d(c[3], name="up4", dtype=self.dtype)(b), e4))
        d3 = rr(c[2], "d3")(skip_join(
            ConvTranspose3d(c[2], name="up3", dtype=self.dtype)(d4), e3))
        d2 = rr(c[1], "d2")(skip_join(
            ConvTranspose3d(c[1], name="up2", dtype=self.dtype)(d3), e2))
        d1 = rr(c[0], "d1")(skip_join(
            ConvTranspose3d(c[0], name="up1", dtype=self.dtype)(d2), e1))
        out = Conv3d(self.num_classes, (1, 1, 1), name="head", dtype=self.dtype)(d1)
        return out.astype(jnp.float32)


class ResUNetPP3D(nn.Module):
    """ResUNet++: residual encoder, ASPP bottleneck, SE skips, attention-gated
    decoder, + 1x1 head (reference models.py:1309-1386)."""
    num_classes: int
    base: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = [self.base * m for m in (1, 2, 4, 8, 16)]
        P = (2, 2, 2)
        ru = lambda ch, name: ResidualUnit3D(ch, name=name, dtype=self.dtype)
        e1 = ru(c[0], "e1")(x)
        e2 = ru(c[1], "e2")(max_pool_3d(e1, P))
        e3 = ru(c[2], "e3")(max_pool_3d(e2, P))
        e4 = ru(c[3], "e4")(max_pool_3d(e3, P))

        b = ru(c[4], "b_in")(max_pool_3d(e4, P))
        b = ASPP3D(c[4], name="b_aspp", dtype=self.dtype)(b)
        b = ru(c[4], "b_out")(b)

        # Attention-gate argument order matches the reference exactly: the
        # call is ag4(u4, se4(e4)) with AttentionGate.forward(x_skip, g)
        # (models.py:637-645, 1352-1355) — so the UPSAMPLED feature u is what
        # gets gated (and concatenated with itself); the SE'd encoder feature
        # only drives the gate.
        u4 = ConvTranspose3d(c[3], name="up4", dtype=self.dtype)(b)
        s4 = AttentionGate(c[3] // 2, name="ag4", dtype=self.dtype)(
            u4, SE3D(name="se4", dtype=self.dtype)(e4))
        d4 = ru(c[3], "d4")(skip_join(u4, s4))

        u3 = ConvTranspose3d(c[2], name="up3", dtype=self.dtype)(d4)
        s3 = AttentionGate(c[2] // 2, name="ag3", dtype=self.dtype)(
            u3, SE3D(name="se3", dtype=self.dtype)(e3))
        d3 = ru(c[2], "d3")(skip_join(u3, s3))

        u2 = ConvTranspose3d(c[1], name="up2", dtype=self.dtype)(d3)
        s2 = AttentionGate(c[1] // 2, name="ag2", dtype=self.dtype)(
            u2, SE3D(name="se2", dtype=self.dtype)(e2))
        d2 = ru(c[1], "d2")(skip_join(u2, s2))

        u1 = ConvTranspose3d(c[0], name="up1", dtype=self.dtype)(d2)
        s1 = SE3D(name="se1", dtype=self.dtype)(e1)
        d1 = ru(c[0], "d1")(skip_join(u1, s1))

        out = Conv3d(self.num_classes, (1, 1, 1), name="head", dtype=self.dtype)(d1)
        return out.astype(jnp.float32)
