# Golden-vector oracles for the from-scratch transformer pair.
#
# The reference imports MONAI for UNETR/SwinUNETR (reference
# innovative3D/models.py:864,993); MONAI is not installable in this
# environment (no network), so weight-transplant parity like
# tests/test_torch_parity.py is impossible for these two architectures.
# These tests are the strongest available substitute (VERDICT r2 item 6):
#
#  * hand-derived golden vectors for the two deterministic pure functions
#    that define shifted-window attention semantics — the relative-position
#    index and the shift attention mask (spec: Liu et al. "Swin
#    Transformer" §3.2 / official microsoft/Swin-Transformer
#    `WindowAttention.relative_position_index` + `img_mask` construction,
#    which MONAI's swin_unetr.py compute_mask replicates);
#  * analytic parameter counts for the transformer encoders from the
#    published architecture formulas (ViT-B/16 and Swin), checked exactly
#    against initialized parameter trees.
import numpy as np
import pytest

from spcct_tpu.models.swin_unetr import _rel_pos_index, _shift_attn_mask


# ── relative-position index ──────────────────────────────────────────────
# Hand derivation for window (2,2,2): flattened window coordinates in
# ij-order are i = 4*d + 2*h + w for (d,h,w) in {0,1}^3. The Swin index is
#   idx(i,j) = (dd+1)*(2*2-1)^2 + (dh+1)*(2*2-1) + (dw+1)
#            = 9*(dd+1) + 3*(dh+1) + (dw+1),  d* = coord_i - coord_j,
# e.g. idx(i,i) = 9+3+1 = 13 (center of the 27-entry bias table),
# idx(1,0): delta (0,0,1) -> 9+3+2 = 14.
REL_POS_IDX_2CUBED = np.array([
    [13, 12, 10, 9, 4, 3, 1, 0],
    [14, 13, 11, 10, 5, 4, 2, 1],
    [16, 15, 13, 12, 7, 6, 4, 3],
    [17, 16, 14, 13, 8, 7, 5, 4],
    [22, 21, 19, 18, 13, 12, 10, 9],
    [23, 22, 20, 19, 14, 13, 11, 10],
    [25, 24, 22, 21, 16, 15, 13, 12],
    [26, 25, 23, 22, 17, 16, 14, 13],
], np.int64)


def test_rel_pos_index_golden_2cubed():
    got = _rel_pos_index((2, 2, 2))
    assert got.shape == (8, 8)
    np.testing.assert_array_equal(got, REL_POS_IDX_2CUBED)


def test_rel_pos_index_invariants_7cubed():
    # MONAI's actually-running default window is 7^3 (the reference's
    # configured (2,2,2) is dropped by its kwarg filter). Invariants of the
    # Swin index map at that size: table has (2*7-1)^3 = 2197 entries,
    # diagonal hits the center entry, and mirrored pairs are mirrored
    # around the center: idx(i,j) + idx(j,i) = 2*center.
    w = (7, 7, 7)
    idx = _rel_pos_index(w)
    n = 7 ** 3
    center = 6 * 13 * 13 + 6 * 13 + 6  # (w-1) offsets on each axis = 1098
    assert idx.shape == (n, n)
    assert idx.min() == 0 and idx.max() == 13 ** 3 - 1
    assert (np.diag(idx) == center).all()
    np.testing.assert_array_equal(idx + idx.T, np.full((n, n), 2 * center))
    # every index of the table is used (window covers all displacements)
    assert len(np.unique(idx)) == 13 ** 3


# ── shifted-window attention mask ────────────────────────────────────────
def test_shift_attn_mask_golden_depth_only_shift():
    # dims (4,2,2), window (2,2,2), shift (1,0,0): the official Swin
    # construction paints depth regions [0,2)->r0, [2,3)->r1, [3,4)->r2 on
    # the UNROLLED grid and partitions that (no roll — the region
    # boundaries are chosen so window k's label pattern equals the rolled
    # content's wrap pattern). Window 0 = depth {0,1}, one region -> fully
    # allowed; window 1 = depth {2,3}, regions r1/r2 -> the two depth
    # halves (flattened elements 0-3 vs 4-7) must not attend to each other.
    m = _shift_attn_mask((4, 2, 2), (2, 2, 2), (1, 0, 0))
    assert m.shape == (2, 8, 8)
    np.testing.assert_array_equal(m[0], np.zeros((8, 8), np.float32))
    blocked = np.zeros((8, 8), np.float32)
    blocked[:4, 4:] = -100.0
    blocked[4:, :4] = -100.0
    np.testing.assert_array_equal(m[1], blocked)


def test_shift_attn_mask_golden_two_axis_shift():
    # dims (4,4,2), window (2,2,2), shift (1,1,0). Hand-assigned official
    # region labels per axis: depth [0,2)->0, [2,3)->1, [3,4)->2; same for
    # height; width unsplit. A pair may attend iff BOTH axis labels match.
    ld = np.array([0, 0, 1, 2])  # per-depth region label
    lh = np.array([0, 0, 1, 2])  # per-height region label
    m = _shift_attn_mask((4, 4, 2), (2, 2, 2), (1, 1, 0))
    assert m.shape == (4, 8, 8)  # 2x2x1 windows
    # windows are ordered (d-block, h-block); element order inside a window
    # is (d, h, w) ij-flattened
    for wi, (db, hb) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        cells = [(ld[2 * db + d], lh[2 * hb + h])
                 for d in range(2) for h in range(2) for _ in range(2)]
        exp = np.array([[0.0 if a == b else -100.0 for b in cells]
                        for a in cells], np.float32)
        np.testing.assert_array_equal(m[wi], exp, err_msg=f"window {wi}")


def test_shift_attn_mask_symmetry_and_values():
    m = _shift_attn_mask((8, 8, 8), (4, 4, 4), (2, 2, 2))
    assert set(np.unique(m)).issubset({0.0, -100.0})
    np.testing.assert_array_equal(m, np.transpose(m, (0, 2, 1)))
    # diagonal (self-attention) is never masked
    assert (np.diagonal(m, axis1=1, axis2=2) == 0.0).all()


# ── analytic parameter counts (published architecture formulas) ──────────
def _count(tree):
    import jax
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def test_vit3d_param_count_analytic():
    """ViT-B/16 on 96^3 single-channel input, exactly as the reference's
    UNETR config (hidden 768, mlp 3072, 12 layers, 12 heads — reference
    config.py:316-340). Formula from Dosovitskiy et al. / MONAI ViT with
    conv patch embedding, learned pos-emb, no cls token."""
    import jax
    import jax.numpy as jnp
    from spcct_tpu.models.unetr import ViT3D

    H, L, M, P = 768, 12, 3072, 16
    n_patches = (96 // P) ** 3  # 216
    vit = ViT3D(hidden=H, mlp_dim=M, num_layers=L, num_heads=12, patch_size=P)
    v = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 96, 1)))
    per_block = (
        2 * (2 * H)            # two LayerNorms (scale+bias)
        + H * 3 * H + 3 * H    # qkv dense
        + H * H + H            # output projection
        + H * M + M + M * H + H  # MLP
    )
    expected = (P ** 3 * 1 * H + H) + n_patches * H + L * per_block
    assert _count(v["params"]) == expected


def test_swin_encoder_param_count_analytic():
    """SwinViT3D at the reference's SwinUNETR config (feature 12, depths
    (1,1,1,1), heads (1,2,4,8), window 2^3, mlp ratio 2.0 — reference
    config.py:366-386). Per-stage formula from Liu et al. with a
    (2w-1)^3-entry relative bias table per attention layer."""
    import jax
    import jax.numpy as jnp
    from spcct_tpu.models.swin_unetr import SwinViT3D

    f, heads, table = 12, (1, 2, 4, 8), 27
    enc = SwinViT3D(feature_size=f, depths=(1, 1, 1, 1), num_heads=heads,
                    window=(2, 2, 2), mlp_ratio=2.0)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1)))
    expected = 2 ** 3 * 1 * f + f  # patch embedding conv
    for s, h in enumerate(heads):
        dim, hid = f * 2 ** s, int(f * 2 ** s * 2.0)
        expected += (
            2 * (2 * dim)                  # two LayerNorms
            + dim * 3 * dim + 3 * dim      # qkv
            + table * h                    # relative position bias table
            + dim * dim + dim              # projection
            + dim * hid + hid + hid * dim + dim  # MLP (ratio 2)
        )
        expected += 2 * (8 * dim) + 8 * dim * 2 * dim  # patch merging LN + dense
    assert _count(v["params"]) == expected


@pytest.mark.parametrize("variant,frozen", [("UNETR", 92812781), ("SwinUNETR", 3684862)])
def test_transformer_total_param_regression(variant, frozen):
    """Frozen whole-model parameter counts (encoder + decoder + head) as a
    change detector: MONAI cross-checks are impossible here, so any drift
    in these counts must be an intentional, reviewed architecture change."""
    import jax
    from spcct_tpu.models.recipes import get_recipe
    from spcct_tpu.train.loop import param_count

    recipe = get_recipe(variant)
    import jax.numpy as jnp
    hw = 96 if variant == "UNETR" else 64
    x = jnp.zeros((1, 5, hw, hw, 1))
    variables = recipe.init(jax.random.PRNGKey(0), x)
    assert param_count(variables["params"]) == frozen
