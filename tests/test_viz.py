# Viz callback smoke test on CPU with a tiny model + synthetic datamodule.
import numpy as np

import jax


def test_viz_epoch_writes_panels(tmp_path):
    from spcct_tpu.config import trainval_sets
    from spcct_tpu.data.pipeline import SpcctDataModule3D
    from spcct_tpu.models.recipes import Recipe, _base_lit_loss
    from spcct_tpu.models.spff import UNet3DSpectralCore
    from spcct_tpu.analysis.viz import viz_epoch
    import jax.numpy as jnp

    recipe = Recipe(name="tiny",
                    module=UNet3DSpectralCore(num_classes=13, base=2, ksd=1),
                    loss=_base_lit_loss, opt_kind="adam", lr=1e-3)
    dm = SpcctDataModule3D(trainval_sets[:1], batch_size=1, num_frames=5)
    dm.setup("fit")
    x = jnp.zeros((1, 5) + dm.train_set.images[0].shape[-2:] + (1,), jnp.float32)
    variables = recipe.init(jax.random.PRNGKey(0), x)
    tree = {"params": variables["params"], "batch_stats": None}
    viz_epoch(recipe, tree, dm, epoch=0, out_root=tmp_path)
    out = tmp_path / "viz"
    assert (out / "val_epoch000_overlay.png").exists()
    assert (out / "val_epoch000_frames.png").exists()
    assert (out / "val_epoch000_softmax.png").exists()
    assert (out / "train_epoch000_compare.png").exists()
