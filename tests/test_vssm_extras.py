"""VSSM extras: CLIP with a Mamba vision tower (BASELINE config 3), decoder
modules (PatchExpand2D / FinalPatchExpand2D / VSSLayerUp)."""

import jax
import jax.numpy as jnp
import numpy as np

from mamba_clip_tpu.models import VSSM, VssmTower
from mamba_clip_tpu.models.clip import ClipModel
from mamba_clip_tpu.models.text_bert import TextBert
from mamba_clip_tpu.models.vssm import (
    FinalPatchExpand2D,
    PatchExpand2D,
    VSSLayerUp,
)


def test_medmamba_clip_tower(rng):
    """Contrastive CLIP with the VSSM vision tower — the selective scan in
    the stage-1 path (BASELINE config 'Mamba vision tower swapped for ViT')."""
    vssm = VSSM(patch_size=4, num_classes=0, depths=(1, 1), dims=(8, 16),
                d_state=4, scan_impl="xla")
    visual = VssmTower(vssm=vssm, embed_dim=16, name="visual")
    text = TextBert(vocab_size=64, context_length=8, width=16, depth=1,
                    num_heads=2, embed_dim=16, name="text")
    model = ClipModel(visual=visual, text=text)
    img = jax.random.normal(rng, (2, 16, 16, 3))
    tok = jnp.ones((2, 8), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, image=img, text=tok)
    out, _ = model.apply(
        variables, image=img, text=tok, mutable=["batch_stats"],
        deterministic=False, rngs={"dropout": rng},
    )
    assert out["image_features"].shape == (2, 16)
    n = np.linalg.norm(np.asarray(out["image_features"]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)

    # gradient flows through the scan into the SSM params
    def loss(p):
        o = model.apply({"params": p, "batch_stats": variables["batch_stats"]},
                        image=img, text=tok)
        return jnp.sum(o["image_features"] * o["text_features"])

    g = jax.grad(loss)(variables["params"])
    a_log_grads = [
        np.abs(np.asarray(x)).sum()
        for path, x in jax.tree_util.tree_leaves_with_path(g)
        if "A_logs" in jax.tree_util.keystr(path)
    ]
    assert a_log_grads and max(a_log_grads) > 0


def test_patch_expand_shapes(rng):
    x = jax.random.normal(rng, (2, 4, 4, 16))
    m = PatchExpand2D(dim=8)
    v = m.init(rng, x)
    y = m.apply(v, x)
    assert y.shape == (2, 8, 8, 8)

    mf = FinalPatchExpand2D(dim=16, dim_scale=4)
    vf = mf.init(rng, x)
    yf = mf.apply(vf, x)
    assert yf.shape == (2, 16, 16, 4)


def test_vss_layer_up(rng):
    x = jax.random.normal(rng, (1, 4, 4, 16))
    m = VSSLayerUp(dim=8, depth=1, d_state=4, upsample=True, scan_impl="xla")
    v = m.init({"params": rng, "dropout": rng}, x)
    y, _ = m.apply(v, x, mutable=["batch_stats"])
    assert y.shape == (1, 8, 8, 8)
