"""Weight-converter tests: a synthetic torch-style state dict (timm ViT /
HF BERT key layout) must map onto our Flax param trees with matching
shapes, and the converted ViT patch-embed/qkv must reproduce torch Linear
numerics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import sys, os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_weights import convert_bert, convert_vit  # noqa: E402


def _fake_vit_sd(width=32, heads=2, depth=2, patch=4, grid=4):
    sd = {}
    t = torch.randn
    sd["v.patch_embed.proj.weight"] = t(width, 3, patch, patch)
    sd["v.patch_embed.proj.bias"] = t(width)
    sd["v.cls_token"] = t(1, 1, width)
    sd["v.pos_embed"] = t(1, grid * grid + 1, width)
    for n in range(depth):
        b = f"v.blocks.{n}."
        sd[b + "norm1.weight"] = t(width)
        sd[b + "norm1.bias"] = t(width)
        sd[b + "attn.qkv.weight"] = t(3 * width, width)
        sd[b + "attn.qkv.bias"] = t(3 * width)
        sd[b + "attn.proj.weight"] = t(width, width)
        sd[b + "attn.proj.bias"] = t(width)
        sd[b + "norm2.weight"] = t(width)
        sd[b + "norm2.bias"] = t(width)
        sd[b + "mlp.fc1.weight"] = t(4 * width, width)
        sd[b + "mlp.fc1.bias"] = t(4 * width)
        sd[b + "mlp.fc2.weight"] = t(width, 4 * width)
        sd[b + "mlp.fc2.bias"] = t(width)
    sd["v.norm.weight"] = t(width)
    sd["v.norm.bias"] = t(width)
    return sd


def test_vit_conversion_shapes_match_flax():
    import jax
    import jax.numpy as jnp

    from mamba_clip_tpu.models.vit import VisionTransformer

    width, heads, depth, patch = 32, 2, 2, 4
    model = VisionTransformer(
        image_size=16, patch_size=patch, width=width, depth=depth,
        num_heads=heads, embed_dim=None,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 16, 16, 3))
    )
    flat_flax = {
        "/".join(str(getattr(k, "key", k)) for k in path): x.shape
        for path, x in jax.tree_util.tree_leaves_with_path(variables["params"])
    }
    sd = _fake_vit_sd(width, heads, depth, patch)
    out = convert_vit(sd, "v.", width=width, heads=heads)
    for key, arr in out.items():
        fkey = key.split("visual/", 1)[1]
        assert fkey in flat_flax, f"converted key {fkey} not in flax tree"
        assert tuple(arr.shape) == tuple(flat_flax[fkey]), (
            f"{fkey}: {arr.shape} vs {flat_flax[fkey]}"
        )
    # kernel orientation: Dense(x) == torch Linear(x)
    x = np.random.default_rng(0).normal(size=(5, width)).astype(np.float32)
    tq = sd["v.blocks.0.attn.qkv.weight"]
    tb = sd["v.blocks.0.attn.qkv.bias"]
    want = (torch.tensor(x) @ tq.T + tb).numpy()
    got = x @ out["visual/block0/attn/qkv/kernel"] + out["visual/block0/attn/qkv/bias"]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bert_conversion_shapes_match_flax():
    import jax
    import jax.numpy as jnp

    from mamba_clip_tpu.models.text_bert import TextBert

    width, heads, depth, vocab, ctx = 32, 2, 2, 64, 8
    model = TextBert(
        vocab_size=vocab, context_length=ctx, width=width, depth=depth,
        num_heads=heads, embed_dim=16, proj_type="none",
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, ctx), jnp.int32)
    )
    flat_flax = {
        "/".join(str(getattr(k, "key", k)) for k in path): x.shape
        for path, x in jax.tree_util.tree_leaves_with_path(variables["params"])
    }

    t = torch.randn
    sd = {}
    emb = "tx.embeddings."
    sd[emb + "word_embeddings.weight"] = t(vocab, width)
    sd[emb + "position_embeddings.weight"] = t(ctx, width)
    sd[emb + "token_type_embeddings.weight"] = t(2, width)
    sd[emb + "LayerNorm.weight"] = t(width)
    sd[emb + "LayerNorm.bias"] = t(width)
    for n in range(depth):
        b = f"tx.encoder.layer.{n}."
        for nm in ("query", "key", "value"):
            sd[b + f"attention.self.{nm}.weight"] = t(width, width)
            sd[b + f"attention.self.{nm}.bias"] = t(width)
        sd[b + "attention.output.dense.weight"] = t(width, width)
        sd[b + "attention.output.dense.bias"] = t(width)
        sd[b + "attention.output.LayerNorm.weight"] = t(width)
        sd[b + "attention.output.LayerNorm.bias"] = t(width)
        sd[b + "intermediate.dense.weight"] = t(4 * width, width)
        sd[b + "intermediate.dense.bias"] = t(4 * width)
        sd[b + "output.dense.weight"] = t(width, 4 * width)
        sd[b + "output.dense.bias"] = t(width)
        sd[b + "output.LayerNorm.weight"] = t(width)
        sd[b + "output.LayerNorm.bias"] = t(width)

    out = convert_bert(sd, "tx.", width=width, heads=heads)
    for key, arr in out.items():
        fkey = key.split("text/", 1)[1]
        assert fkey in flat_flax, f"converted key {fkey} not in flax tree"
        assert tuple(arr.shape) == tuple(flat_flax[fkey]), (
            f"{fkey}: {arr.shape} vs {flat_flax[fkey]}"
        )
