"""Full-size BiomedCLIP conversion golden test.

Builds an exactly-shaped reproduction of the open_clip BiomedCLIP
checkpoint (timm ViT-B/16 trunk under ``visual.trunk.``, HF PubMedBERT
under ``text.transformer.``, MLP text proj, logit_scale — reference:
src/mamba_clip/model.py:1266-1281), randomly initialized, runs the TORCH
reference forward (real ``transformers.BertModel`` for text; a faithful
timm-semantics ViT written in torch for vision), converts the state dict
with tools/convert_weights.py, loads it through
``checkpoint.load_torch_clip``, and asserts our Flax towers reproduce the
torch features within 1e-3.

This is the proof that a user can convert the real BiomedCLIP weights and
get the reference model's numerics on TPU.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_weights import convert_open_clip  # noqa: E402

WIDTH, DEPTH, HEADS, EMBED = 768, 12, 12, 512
PATCH, IMG = 16, 224
VOCAB, CTX, MAX_POS = 30522, 256, 512


class TimmBlock(torch.nn.Module):
    """timm vision_transformer.Block semantics (pre-LN, fused qkv,
    exact GELU, LN eps 1e-6)."""

    def __init__(self):
        super().__init__()
        d = WIDTH
        self.norm1 = torch.nn.LayerNorm(d, eps=1e-6)
        self.attn = torch.nn.Module()
        self.attn.qkv = torch.nn.Linear(d, 3 * d)
        self.attn.proj = torch.nn.Linear(d, d)
        self.norm2 = torch.nn.LayerNorm(d, eps=1e-6)
        self.mlp = torch.nn.Module()
        self.mlp.fc1 = torch.nn.Linear(d, 4 * d)
        self.mlp.fc2 = torch.nn.Linear(4 * d, d)

    def forward(self, x):
        B, N, d = x.shape
        h, hd = HEADS, d // HEADS
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(B, N, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        a = (q @ k.transpose(-2, -1)) * hd ** -0.5
        a = a.softmax(dim=-1)
        y = (a @ v).transpose(1, 2).reshape(B, N, d)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class TimmViT(torch.nn.Module):
    """timm vit_base_patch16_224 forward (class-token pooling), as wrapped
    by open_clip.TimmModel for BiomedCLIP's visual tower."""

    def __init__(self):
        super().__init__()
        self.patch_embed = torch.nn.Module()
        self.patch_embed.proj = torch.nn.Conv2d(3, WIDTH, PATCH, PATCH)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, WIDTH) * 0.02)
        n = (IMG // PATCH) ** 2
        self.pos_embed = torch.nn.Parameter(torch.randn(1, n + 1, WIDTH) * 0.02)
        self.blocks = torch.nn.ModuleList([TimmBlock() for _ in range(DEPTH)])
        self.norm = torch.nn.LayerNorm(WIDTH, eps=1e-6)

    def forward(self, x):  # x: (B, 3, H, W)
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]


@pytest.fixture(scope="module")
def towers():
    torch.manual_seed(0)
    vit = TimmViT().eval()
    # open_clip TimmModel head: Linear(width, embed_dim, bias=False)
    vhead = torch.nn.Linear(WIDTH, EMBED, bias=False).eval()
    cfg = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=WIDTH, num_hidden_layers=DEPTH,
        num_attention_heads=HEADS, intermediate_size=4 * WIDTH,
        max_position_embeddings=MAX_POS, type_vocab_size=2,
        hidden_act="gelu", layer_norm_eps=1e-12,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    bert = transformers.BertModel(cfg, add_pooling_layer=False).eval()
    # open_clip HFTextEncoder proj='mlp': Linear -> GELU -> Linear(no bias)
    tproj = torch.nn.Sequential(
        torch.nn.Linear(WIDTH, (WIDTH + EMBED) // 2),
        torch.nn.GELU(),
        torch.nn.Linear((WIDTH + EMBED) // 2, EMBED, bias=False),
    ).eval()
    return vit, vhead, bert, tproj


@pytest.fixture(scope="module")
def converted(towers, tmp_path_factory):
    vit, vhead, bert, tproj = towers
    sd = {}
    sd.update({f"visual.trunk.{k}": v for k, v in vit.state_dict().items()})
    sd["visual.head.proj.weight"] = vhead.weight.detach()
    sd.update({f"text.transformer.{k}": v for k, v in bert.state_dict().items()})
    sd["text.proj.0.weight"] = tproj[0].weight.detach()
    sd["text.proj.0.bias"] = tproj[0].bias.detach()
    sd["text.proj.2.weight"] = tproj[2].weight.detach()
    sd["logit_scale"] = torch.tensor(np.log(1 / 0.07), dtype=torch.float32)
    flat = convert_open_clip(sd)
    path = str(tmp_path_factory.mktemp("conv") / "biomedclip.npz")
    np.savez(path, **flat)
    return path


def test_full_conversion_roundtrip_matches_torch(towers, converted):
    import jax
    import jax.numpy as jnp

    from mamba_clip_tpu.checkpoint import load_torch_clip
    from mamba_clip_tpu.models import build_clip

    vit, vhead, bert, tproj = towers
    model = build_clip("biomedclip", image_size=IMG)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, image=jnp.zeros((1, IMG, IMG, 3)),
        text=jnp.zeros((1, CTX), jnp.int32),
    )
    params = load_torch_clip(converted, variables["params"], strict=True)

    r = np.random.default_rng(0)
    img = r.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    ids = np.zeros((2, CTX), np.int64)
    lens = [37, 256]
    for i, L in enumerate(lens):
        ids[i, 0] = 2
        ids[i, 1: L - 1] = r.integers(10, VOCAB, L - 2)
        ids[i, L - 1] = 3

    with torch.no_grad():
        t_img = vhead(vit(torch.tensor(img).permute(0, 3, 1, 2)))
        mask = torch.tensor((ids != 0).astype(np.int64))
        hidden = bert(input_ids=torch.tensor(ids),
                      attention_mask=mask).last_hidden_state
        t_txt = tproj(hidden[:, 0])
        t_img = torch.nn.functional.normalize(t_img, dim=-1).numpy()
        t_txt = torch.nn.functional.normalize(t_txt, dim=-1).numpy()

    out = jax.jit(
        lambda p, i, t: model.apply({"params": p}, image=i, text=t,
                                    deterministic=True)
    )(params, jnp.asarray(img), jnp.asarray(ids.astype(np.int32)))
    j_img = np.asarray(out["image_features"])
    j_txt = np.asarray(out["text_features"])

    assert np.max(np.abs(j_img - t_img)) < 1e-3, (
        f"image features diverge: {np.max(np.abs(j_img - t_img))}")
    assert np.max(np.abs(j_txt - t_txt)) < 1e-3, (
        f"text features diverge: {np.max(np.abs(j_txt - t_txt))}")
    assert np.isclose(float(out["logit_scale"]), 1 / 0.07, rtol=1e-5)
