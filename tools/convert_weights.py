#!/usr/bin/env python
"""PyTorch → JAX weight converter for BiomedCLIP-style checkpoints.

The reference downloads ``microsoft/BiomedCLIP-PubMedBERT_256-vit_base_
patch16_224`` from the HF hub via open_clip (reference:
src/mamba_clip/model.py:1266-1281). For parity runs, this tool maps an
open_clip/HF state_dict (torch, CPU) onto our Flax parameter tree and
writes a flat .npz consumed by ``checkpoint.load_torch_clip``:

  python tools/convert_weights.py --torch-ckpt open_clip_pytorch_model.bin \
      --out biomedclip_jax.npz

Mapping notes (torch → flax):
- Linear:   weight (out,in)    → kernel (in,out)   [transpose]
- Conv2d:   weight (O,I,kh,kw) → kernel (kh,kw,I,O)
- LayerNorm weight/bias        → scale/bias
- Embedding weight             → embedding
- timm ViT blocks.N.attn.qkv   → split into flax MHA query/key/value
  (num_heads, head_dim) kernels; attn.proj → out kernel.
- HF BERT encoder.layer.N.attention.self.{query,key,value} → MHA q/k/v;
  attention.output.dense → out; intermediate.dense → fc1; output.dense → fc2;
  LayerNorms → ln_attn / ln_mlp; embeddings.{word,position,token_type}
  → tok_emb/pos_emb/type_emb; embeddings.LayerNorm → ln_emb.

Keys in the flat npz are '/'-joined flax paths, e.g.
``visual/block0/attn/query/kernel``.
"""

from __future__ import annotations

import argparse
import re
from typing import Dict

import numpy as np


def _t(x):
    return np.asarray(x.detach().cpu().numpy(), np.float32)


def convert_vit(sd: Dict, prefix: str, width: int = 768, heads: int = 12):
    """timm ViT-B/16 state dict → flax VisionTransformer params.

    Our patch embed is a Dense over (p, p, C)-flattened patches; the conv
    kernel (O, I, kh, kw) reshapes to (kh*kw*I, O). Our attention uses a
    fused qkv Dense, which maps 1:1 from timm's fused qkv."""
    out = {}
    pe = _t(sd[f"{prefix}patch_embed.proj.weight"])
    width = pe.shape[0]  # infer; the 768 default only documents ViT-B
    out["visual/patch_embed/kernel"] = (
        pe.transpose(2, 3, 1, 0).reshape(-1, width)
    )
    out["visual/patch_embed/bias"] = _t(sd[f"{prefix}patch_embed.proj.bias"])
    out["visual/cls_token"] = _t(sd[f"{prefix}cls_token"])
    out["visual/pos_embed"] = _t(sd[f"{prefix}pos_embed"])
    n = 0
    while f"{prefix}blocks.{n}.norm1.weight" in sd:
        b = f"{prefix}blocks.{n}."
        o = f"visual/block{n}/"
        out[o + "norm1/scale"] = _t(sd[b + "norm1.weight"])
        out[o + "norm1/bias"] = _t(sd[b + "norm1.bias"])
        out[o + "attn/qkv/kernel"] = _t(sd[b + "attn.qkv.weight"]).T
        out[o + "attn/qkv/bias"] = _t(sd[b + "attn.qkv.bias"])
        out[o + "attn/out/kernel"] = _t(sd[b + "attn.proj.weight"]).T
        out[o + "attn/out/bias"] = _t(sd[b + "attn.proj.bias"])
        out[o + "norm2/scale"] = _t(sd[b + "norm2.weight"])
        out[o + "norm2/bias"] = _t(sd[b + "norm2.bias"])
        out[o + "mlp/fc1/kernel"] = _t(sd[b + "mlp.fc1.weight"]).T
        out[o + "mlp/fc1/bias"] = _t(sd[b + "mlp.fc1.bias"])
        out[o + "mlp/fc2/kernel"] = _t(sd[b + "mlp.fc2.weight"]).T
        out[o + "mlp/fc2/bias"] = _t(sd[b + "mlp.fc2.bias"])
        n += 1
    out["visual/norm/scale"] = _t(sd[f"{prefix}norm.weight"])
    out["visual/norm/bias"] = _t(sd[f"{prefix}norm.bias"])
    # open_clip projection head (trunk head or separate proj)
    for k in (f"{prefix}head.weight", "visual.head.proj.weight"):
        if k in sd:
            out["visual/proj/kernel"] = _t(sd[k]).T
    return out


def convert_bert(sd: Dict, prefix: str, width: int = 768, heads: int = 12):
    """HF BERT encoder → flax TextBert params."""
    hd = width // heads
    out = {}
    emb = f"{prefix}embeddings."
    out["text/tok_emb/embedding"] = _t(sd[emb + "word_embeddings.weight"])
    out["text/pos_emb"] = _t(sd[emb + "position_embeddings.weight"])[None]
    out["text/type_emb"] = _t(sd[emb + "token_type_embeddings.weight"])[None, :1]
    out["text/ln_emb/scale"] = _t(sd[emb + "LayerNorm.weight"])
    out["text/ln_emb/bias"] = _t(sd[emb + "LayerNorm.bias"])
    n = 0
    while f"{prefix}encoder.layer.{n}.attention.self.query.weight" in sd:
        b = f"{prefix}encoder.layer.{n}."
        o = f"text/block{n}/"
        qkv_w = np.concatenate(
            [_t(sd[b + f"attention.self.{nm}.weight"]).T
             for nm in ("query", "key", "value")], axis=1,
        )
        qkv_b = np.concatenate(
            [_t(sd[b + f"attention.self.{nm}.bias"])
             for nm in ("query", "key", "value")], axis=0,
        )
        out[o + "attn/qkv/kernel"] = qkv_w
        out[o + "attn/qkv/bias"] = qkv_b
        out[o + "attn/out/kernel"] = _t(sd[b + "attention.output.dense.weight"]).T
        out[o + "attn/out/bias"] = _t(sd[b + "attention.output.dense.bias"])
        out[o + "ln_attn/scale"] = _t(sd[b + "attention.output.LayerNorm.weight"])
        out[o + "ln_attn/bias"] = _t(sd[b + "attention.output.LayerNorm.bias"])
        out[o + "fc1/kernel"] = _t(sd[b + "intermediate.dense.weight"]).T
        out[o + "fc1/bias"] = _t(sd[b + "intermediate.dense.bias"])
        out[o + "fc2/kernel"] = _t(sd[b + "output.dense.weight"]).T
        out[o + "fc2/bias"] = _t(sd[b + "output.dense.bias"])
        out[o + "ln_mlp/scale"] = _t(sd[b + "output.LayerNorm.weight"])
        out[o + "ln_mlp/bias"] = _t(sd[b + "output.LayerNorm.bias"])
        n += 1
    return out


def convert_open_clip(sd: Dict) -> Dict[str, np.ndarray]:
    out = {}
    # strip common wrappers
    sd = { re.sub(r"^(module\.|model\.)", "", k): v for k, v in sd.items() }
    vis_prefix = "visual.trunk." if any(
        k.startswith("visual.trunk.") for k in sd
    ) else "visual."
    out.update(convert_vit(sd, vis_prefix))
    txt_prefix = None
    for cand in ("text.transformer.", "transformer."):
        if any(k.startswith(cand + "embeddings.") for k in sd):
            txt_prefix = cand
            break
    if txt_prefix:
        out.update(convert_bert(sd, txt_prefix))
    # text projection (open_clip proj: Linear or MLP)
    if "text.proj.weight" in sd:
        out["text/proj/kernel"] = _t(sd["text.proj.weight"]).T
    if "text.proj.0.weight" in sd:  # MLP proj
        out["text/proj_fc1/kernel"] = _t(sd["text.proj.0.weight"]).T
        out["text/proj_fc1/bias"] = _t(sd["text.proj.0.bias"])
        out["text/proj_fc2/kernel"] = _t(sd["text.proj.2.weight"]).T
    if "logit_scale" in sd:
        out["logit_scale"] = _t(sd["logit_scale"]).reshape(())
    if "logit_bias" in sd:
        out["logit_bias"] = _t(sd["logit_bias"]).reshape(())
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    import torch

    sd = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    flat = convert_open_clip(sd)
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} tensors to {args.out}")


if __name__ == "__main__":
    main()
