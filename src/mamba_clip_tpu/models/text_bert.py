"""BERT-style text tower (PubMedBERT shape) in Flax.

From-scratch TPU implementation of the text tower the reference pulls in
via open_clip's HF adapter (PubMedBERT inside BiomedCLIP, reference:
src/mamba_clip/model.py:1266-1281; LiT layer-freezing walks its
``embeddings`` + ``encoder.layer`` structure, model.py:1072-1097).

Structure (BERT-base): word + position + token-type embeddings → embed LN →
12 post-LN transformer blocks (attention → add&LN → GELU MLP → add&LN) →
CLS pooling → projection (MLP, as in BiomedCLIP's ``proj": "mlp"`` config,
or linear) to the CLIP embedding dim. Context length 256
(reference: model.py:1007 exposes context_length).

Attention masking uses an additive -inf bias built from the padding mask;
shapes are static (B, context_len) so everything jits cleanly.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .vit import FusedAttention

Dtype = Any


class BertBlock(nn.Module):
    """Post-LN transformer block (BERT style)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    gelu_approx: bool = False
    dot_general_cls: Any = None  # AQT int8 injection (ops/quant.py)
    attn_remat: bool = False
    attn_int8: bool = False
    attn_int8_delayed: bool = False
    attn_flash: bool = False

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        d = x.shape[-1]
        kw = (
            {"dot_general_cls": self.dot_general_cls}
            if self.dot_general_cls is not None else {}
        )
        y = FusedAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dot_general_cls=self.dot_general_cls,
            remat_probs=self.attn_remat, int8_interior=self.attn_int8,
            int8_delayed_interior=self.attn_int8_delayed,
            flash_interior=self.attn_flash,
            name="attn",
        )(x, pad_mask=mask)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ln_attn")(
            x + y
        ).astype(self.dtype)
        y = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype, name="fc1",
                     **kw)(x)
        # no jax.checkpoint here — measured slower (see vit.py MlpBlock /
        # PERF.md round-3 gelu-remat negative result). gelu_approx: tanh
        # form — exact erf costs more than the fc1 matmul on the VPU and
        # its error is 33x below bf16 rounding (vit.py MlpBlock / PERF.md).
        y = nn.gelu(y, approximate=self.gelu_approx)
        y = nn.Dense(d, dtype=self.dtype, name="fc2", **kw)(y)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ln_mlp")(
            x + y
        ).astype(self.dtype)


class TextBert(nn.Module):
    """BERT encoder with CLS pooling + projection."""

    vocab_size: int = 30522
    context_length: int = 256
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    embed_dim: int = 512
    proj_type: str = "mlp"  # "mlp" (BiomedCLIP) | "linear" | "none"
    pad_id: int = 0
    grad_checkpointing: bool = False
    dtype: Dtype = jnp.float32
    gelu_approx: bool = False
    dot_general_cls: Any = None
    attn_remat: bool = False
    attn_int8: bool = False
    attn_int8_delayed: bool = False
    attn_flash: bool = False

    @property
    def output_dim(self) -> int:
        return self.embed_dim if self.proj_type != "none" else self.width

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True):
        B, L = input_ids.shape
        emb = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02), name="tok_emb",
        )(input_ids)
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02),
            (1, self.context_length, self.width), jnp.float32,
        )
        typ = self.param(
            "type_emb", nn.initializers.normal(0.02), (1, 1, self.width),
            jnp.float32,
        )
        x = emb + pos[:, :L].astype(self.dtype) + typ.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ln_emb")(x).astype(
            self.dtype
        )

        pad_mask = (input_ids != self.pad_id)[:, None, None, :]  # (B,1,1,L)

        block = BertBlock
        if self.grad_checkpointing:
            block = nn.remat(BertBlock, static_argnums=(3,))
        for i in range(self.depth):
            x = block(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                dtype=self.dtype, gelu_approx=self.gelu_approx,
                dot_general_cls=self.dot_general_cls,
                attn_remat=self.attn_remat, attn_int8=self.attn_int8,
                attn_int8_delayed=self.attn_int8_delayed,
                attn_flash=self.attn_flash,
                name=f"block{i}",
            )(x, pad_mask, deterministic)

        cls = x[:, 0].astype(jnp.float32)
        if self.proj_type == "linear":
            cls = nn.Dense(self.embed_dim, use_bias=False, dtype=jnp.float32,
                           name="proj")(cls)
        elif self.proj_type == "mlp":
            h = nn.Dense((self.width + self.embed_dim) // 2, dtype=jnp.float32,
                         name="proj_fc1")(cls)
            h = nn.gelu(h, approximate=False)
            cls = nn.Dense(self.embed_dim, use_bias=False, dtype=jnp.float32,
                           name="proj_fc2")(h)
        return cls
