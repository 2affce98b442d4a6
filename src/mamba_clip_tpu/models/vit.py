"""Vision Transformer tower (ViT-B/16) in Flax.

From-scratch TPU implementation of the visual tower the reference pulls in
from timm/open_clip (`microsoft/BiomedCLIP-...vit_base_patch16_224`,
reference: src/mamba_clip/model.py:1266-1281 creates it via
``create_model_from_pretrained``). Structure: conv patchify (16x16 stride
16) → prepend CLS token → learned position embeddings → pre-norm
transformer blocks → final LN → CLS feature → linear projection to the
CLIP embedding dim.

TPU notes: everything is a large batched matmul (MXU); attention over the
197-token sequence needs no special kernel — XLA fuses the softmax chain.
``grad_checkpointing`` maps to nn.remat over blocks (reference:
set_grad_checkpointing, model.py:1099-1102). LiT-style tower locking
(reference: model.py:1066-1073) is realised as an optax trainability mask,
see models/clip.py.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FusedAttention(nn.Module):
    """Multi-head attention with a fused QKV projection.

    One (d, 3d) matmul instead of three (d, d) — bigger MXU tiles, fewer
    kernels. Softmax runs in fp32 (matches torch-AMP numerics the
    reference trains with). Optional additive-key padding mask.
    """

    num_heads: int
    dtype: Dtype = jnp.float32
    dot_general_cls: Any = None  # AQT int8 injection (ops/quant.py)
    # Checkpoint the scores->probs interior: save only q/k/v, recompute the
    # [B,h,T,T] attention probabilities in backward instead of saving them
    # (~100 MB/layer at bs 64, the residual that drives XLA's auto-remat of
    # whole attention chains — PERF.md round-3 attention-remat experiment).
    remat_probs: bool = False
    # Run QK^T and P·V (and their backward dots) on the int8 MXU
    # (--quant int8_fast_attn, ops/qdot.py int8_qk_dot/int8_pv_dot) — the
    # last bf16 MXU stream once the Dense GEMMs are int8.
    int8_interior: bool = False
    # Delayed-scale int8 interior (--quant int8_delayed_attn): q/k/v
    # quantize with the PREVIOUS step's per-head absmax (state in the
    # "quant" variable collection, like the Dense delayed scales); the
    # softmax probabilities use the static 1/127 scale. Removes the
    # dynamic-calibration cost that made int8_fast_attn a measured
    # negative (PERF.md "int8 attention interior").
    int8_delayed_interior: bool = False
    # Pallas flash-attention interior (--attn-impl flash): never
    # materializes the [B,h,T,T] probs in HBM, fwd + bwd (ops/flash_attn).
    # Mutually exclusive with the int8 interiors; subsumes remat_probs
    # (there are no probs to save or recompute).
    flash_interior: bool = False

    def _dense(self, features, name, **kw):
        if self.dot_general_cls is not None:
            kw["dot_general_cls"] = self.dot_general_cls
        return nn.Dense(features, dtype=self.dtype, name=name, **kw)

    @nn.compact
    def __call__(self, x, pad_mask=None):
        B, T, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = self._dense(3 * d, "qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        sq = sk = sv = None
        if self.int8_delayed_interior:
            # Per-head delayed absmax state (h is a batch dim of every
            # attention einsum, so per-head scales factor out of all six
            # dots). Variables live in the same "quant" collection the
            # Dense delayed scales use — threaded by the train step,
            # checkpointed, and re-anchored by calibrate_quant for free.
            def _head_amax(t):
                a = jnp.max(
                    jnp.abs(jax.lax.stop_gradient(t).astype(jnp.float32)
                            .reshape(B, T, h, hd)),
                    axis=(0, 1, 3),
                )
                from ..ops.qdot import _EPS

                return jnp.maximum(a, _EPS)

            fq, fk, fv = _head_amax(q), _head_amax(k), _head_amax(v)
            a_q = self.variable("quant", "amax_q", lambda: fq)
            a_k = self.variable("quant", "amax_k", lambda: fk)
            a_v = self.variable("quant", "amax_v", lambda: fv)
            sq = (a_q.value / 127.0).reshape(1, 1, h, 1)
            sk = (a_k.value / 127.0).reshape(1, 1, h, 1)
            sv = (a_v.value / 127.0).reshape(1, 1, h, 1)
            if (not self.is_initializing()
                    and self.is_mutable_collection("quant")):
                a_q.value, a_k.value, a_v.value = fq, fk, fv

        def interior(q, k, v, pad_mask):
            q = q.reshape(B, T, h, hd)
            k = k.reshape(B, T, h, hd)
            v = v.reshape(B, T, h, hd)
            if self.flash_interior:
                from ..ops.flash_attn import flash_attention_interior

                return flash_attention_interior(
                    q, k, v, pad_mask, sm_scale=hd ** -0.5)
            if self.int8_delayed_interior:
                from ..ops.qdot import int8_pv_dot_delayed, int8_qk_dot_delayed

                s = int8_qk_dot_delayed(q, k, sq, sk) * (hd ** -0.5)
            elif self.int8_interior:
                from ..ops.qdot import int8_pv_dot, int8_qk_dot

                s = int8_qk_dot(q, k) * (hd ** -0.5)
            else:
                s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
            s = s.astype(jnp.float32)
            if pad_mask is not None:
                # pad_mask: (B, 1, 1, T) True = attend
                s = jnp.where(pad_mask, s, jnp.float32(-1e9))
            p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
            if self.int8_delayed_interior:
                return int8_pv_dot_delayed(p, v, sv).reshape(B, T, d)
            if self.int8_interior:
                return int8_pv_dot(p, v).reshape(B, T, d)
            return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, d)

        if self.remat_probs:
            interior = jax.checkpoint(interior)
        return self._dense(d, "out")(interior(q, k, v, pad_mask))


class MlpBlock(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32
    quick_gelu: bool = False
    gelu_approx: bool = False
    dot_general_cls: Any = None

    @nn.compact
    def __call__(self, x):
        kw = (
            {"dot_general_cls": self.dot_general_cls}
            if self.dot_general_cls is not None else {}
        )
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1", **kw)(x)
        # NOTE: do NOT jax.checkpoint the activation. Measured (round 3,
        # real chip): forcing gelu-recompute raised the MLP-3072 stream
        # 33.4->47.6 ms/step and the whole step 170.7->177.7 ms — XLA's own
        # remat choices beat the hand-forced policy (PERF.md round-3).
        if self.quick_gelu:
            x = x * nn.sigmoid(1.702 * x)
        else:
            # gelu_approx=True uses the tanh form: on the TPU VPU the exact
            # erf epilogue costs MORE than the fc1 matmul it fuses into
            # (measured 1089 vs 509 us/dot; tanh 567 us — PERF.md round-3
            # GELU-epilogue experiment), while the tanh-vs-erf error
            # (max 4.7e-4) is 33x below bf16's own rounding of the exact
            # value (1.6e-2), i.e. invisible under bf16 compute.
            x = nn.gelu(x, approximate=self.gelu_approx)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2", **kw)(x)


class EncoderBlock(nn.Module):
    """Pre-norm transformer block (timm ViT style)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    quick_gelu: bool = False
    gelu_approx: bool = False
    drop_rate: float = 0.0
    dot_general_cls: Any = None
    attn_remat: bool = False
    attn_int8: bool = False
    attn_int8_delayed: bool = False
    attn_flash: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(
            self.dtype
        )
        y = FusedAttention(num_heads=self.num_heads, dtype=self.dtype,
                           dot_general_cls=self.dot_general_cls,
                           remat_probs=self.attn_remat,
                           int8_interior=self.attn_int8,
                           int8_delayed_interior=self.attn_int8_delayed,
                           flash_interior=self.attn_flash,
                           name="attn")(y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(
            self.dtype
        )
        y = MlpBlock(
            int(d * self.mlp_ratio), d, dtype=self.dtype,
            quick_gelu=self.quick_gelu, gelu_approx=self.gelu_approx,
            dot_general_cls=self.dot_general_cls, name="mlp",
        )(y)
        return x + y


class VisionTransformer(nn.Module):
    """ViT with CLS pooling and optional projection head.

    Defaults are ViT-B/16 at 224px (the BiomedCLIP visual tower).
    """

    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    embed_dim: Optional[int] = 512  # projection output; None = raw width
    patch_dropout: float = 0.0
    quick_gelu: bool = False
    gelu_approx: bool = False
    grad_checkpointing: bool = False
    dtype: Dtype = jnp.float32
    dot_general_cls: Any = None  # AQT int8 injection into the hot GEMMs
    attn_remat: bool = False  # recompute attention probs in backward
    attn_int8: bool = False  # int8 attention interior (--quant int8_fast_attn)
    attn_int8_delayed: bool = False  # delayed-scale interior (--quant int8_delayed_attn)
    attn_flash: bool = False  # Pallas flash-attention interior (--attn-impl flash)

    @property
    def output_dim(self) -> int:
        return self.embed_dim or self.width

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        p = self.patch_size
        # Patchify as reshape + matmul (space-to-depth): equivalent to the
        # stride-p conv but avoids XLA's small-input-channel conv path —
        # C_in=3 convs waste most MXU lanes on TPU.
        gh, gw = H // p, W // p
        patches = (
            x.astype(self.dtype)
            .reshape(B, gh, p, gw, p, C)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, gh * gw, p * p * C)
        )
        pe_kw = (
            {"dot_general_cls": self.dot_general_cls}
            if self.dot_general_cls is not None else {}
        )
        x = nn.Dense(self.width, dtype=self.dtype, name="patch_embed",
                     **pe_kw)(patches)
        n_patches = x.shape[1]

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.width),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, self.width)), x],
            axis=1,
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, n_patches + 1, self.width), jnp.float32,
        )
        x = x + pos.astype(self.dtype)

        if self.patch_dropout > 0.0 and not deterministic:
            # force_patch_dropout flag (reference: cli --force-patch-dropout)
            keep = 1.0 - self.patch_dropout
            rng = self.make_rng("dropout")
            import jax

            mask = jax.random.bernoulli(rng, keep, (B, x.shape[1] - 1, 1))
            tokens = jnp.where(mask, x[:, 1:] / keep, 0.0)
            x = jnp.concatenate([x[:, :1], tokens.astype(x.dtype)], axis=1)

        block = EncoderBlock
        if self.grad_checkpointing:
            block = nn.remat(EncoderBlock, static_argnums=(2,))
        for i in range(self.depth):
            x = block(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                dtype=self.dtype, quick_gelu=self.quick_gelu,
                gelu_approx=self.gelu_approx,
                dot_general_cls=self.dot_general_cls,
                attn_remat=self.attn_remat, attn_int8=self.attn_int8,
                attn_int8_delayed=self.attn_int8_delayed,
                attn_flash=self.attn_flash,
                name=f"block{i}",
            )(x, deterministic)

        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x[:, 0])
        if self.embed_dim is not None:
            x = nn.Dense(
                self.embed_dim, use_bias=False, dtype=jnp.float32, name="proj"
            )(x)
        return x
