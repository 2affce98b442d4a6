"""Losses: global-batch InfoNCE (CLIP) and cross-entropy.

TPU-native redesign of the reference's ``ClipLoss`` / ``cross_entropy_loss``
(reference: src/mamba_clip/loss.py):

- The reference gathers features across GPUs with NCCL all_gather, with a
  grad/no-grad distinction and a ``local_loss`` variant
  (loss.py:16-44, 89-113). In JAX the gather is ``jax.lax.all_gather``
  inside ``shard_map`` — differentiable by construction, so
  ``gather_with_grad`` is always on (the flag is accepted and ignored).
- ``local_loss=True`` keeps the reference's memory saving: per-shard
  logits ``(B_local, B_global)`` against gathered features, labels offset
  by the shard index (loss.py:80-81, 101-103).
- ``local_loss=False`` computes the full ``(B_global, B_global)`` logits on
  every shard like the reference (loss.py:105-108).
- Label caching (loss.py:72-87) is unnecessary: ``jnp.arange`` inside jit is
  constant-folded.
- ``cross_entropy_loss`` supports hard int targets (optionally
  class-weighted) and soft float targets (loss.py:47-53) — soft targets are
  what balanced-mixup produces.

All losses take/return fp32 logits regardless of the compute policy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _log_softmax_xent(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over int labels. logits (B, C) fp32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def cross_entropy_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Hard / soft / class-weighted CE (reference: loss.py:47-53)."""
    logits = logits.astype(jnp.float32)
    if jnp.issubdtype(target.dtype, jnp.floating):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.sum(logp * target, axis=-1))
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
    if weight is not None:
        w = weight[target]
        # torch F.cross_entropy semantics: weighted mean = sum(w*nll)/sum(w)
        return -jnp.sum(w * picked) / jnp.maximum(jnp.sum(w), 1e-12)
    return -jnp.mean(picked)


def clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    *,
    axis_name: Optional[str] = None,
    local_loss: bool = False,
    logit_bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Symmetric InfoNCE (reference: loss.py:124-147).

    Features must be L2-normalized. When ``axis_name`` is set this must run
    inside ``shard_map``/``pmap`` over a batch-sharded axis; otherwise the
    features are treated as the full (global) batch — under pjit with batch
    sharding XLA inserts the all_gather for the ``img @ txt.T`` contraction
    automatically, which is the non-local-loss behavior.
    """
    f32 = jnp.float32
    img = image_features.astype(f32)
    txt = text_features.astype(f32)
    scale = logit_scale.astype(f32)

    if axis_name is None:
        logits_per_image = scale * img @ txt.T
        if logit_bias is not None:
            logits_per_image = logits_per_image + logit_bias
        logits_per_text = logits_per_image.T
        labels = jnp.arange(img.shape[0])
        return 0.5 * (
            _log_softmax_xent(logits_per_image, labels)
            + _log_softmax_xent(logits_per_text, labels)
        )

    # Explicit-collective path (inside shard_map over `axis_name`).
    all_img = jax.lax.all_gather(img, axis_name, axis=0, tiled=True)
    all_txt = jax.lax.all_gather(txt, axis_name, axis=0, tiled=True)
    if local_loss:
        # (B_local, B_global) logits; labels offset by shard index
        # (reference: loss.py:80-81,101-103).
        logits_per_image = scale * img @ all_txt.T
        logits_per_text = scale * txt @ all_img.T
        rank = jax.lax.axis_index(axis_name)
        labels = jnp.arange(img.shape[0]) + img.shape[0] * rank
    else:
        logits_per_image = scale * all_img @ all_txt.T
        logits_per_text = logits_per_image.T
        labels = jnp.arange(all_img.shape[0])
    if logit_bias is not None:
        logits_per_image = logits_per_image + logit_bias
        logits_per_text = logits_per_text + logit_bias
    return 0.5 * (
        _log_softmax_xent(logits_per_image, labels)
        + _log_softmax_xent(logits_per_text, labels)
    )


def siglip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    *,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Pairwise sigmoid loss (SigLIP) — the reference's --siglip flag adds a
    logit_bias to the model (reference: pipeline.py:214-216); this provides
    the matching loss. Sum over the batch, mean per example."""
    f32 = jnp.float32
    img = image_features.astype(f32)
    txt = text_features.astype(f32)
    if axis_name is not None:
        txt = jax.lax.all_gather(txt, axis_name, axis=0, tiled=True)
    logits = logit_scale.astype(f32) * img @ txt.T + logit_bias.astype(f32)
    n_img, n_txt = logits.shape
    if axis_name is not None:
        rank = jax.lax.axis_index(axis_name)
        offset = n_img * rank
    else:
        offset = 0
    eye = (
        jnp.arange(n_img)[:, None] + offset == jnp.arange(n_txt)[None, :]
    ).astype(f32)
    z = eye * 2.0 - 1.0  # +1 for matched pairs, -1 otherwise
    return jnp.sum(jax.nn.softplus(-z * logits)) / n_img
