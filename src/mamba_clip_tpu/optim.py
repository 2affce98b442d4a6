"""Optimizer assembly: AdamW + no-decay mask + tower-lock mask + schedule.

Mirrors the reference's optimizer setup (reference:
src/mamba_clip/pipeline.py:280-308): AdamW with two parameter groups —
weight decay only for "gain" params (here: ndim >= 2; the reference
excludes ndim<2 / bias / bn / ln / logit_scale, which is the same set) —
plus gradient clipping before the update (train.py:292-305) and LiT tower
freezing (implemented as ``optax.multi_transform`` with a zero-update
branch instead of requires_grad mutation).

No GradScaler: bf16 on TPU needs no loss scaling (fp16 parity mode uses a
static scale handled in the train step, utils/precision.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def decay_mask(params) -> Any:
    """True where weight decay applies (reference: pipeline.py:280-298)."""
    return jax.tree_util.tree_map(lambda p: jnp.ndim(p) >= 2, params)


def freeze_submodule_mask(params, frozen: Any) -> Any:
    """Trainable mask (True = trainable) that freezes whole top-level
    submodules — the reference's ``requires_grad_(False)`` on the grafted
    CLIP/backbone (reference: src/mamba_clip/model.py:1129-1131). Frozen
    params must be excluded from the optimizer entirely: stop_gradient only
    zeroes grads, and AdamW's decoupled weight decay would still shrink
    them every step."""
    frozen = set(frozen)
    return {
        k: jax.tree_util.tree_map(lambda _: k not in frozen, v)
        for k, v in params.items()
    }


def merge_masks(a: Optional[Any], b: Optional[Any]) -> Optional[Any]:
    """AND of two trainable masks (None = all-trainable)."""
    if a is None:
        return b
    if b is None:
        return a
    return jax.tree_util.tree_map(lambda x, y: bool(x) and bool(y), a, b)


def build_optimizer(
    args,
    schedule: Optional[Callable],
    trainable_mask: Optional[Any] = None,
):
    """optax transform implementing the reference recipe."""
    lr = schedule if schedule is not None else args.lr
    parts = []
    if args.grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(args.grad_clip_norm))
    parts.append(
        optax.scale_by_adam(b1=args.beta1, b2=args.beta2, eps=args.eps)
    )
    if args.wd:
        parts.append(optax.add_decayed_weights(args.wd, mask=decay_mask))
    parts.append(optax.scale_by_learning_rate(lr))
    tx = optax.chain(*parts)

    if trainable_mask is not None:
        flat_mask = trainable_mask["params"] if "params" in trainable_mask else trainable_mask

        def label(mask_leaf):
            return "train" if mask_leaf else "frozen"

        labels = jax.tree_util.tree_map(label, flat_mask)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels
        )
    return tx
