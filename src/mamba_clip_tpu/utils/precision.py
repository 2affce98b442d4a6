"""Mixed-precision policy mapping.

TPU-native translation of the reference's AMP flags
(reference: src/mamba_clip/utils/amp_utils.py:19-52 and GradScaler wiring at
pipeline.py:309-310, train.py:292-305):

- ``amp`` (CUDA fp16 autocast + GradScaler) → bf16 compute, fp32 params/opt.
  TPU MXUs natively accumulate bf16 in fp32; no loss scaler is needed, which
  removes the scaler state from checkpoints and the unscale/clip dance from
  the train step.
- ``amp_bf16`` / ``amp_bfloat16`` → same bf16-compute policy.
- ``bf16`` / ``pure_bf16`` → bf16 params AND compute (casts the pytree).
- ``fp16`` / ``pure_fp16`` → parity mode: fp16 compute with DYNAMIC loss
  scaling (GradScaler semantics: skip-on-inf, backoff, growth — see
  LossScaleState). TPUs support fp16 poorly; numerics comparison only.
- ``fp32`` → everything fp32.

The reference force-casts the selective scan to fp32 inside autocast
(model.py:531-536); our Pallas scan likewise always carries fp32 state
regardless of policy (see ops/selective_scan.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import struct


class LossScaleState(struct.PyTreeNode):
    """Dynamic loss-scale state — torch.cuda.amp.GradScaler semantics
    (reference: pipeline.py:309-310 creates the scaler, train.py:292-305
    scale→unscale→clip→step→update). Scale doubles after
    ``growth_interval`` consecutive finite-grad steps and halves (skipping
    the optimizer step) on any non-finite gradient."""

    scale: jnp.ndarray        # f32 scalar
    growth_count: jnp.ndarray  # i32 consecutive finite steps


# torch GradScaler defaults (init 2^16, growth 2x, backoff 0.5x, every 2000)
GROWTH_FACTOR = 2.0
BACKOFF_FACTOR = 0.5
GROWTH_INTERVAL = 2000


def init_loss_scale(init_scale: float = 2.0**16) -> LossScaleState:
    return LossScaleState(
        scale=jnp.float32(init_scale), growth_count=jnp.int32(0)
    )


def update_loss_scale(state: LossScaleState, grads_finite) -> LossScaleState:
    """One GradScaler.update(): grow on a full interval of finite steps,
    back off immediately on a non-finite one."""
    grown = state.growth_count + 1 >= GROWTH_INTERVAL
    new_scale = jnp.where(
        grads_finite,
        jnp.where(grown, state.scale * GROWTH_FACTOR, state.scale),
        jnp.maximum(state.scale * BACKOFF_FACTOR, 1.0),
    )
    new_count = jnp.where(
        grads_finite & ~grown, state.growth_count + 1, jnp.int32(0)
    )
    return LossScaleState(scale=new_scale, growth_count=new_count)


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype
    output_dtype: jnp.dtype
    loss_scale: float = 1.0  # static scale; 1.0 = disabled
    dynamic_loss_scale: bool = False  # GradScaler-equivalent (fp16 modes)

    def cast_to_compute(self, tree):
        import jax

        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_param(self, tree):
        import jax

        return jax.tree_util.tree_map(
            lambda x: x.astype(self.param_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


_POLICIES = {
    "amp": Policy(jnp.float32, jnp.bfloat16, jnp.float32),
    "amp_bf16": Policy(jnp.float32, jnp.bfloat16, jnp.float32),
    "amp_bfloat16": Policy(jnp.float32, jnp.bfloat16, jnp.float32),
    "bf16": Policy(jnp.bfloat16, jnp.bfloat16, jnp.float32),
    "pure_bf16": Policy(jnp.bfloat16, jnp.bfloat16, jnp.float32),
    "fp16": Policy(jnp.float32, jnp.float16, jnp.float32,
                   loss_scale=2.0**16, dynamic_loss_scale=True),
    "pure_fp16": Policy(jnp.float16, jnp.float16, jnp.float32,
                        loss_scale=2.0**16, dynamic_loss_scale=True),
    "fp32": Policy(jnp.float32, jnp.float32, jnp.float32),
}


def get_policy(precision: str) -> Policy:
    """Map a --precision flag to a Policy (reference: amp_utils.py:19-52)."""
    try:
        return _POLICIES[precision]
    except KeyError:
        raise ValueError(
            f"unknown precision '{precision}'; one of {sorted(_POLICIES)}"
        ) from None


def get_input_dtype(precision: str) -> jnp.dtype:
    """Input-cast dtype (reference: amp_utils.py:38-52)."""
    return get_policy(precision).compute_dtype
