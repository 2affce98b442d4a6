"""Flash-attention interior for the transformer towers.

Routes the attention interior (QKᵀ → masked softmax → P·V) through the
Pallas TPU flash-attention kernel shipped with JAX
(``jax.experimental.pallas.ops.tpu.flash_attention``), which never
materializes the [B, h, T, T] probability tensor in HBM. At the
flagship shapes (bs 64, h 12, T 197/256, bf16) that tensor is ~100 MB
per tower per pass; the einsum interior reads/writes it several times
across fwd+bwd, which is why "attention scores/softmax" is the largest
class in the step profile (32.8 ms of ~124 — PERF.md). The kernel
carries its own custom VJP (dq/dk/dv Pallas kernels), so the backward
is flash too.

Semantics match the einsum interior exactly (same contract as
models/vit.py FusedAttention.interior):

- softmax in fp32 (the kernel accumulates in f32);
- ``pad_mask`` masks KEYS only — every query row (padded or not)
  attends the valid keys, like the ``jnp.where(pad_mask, s, -1e9)``
  masking it replaces. Expressed as kv segment ids (pad keys get
  segment 0, all queries segment 1).
- sequence lengths that don't divide the kernel's 128-lane blocks are
  zero-padded on the kv/q axes and sliced back off (ViT's T=197 → 256).

The reference's torch towers use eager matmul+softmax attention
(reference: src/mamba_clip/model.py SS2D/transformer paths); flash here
is a TPU-native optimization, opt-in via ``--attn-impl flash`` and
gated by an on-device divergence check in bench.py like the Pallas
scan kernel.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

_BLOCK = 128  # kernel MIN_BLOCK_SIZE: q/kv seq lens must be multiples


def _round_up(n: int, m: int = _BLOCK) -> int:
    return ((n + m - 1) // m) * m


def available() -> bool:
    """True when the default backend can run the Pallas TPU kernel."""
    try:
        # "axon" is the remote-tunnel TPU backend on the dev machine;
        # Pallas/Mosaic lowers through it like a local chip (the selective
        # -scan kernel ships the same way — bench.py's verify gate).
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def resolve_attn_flash(attn_impl: str) -> bool:
    """``--attn-impl`` flag → FusedAttention.flash_interior.

    ``flash`` demands a TPU backend up front — the Pallas kernel would
    otherwise fail deep inside the first compile with a Mosaic error.
    """
    if attn_impl in (None, "einsum"):
        return False
    if attn_impl == "flash":
        if not available():
            raise ValueError(
                "--attn-impl flash needs a TPU backend (the Pallas "
                "flash-attention kernel is TPU-only); use einsum here"
            )
        return True
    raise ValueError(f"--attn-impl must be einsum|flash, got {attn_impl!r}")


def flash_attention_interior(
    q: jax.Array,  # [B, T, h, hd]
    k: jax.Array,
    v: jax.Array,
    pad_mask: Optional[jax.Array] = None,  # [B, 1, 1, T] True = attend
    *,
    sm_scale: float,
    kernel_fn: Optional[Callable] = None,
) -> jax.Array:
    """Drop-in replacement for the einsum attention interior.

    Returns [B, T, h*hd] like ``einsum("bhqk,bkhd->bqhd", p, v)`` reshaped.
    ``kernel_fn`` overrides the Pallas kernel (tests pass
    ``mha_reference`` so the padding/masking wrapper is validated on CPU
    where the TPU kernel can't run).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    B, T, h, hd = q.shape
    Tp = max(_round_up(T), _BLOCK)
    fn = kernel_fn if kernel_fn is not None else flash_attention

    # [B, T, h, hd] -> [B, h, T, hd] (kernel layout)
    def to_kernel(t):
        t = jnp.transpose(t, (0, 2, 1, 3))
        if Tp != T:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        return t

    qk, kk, vk = to_kernel(q), to_kernel(k), to_kernel(v)

    if pad_mask is None and Tp == T:
        seg = None
    else:
        # kv segment: 1 for attendable keys, 0 for padded-away keys
        # (either the caller's pad_mask or our alignment padding).
        if pad_mask is not None:
            kv_valid = pad_mask.reshape(B, T).astype(jnp.int32)
        else:
            kv_valid = jnp.ones((B, T), jnp.int32)
        if Tp != T:
            kv_valid = jnp.pad(kv_valid, ((0, 0), (0, Tp - T)))
        # every query attends (keys-only masking, like the einsum path);
        # alignment-padded query rows are sliced off below.
        seg = SegmentIds(q=jnp.ones((B, Tp), jnp.int32), kv=kv_valid)

    out = fn(qk, kk, vk, None, seg, causal=False, sm_scale=sm_scale)
    out = jnp.transpose(out, (0, 2, 1, 3))  # [B, Tp, h, hd]
    if Tp != T:
        out = out[:, :T]
    return out.reshape(B, T, h * hd)
