"""Flash-attention interior (ops/flash_attn.py).

The Pallas TPU kernel itself can't run on the CPU test backend, so the
tests split the claim in two:

- the padding/segment/masking WRAPPER is validated on CPU by injecting
  the pure-JAX ``mha_reference`` oracle that ships next to the kernel
  (same signature, same segment semantics) and comparing against the
  einsum interior FusedAttention uses;
- the compiled-kernel-vs-einsum divergence is gated on real hardware by
  tools/flash_check.py (run on the chip; same pattern as bench.py's
  selective-scan verify gate).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_clip_tpu.ops.flash_attn import (
    flash_attention_interior, resolve_attn_flash)


def _einsum_interior(q, k, v, pad_mask, sm_scale):
    """The reference path from models/vit.py FusedAttention.interior."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * sm_scale
    s = s.astype(jnp.float32)
    if pad_mask is not None:
        s = jnp.where(pad_mask, s, jnp.float32(-1e9))
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    B, T, h, hd = q.shape
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, h * hd)


def _mha_oracle():
    from jax.experimental.pallas.ops.tpu.flash_attention import mha_reference

    # mha_reference's custom-VJP backward raises for sm_scale != 1.0;
    # folding the scale into q is identical and keeps grads testable.
    def oracle(q, k, v, ab, segment_ids, *, causal, sm_scale):
        return mha_reference(q * sm_scale, k, v, ab, segment_ids,
                             causal=causal, sm_scale=1.0)

    return oracle


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(0, 1, shape), jnp.float32)


@pytest.mark.parametrize("T", [128, 197, 256])
def test_wrapper_matches_einsum_no_mask(T):
    B, h, hd = 2, 3, 8
    q, k, v = (_rand((B, T, h, hd), s) for s in (0, 1, 2))
    sm = hd ** -0.5
    got = flash_attention_interior(q, k, v, None, sm_scale=sm,
                                   kernel_fn=_mha_oracle())
    want = _einsum_interior(q, k, v, None, sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_wrapper_matches_einsum_with_pad_mask():
    """Keys-only masking: every query (incl. padded positions) attends
    exactly the valid keys, like the jnp.where(-1e9) path."""
    B, T, h, hd = 2, 256, 2, 8
    q, k, v = (_rand((B, T, h, hd), s) for s in (3, 4, 5))
    valid = np.ones((B, T), bool)
    valid[0, 100:] = False  # row 0: only 100 valid tokens
    valid[1, 7:] = False    # row 1: only 7
    pad_mask = jnp.asarray(valid)[:, None, None, :]
    sm = hd ** -0.5
    got = flash_attention_interior(q, k, v, pad_mask, sm_scale=sm,
                                   kernel_fn=_mha_oracle())
    want = _einsum_interior(q, k, v, pad_mask, sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_wrapper_matches_einsum_pad_mask_and_alignment_padding():
    """T=197 (ViT) with a pad mask: both the caller's mask and the
    128-alignment padding go through the same kv segment ids."""
    B, T, h, hd = 2, 197, 2, 8
    q, k, v = (_rand((B, T, h, hd), s) for s in (6, 7, 8))
    valid = np.ones((B, T), bool)
    valid[1, 150:] = False
    pad_mask = jnp.asarray(valid)[:, None, None, :]
    sm = hd ** -0.5
    got = flash_attention_interior(q, k, v, pad_mask, sm_scale=sm,
                                   kernel_fn=_mha_oracle())
    want = _einsum_interior(q, k, v, pad_mask, sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_wrapper_gradients_match():
    B, T, h, hd = 2, 197, 2, 8
    q, k, v = (_rand((B, T, h, hd), s) for s in (9, 10, 11))
    w = _rand((B, T, h * hd), 12)
    sm = hd ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_interior(
            q, k, v, None, sm_scale=sm, kernel_fn=_mha_oracle()) * w)

    def loss_einsum(q, k, v):
        return jnp.sum(_einsum_interior(q, k, v, None, sm) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    ge = jax.grad(loss_einsum, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_fused_attention_flash_flag_uses_wrapper(monkeypatch):
    """FusedAttention(flash_interior=True) routes through the wrapper and
    matches the einsum module output (oracle kernel injected)."""
    import mamba_clip_tpu.ops.flash_attn as fa_mod
    from mamba_clip_tpu.models.vit import FusedAttention

    orig = fa_mod.flash_attention_interior
    monkeypatch.setattr(
        fa_mod, "flash_attention_interior",
        lambda q, k, v, m, *, sm_scale: orig(
            q, k, v, m, sm_scale=sm_scale, kernel_fn=_mha_oracle()))

    x = _rand((2, 197, 24), 13)
    flash = FusedAttention(num_heads=3, flash_interior=True)
    plain = FusedAttention(num_heads=3)
    vars_ = plain.init(jax.random.PRNGKey(0), x)
    out_f = flash.apply(vars_, x)
    out_p = plain.apply(vars_, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=2e-5, rtol=2e-5)


def test_resolve_attn_flash():
    assert resolve_attn_flash("einsum") is False
    assert resolve_attn_flash(None) is False
    with pytest.raises(ValueError, match="einsum|flash"):
        resolve_attn_flash("bogus")
    # CPU test backend: flash must refuse loudly, not die inside Mosaic
    with pytest.raises(ValueError, match="TPU"):
        resolve_attn_flash("flash")


def test_build_clip_rejects_flash_plus_int8_attn():
    from mamba_clip_tpu.models import build_clip

    with pytest.raises(ValueError, match="flash"):
        build_clip("biomedclip", image_size=32, context_length=16,
                   quant="int8_delayed_attn", attn_flash=True)
