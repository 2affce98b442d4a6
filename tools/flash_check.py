#!/usr/bin/env python
"""On-device flash-attention divergence gate (real TPU).

Compares the Pallas flash-attention interior (ops/flash_attn.py) against
the einsum interior at flagship shapes — forward and dq/dk/dv — on the
compiled kernel, the same pattern as bench.py's selective-scan verify
gate (interpret/oracle tests validate the wrapper; only a real chip
validates the Mosaic compilation).

Usage: python tools/flash_check.py  (needs the TPU; ~1 min warm cache)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))


def check(B, T, h, hd, with_mask, dtype_name, seed):
    import jax
    import jax.numpy as jnp

    from mamba_clip_tpu.ops.flash_attn import flash_attention_interior

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.normal(0, 1, (B, T, h, hd)), dtype)
               for _ in range(3))
    w = jnp.asarray(rng.normal(0, 1, (B, T, h * hd)), jnp.float32)
    if with_mask:
        valid = np.ones((B, T), bool)
        valid[:, T - T // 3:] = False
        pad_mask = jnp.asarray(valid)[:, None, None, :]
    else:
        pad_mask = None
    sm = hd ** -0.5

    def einsum_interior(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * sm
        s = s.astype(jnp.float32)
        if pad_mask is not None:
            s = jnp.where(pad_mask, s, jnp.float32(-1e9))
        p = jax.nn.softmax(s, axis=-1).astype(dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, h * hd)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention_interior(q, k, v, pad_mask, sm_scale=sm)
            .astype(jnp.float32) * w)

    def loss_einsum(q, k, v):
        return jnp.sum(einsum_interior(q, k, v).astype(jnp.float32) * w)

    out_f = jax.jit(lambda q, k, v: flash_attention_interior(
        q, k, v, pad_mask, sm_scale=sm))(q, k, v)
    out_e = jax.jit(einsum_interior)(q, k, v)
    _, gf = jax.jit(jax.value_and_grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    _, ge = jax.jit(jax.value_and_grad(loss_einsum, argnums=(0, 1, 2)))(q, k, v)
    # Error budget: the kernel's interior computes at bf16-class precision
    # (measured ~2.6e-3 elementwise even on fp32 inputs — within bf16's own
    # rounding of the same values, 3.9e-3). Flash is the opt-in lever for
    # the bf16 amp recipe; fp32 parity runs keep --attn-impl einsum, and
    # the fp32 rows here just pin that the deviation stays bf16-class.
    tol = 2e-2 if dtype_name == "fp32" else 5e-2
    worst = 0.0
    pairs = [("out", out_f, out_e)] + [
        (f"d{n}", a, b) for n, a, b in zip("qkv", gf, ge)]
    for name, a, b in pairs:
        a = np.asarray(jax.device_get(a), np.float32)
        b = np.asarray(jax.device_get(b), np.float32)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
        assert np.isfinite(err) and err < tol, (
            f"{name} diverges: rel {err:.2e} (tol {tol})")
        worst = max(worst, err)
    tag = f"B={B} T={T} h={h} hd={hd} mask={with_mask} {dtype_name}"
    print(f"ok  {tag}: worst elementwise rel err {worst:.2e}")


def main():
    import jax

    assert jax.devices()[0].platform in ("tpu", "axon"), (
        "flash_check needs the TPU backend")
    # flagship shapes: ViT tower (T=197, padded to 256 inside) and text
    # tower (T=256 with pad mask), both bf16 (amp) and fp32
    check(8, 197, 12, 64, False, "bf16", 0)
    check(8, 256, 12, 64, True, "bf16", 1)
    check(4, 197, 12, 64, False, "fp32", 2)
    check(4, 256, 12, 64, True, "fp32", 3)
    print("flash-attention kernel matches the einsum interior on-device")


if __name__ == "__main__":
    main()
