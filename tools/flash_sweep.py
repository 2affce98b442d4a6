#!/usr/bin/env python
"""Isolated attention-interior timing sweep: XLA einsum vs Pallas flash.

Methodology artifact for PERF.md round-4 "flash attention negative":
times fwd+bwd of ONE attention interior at flagship shapes
(B=64, h=12, T=256, hd=64, bf16) for the XLA-fused einsum path and the
flash kernel across block-size configs. 20 timed calls, scalar-fetch
sync (the tunnel-safe barrier). Needs the TPU.
"""
import os
import sys
import time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    flash_attention, BlockSizes)

B, h, T, hd = 64, 12, 256, 64
rng = np.random.default_rng(0)
q, k, v = (jnp.asarray(rng.normal(0, 1, (B, h, T, hd)), jnp.bfloat16)
           for _ in range(3))
w = jnp.asarray(rng.normal(0, 1, (B, h, T, hd)), jnp.float32)
sm = hd ** -0.5

def timeit(f, *a):
    val = f(*a)  # compile
    float(jnp.sum(val[0] if isinstance(val, tuple) else val).astype(jnp.float32))
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        val = f(*a)
    float(jnp.sum(val[0] if isinstance(val, tuple) else val).astype(jnp.float32))
    return (time.perf_counter() - t0) / N * 1e3

def einsum_att(q, k, v):
    s = jnp.einsum("bhqc,bhkc->bhqk", q, k) * sm
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bhkc->bhqc", p, v)

def loss_e(q, k, v):
    return jnp.sum(einsum_att(q, k, v).astype(jnp.float32) * w)

def make_flash(bs):
    def loss_f(q, k, v):
        o = flash_attention(q, k, v, None, None, causal=False,
                            sm_scale=sm, block_sizes=bs)
        return jnp.sum(o.astype(jnp.float32) * w)
    return loss_f

grad_e = jax.jit(jax.value_and_grad(loss_e, argnums=(0, 1, 2)))
print(f"einsum fwd+bwd: {timeit(grad_e, q, k, v):7.2f} ms")

def bs(bq, bk, bb):
    m = min(bq, bk)
    return BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=bb,
                      block_q_major_dkv=bq, block_k_major_dkv=bk,
                      block_k_dkv=bk, block_q_dkv=bq,
                      block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)

for name, b in [("default 128/1", None),
                ("256/256 bb1", bs(256, 256, 1)),
                ("256/256 bb4", bs(256, 256, 4)),
                ("256/256 bb8", bs(256, 256, 8)),
                ("128/256 bb8", bs(128, 256, 8))]:
    try:
        g = jax.jit(jax.value_and_grad(make_flash(b), argnums=(0, 1, 2)))
        print(f"flash {name}: {timeit(g, q, k, v):7.2f} ms")
    except Exception as e:
        print(f"flash {name}: FAILED {type(e).__name__}: {str(e)[:120]}")
